"""Windows BMP (DIB) codec — pure Python, no dependencies.

Uncompressed BI_RGB bitmaps: 8-bit paletted, 24-bit BGR, and 32-bit
BGRX, with BOTH row orders (positive biHeight = bottom-up — the
standard form — and negative = top-down). Rows pad to 4-byte
boundaries. Decode always returns TOP-DOWN RGB pixel bytes, so the
bottom-up and top-down encodings of the same image are a pure bit
RE-ORDERING — the codec-parity principle applies and tests pin their
decodes pixel-EXACT (the interlace/progressive rule).

Compressed BMPs (BI_RLE8/4, BI_BITFIELDS beyond BGRX) and 1/4/16-bit
depths keep an explicit NotImplementedError gate; corrupt streams
raise ValueError.
"""

from __future__ import annotations

import struct


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def _row_stride(width: int, bpp: int) -> int:
    return ((width * bpp + 31) // 32) * 4


def decode_bmp(data: bytes) -> dict:
    """BMP → {'width','height','channels','pixels'}: pixels are RGB
    (channels=3) bytes in TOP-DOWN row-major order whatever the
    stored row order."""
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    clr_used = struct.unpack_from("<I", data, 46)[0]
    if planes != 1:
        raise ValueError("bad BMP planes")
    if compression != 0:
        raise NotImplementedError("only BI_RGB (uncompressed) BMP")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"unsupported BMP depth {bpp}")
    if w <= 0 or h_raw == 0:
        raise ValueError("bad BMP dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    palette = []
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        if len(data) < pal_off + 4 * n_colors:
            raise ValueError("truncated BMP palette")
        for i in range(n_colors):
            b, g, r, _x = struct.unpack_from("<BBBB", data, pal_off + 4 * i)
            palette.append((r, g, b))
    stride = _row_stride(w, bpp)
    if len(data) < pix_off + stride * h:
        raise ValueError("truncated BMP raster")
    out = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for r in rows:
        base = pix_off + r * stride
        if bpp == 8:
            for x in range(w):
                idx = data[base + x]
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out.extend(palette[idx])
        elif bpp == 24:
            for x in range(w):
                b, g, rr = data[base + 3 * x : base + 3 * x + 3]
                out.extend((rr, g, b))
        else:
            for x in range(w):
                b, g, rr = data[base + 4 * x : base + 4 * x + 3]
                out.extend((rr, g, b))
    return {"width": w, "height": h, "channels": 3, "pixels": bytes(out)}


def encode_bmp(
    pixels: bytes,
    width: int,
    height: int,
    bpp: int = 24,
    top_down: bool = False,
) -> bytes:
    """Encode TOP-DOWN RGB pixels as an uncompressed BMP. bpp 24
    writes BGR triples, 32 writes BGRX; top_down=True stores rows in
    natural order via negative biHeight (decodes identically to the
    bottom-up form — test-pinned)."""
    if bpp not in (24, 32):
        raise ValueError("encode supports 24 or 32 bpp")
    if len(pixels) != width * height * 3:
        raise ValueError("pixel count does not match dimensions")
    stride = _row_stride(width, bpp)
    raster = bytearray()
    rows = range(height) if top_down else range(height - 1, -1, -1)
    for r in rows:
        row = bytearray()
        for x in range(width):
            i = (r * width + x) * 3
            rr, g, b = pixels[i : i + 3]
            row.extend((b, g, rr) if bpp == 24 else (b, g, rr, 0))
        row.extend(b"\x00" * (stride - len(row)))
        raster.extend(row)
    pix_off = 14 + 40
    file_size = pix_off + len(raster)
    h_field = -height if top_down else height
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, 1, bpp, 0, len(raster),
        2835, 2835, 0, 0,
    )
    return header + info + bytes(raster)


def encode_bmp_palette(
    pixels: bytes, width: int, height: int
) -> bytes:
    """8-bit paletted BMP from GRAYSCALE pixels (one byte per pixel):
    the identity gray palette makes decode(encode(x)) reproduce the
    gray values as R=G=B exactly."""
    if len(pixels) != width * height:
        raise ValueError("pixel count does not match dimensions")
    stride = _row_stride(width, 8)
    raster = bytearray()
    for r in range(height - 1, -1, -1):
        row = bytearray(pixels[r * width : (r + 1) * width])
        row.extend(b"\x00" * (stride - len(row)))
        raster.extend(row)
    pal = bytearray()
    for v in range(256):
        pal.extend((v, v, v, 0))
    pix_off = 14 + 40 + len(pal)
    file_size = pix_off + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(raster),
        2835, 2835, 256, 0,
    )
    return header + info + bytes(pal) + bytes(raster)
