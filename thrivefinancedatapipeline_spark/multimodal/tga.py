"""Truevision TGA codec — pure Python, no dependencies.

True-color TGA (the format's dominant use): image type 2
(uncompressed) and type 10 (run-length encoded), 24-bit BGR and
32-bit BGRA, both row orders (descriptor bit 5: set = top-down,
clear = bottom-up — the file-format default). Decode always returns
TOP-DOWN row-major RGB/RGBA pixel bytes, so the RLE and raw encodings
— and the two row orders — of one image are pure bit RE-ORDERINGS:
the codec-parity principle applies and tests pin their decodes
pixel-EXACT (the BMP/PNG-interlace rule).

The encoder emits RLE packets that never cross a scan line (the TGA
2.0 file-format requirement); the decoder tolerates crossings (many
historical writers produce them) but still length-checks the raster.
Color-mapped (types 1/9) and monochrome (types 3/11) images keep an
explicit NotImplementedError gate; corrupt streams raise ValueError.
"""

from __future__ import annotations

import struct

_HDR = struct.Struct("<BBBHHBHHHHBB")


def decode_tga(data: bytes) -> dict:
    """TGA → {'width','height','channels','pixels'}: pixels are RGB
    (24 bpp) or RGBA (32 bpp) bytes in TOP-DOWN row-major order
    whatever the stored row order or compression."""
    if len(data) < _HDR.size:
        raise ValueError("truncated TGA header")
    (
        id_len,
        cmap_type,
        img_type,
        _cmap_first,
        cmap_len,
        _cmap_bits,
        _x0,
        _y0,
        w,
        h,
        depth,
        descriptor,
    ) = _HDR.unpack_from(data, 0)
    if img_type in (1, 9):
        raise NotImplementedError("color-mapped TGA")
    if img_type in (3, 11):
        raise NotImplementedError("monochrome TGA")
    if img_type not in (2, 10):
        raise ValueError(f"bad TGA image type {img_type}")
    if cmap_type != 0 or cmap_len != 0:
        raise ValueError("true-color TGA with a color map")
    if depth not in (24, 32):
        raise NotImplementedError(f"unsupported TGA depth {depth}")
    if w == 0 or h == 0:
        raise ValueError("bad TGA dimensions")
    if descriptor & 0x10:
        raise NotImplementedError("right-to-left TGA")
    nch = depth // 8
    top_down = bool(descriptor & 0x20)
    pos = _HDR.size + id_len
    if len(data) < pos:
        raise ValueError("truncated TGA id field")
    n_pix = w * h
    px = bytearray()
    if img_type == 2:
        need = n_pix * nch
        if len(data) < pos + need:
            raise ValueError("truncated TGA raster")
        px.extend(data[pos : pos + need])
    else:
        while len(px) < n_pix * nch:
            if pos >= len(data):
                raise ValueError("truncated TGA RLE stream")
            head = data[pos]
            pos += 1
            count = (head & 0x7F) + 1
            if head & 0x80:
                if pos + nch > len(data):
                    raise ValueError("truncated TGA run packet")
                px.extend(data[pos : pos + nch] * count)
                pos += nch
            else:
                need = count * nch
                if pos + need > len(data):
                    raise ValueError("truncated TGA raw packet")
                px.extend(data[pos : pos + need])
                pos += need
        if len(px) != n_pix * nch:
            raise ValueError("TGA RLE overruns the raster")
    out = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for r in rows:
        base = r * w * nch
        for x in range(w):
            i = base + x * nch
            b, g, rr = px[i], px[i + 1], px[i + 2]
            out.extend((rr, g, b))
            if nch == 4:
                out.append(px[i + 3])
    return {"width": w, "height": h, "channels": nch, "pixels": bytes(out)}


def _bgr_rows(pixels: bytes, width: int, height: int, nch: int) -> list[bytes]:
    """Top-down RGB(A) input → per-row BGR(A) byte strings."""
    rows = []
    for r in range(height):
        row = bytearray()
        for x in range(width):
            i = (r * width + x) * nch
            row.extend((pixels[i + 2], pixels[i + 1], pixels[i]))
            if nch == 4:
                row.append(pixels[i + 3])
        rows.append(bytes(row))
    return rows


def _rle_row(row: bytes, nch: int) -> bytes:
    """One scan line as TGA RLE packets (greedy: runs of >= 2 equal
    pixels become run packets, everything else batches into raw
    packets; packets never cross the row — the 2.0 rule)."""
    pix = [row[i : i + nch] for i in range(0, len(row), nch)]
    out = bytearray()
    i = 0
    while i < len(pix):
        run = 1
        while i + run < len(pix) and run < 128 and pix[i + run] == pix[i]:
            run += 1
        if run >= 2:
            out.append(0x80 | (run - 1))
            out.extend(pix[i])
            i += run
            continue
        j = i + 1
        while (
            j < len(pix)
            and j - i < 128
            and not (j + 1 < len(pix) and pix[j + 1] == pix[j])
        ):
            j += 1
        out.append((j - i) - 1)
        for k in range(i, j):
            out.extend(pix[k])
        i = j
    return bytes(out)


def encode_tga(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    rle: bool = False,
    top_down: bool = True,
) -> bytes:
    """Encode TOP-DOWN RGB (channels=3) / RGBA (channels=4) pixels as
    true-color TGA — type 2 raw or type 10 RLE; top_down=False stores
    rows bottom-up (decodes identically — test-pinned)."""
    if channels not in (3, 4):
        raise ValueError("TGA encodes 3 or 4 channels")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel count does not match dimensions")
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError("dimensions exceed TGA's 16-bit fields")
    descriptor = (8 if channels == 4 else 0) | (0x20 if top_down else 0)
    header = _HDR.pack(
        0,
        0,
        10 if rle else 2,
        0,
        0,
        0,
        0,
        0,
        width,
        height,
        channels * 8,
        descriptor,
    )
    rows = _bgr_rows(pixels, width, height, channels)
    if not top_down:
        rows = rows[::-1]
    if rle:
        body = b"".join(_rle_row(r, channels) for r in rows)
    else:
        body = b"".join(rows)
    return header + body
