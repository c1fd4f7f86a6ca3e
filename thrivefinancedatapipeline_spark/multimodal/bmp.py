"""Windows BMP (DIB) codec — pure Python, no dependencies.

Uncompressed BI_RGB bitmaps: 8-bit paletted, 24-bit BGR, and 32-bit
BGRX, with BOTH row orders (positive biHeight = bottom-up — the
standard form — and negative = top-down). Rows pad to 4-byte
boundaries. Decode always returns TOP-DOWN RGB pixel bytes, so the
bottom-up and top-down encodings of the same image are a pure bit
RE-ORDERING — the codec-parity principle applies and tests pin their
decodes pixel-EXACT (the interlace/progressive rule).

BI_RLE8 (compression=1, r10): run-length-coded 8-bit paletted
bitmaps — encoded runs, absolute (literal) packets with WORD
padding, and all three escapes (end-of-line, end-of-bitmap, delta).
Pixels the stream skips (EOL short rows, deltas, early EOF) decode
as palette index 0, the common renderer convention, documented here
because the spec leaves them undefined. RLE8 streams are bottom-up
by definition (a negative height with RLE is rejected). RLE8 vs
uncompressed encodings of one image are again a pure bit reordering
— equality round trips pinned.

BI_RLE4 (compression=2, r10): the nibble twin — encoded runs
ALTERNATE the value byte's two nibbles, absolute packets pack two
indices per byte (high first) with WORD padding, same escapes and
skip convention as RLE8.

16-bpp X1R5G5B5 (r10): decode bit-replicates each 5-bit channel
to 8 bits (q<<3 | q>>2, the GDI convention); encode quantizes v>>3,
so decode∘encode is an idempotent projection that is EXACT on
5-bit-replicated values — both properties test-pinned.

Uncompressed 4-bpp and 1-bpp paletted rasters (r10): plain
nibble/bit unpacking, MSB-first, 4-byte row padding — raw 4-bpp and
RLE4 of one image decode identically (reorder-only rule).

BI_BITFIELDS (compression=3, r11): arbitrary per-channel masks over
16-bpp and 32-bpp words — the form real 565 screenshots and
alpha-capable 32-bpp writers produce. Masks live at file offset
14+40 whether the writer used BITMAPINFOHEADER (masks follow the
header) or a V2+/V4/V5 header (masks are IN the header at relative
offset 40) — one read serves both. Each mask must be nonzero,
contiguous, disjoint from the others, and inside the pixel word;
channels decode by mask+shift then MSB-first bit replication to 8
bits (the GDI convention the 555 path already uses — in fact the
555/BGR/BGRX fixed layouts now decode through the same mask
machinery, so "BI_RGB 16-bpp" and "BITFIELDS with 555 masks" of one
image are byte-for-byte the same decode path). An alpha mask (V4) is
accepted and ignored: decode returns RGB. Encode via
`encode_bmp_bitfields` (565 by default) quantizes v >> (8 - width),
so decode∘encode is an idempotent projection, exact on
replicated values — both pinned.

2-bpp quarter-byte rasters (the Windows CE form, r11) unpack four
MSB-first 2-bit indices per byte — raw-2bpp of the same indices as
a 4-bpp raster decodes pixel-EQUAL under matching palettes (pinned).
Corrupt streams raise ValueError; unknown depths/compressions keep
NotImplementedError.
"""

from __future__ import annotations

import struct


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def _row_stride(width: int, bpp: int) -> int:
    return ((width * bpp + 31) // 32) * 4


def _mask_layout(mask: int, bpp: int) -> tuple[int, int]:
    """(shift, width) of a contiguous channel mask, validated."""
    if mask == 0:
        raise ValueError("zero BITFIELDS channel mask")
    if mask >= (1 << bpp):
        raise ValueError("BITFIELDS mask wider than the pixel word")
    shift = (mask & -mask).bit_length() - 1
    body = mask >> shift
    if body & (body + 1):
        raise ValueError("non-contiguous BITFIELDS mask")
    return shift, body.bit_length()


def _replicate(v: int, width: int) -> int:
    """MSB-first bit replication of a width-bit value to 8 bits (the
    GDI convention: 5-bit v -> (v << 3) | (v >> 2))."""
    if width >= 8:
        return v >> (width - 8)
    out = 0
    filled = 0
    while filled < 8:
        take = min(width, 8 - filled)
        out = (out << take) | (v >> (width - take))
        filled += take
    return out


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
    if compression not in (0, 1, 2, 3):
        raise NotImplementedError(f"unsupported BMP compression {compression}")
    if compression == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8 bpp")
    if compression == 2 and bpp != 4:
        raise ValueError("BI_RLE4 requires 4 bpp")
    if compression == 3 and bpp not in (16, 32):
        raise ValueError("BI_BITFIELDS requires 16 or 32 bpp")
    if bpp not in (1, 2, 4, 8, 16, 24, 32):
        raise NotImplementedError(f"unsupported BMP depth {bpp}")
    if w <= 0 or h_raw == 0:
        raise ValueError("bad BMP dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if compression in (1, 2) and top_down:
        raise ValueError("RLE BMP must be bottom-up")
    palette = []
    if bpp in (1, 2, 4, 8):
        n_colors = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        if len(data) < pal_off + 4 * n_colors:
            raise ValueError("truncated BMP palette")
        for i in range(n_colors):
            b, g, r, _x = struct.unpack_from("<BBBB", data, pal_off + 4 * i)
            palette.append((r, g, b))
    if compression in (1, 2):
        idx_rows = _decode_rle(data, pix_off, w, h, nibble=compression == 2)
        out = bytearray()
        for r in range(h - 1, -1, -1):  # storage row 0 is the bottom
            for idx in idx_rows[r]:
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out.extend(palette[idx])
        return {
            "width": w, "height": h, "channels": 3, "pixels": bytes(out),
        }
    layouts = None
    if bpp in (16, 32):
        if compression == 3:
            # masks sit at file offset 14+40 for EVERY header size:
            # BITMAPINFOHEADER writers append them after the header,
            # V2+/V4/V5 writers embed them at relative offset 40
            if len(data) < 14 + 40 + 12:
                raise ValueError("truncated BITFIELDS mask table")
            masks = struct.unpack_from("<III", data, 14 + 40)
        else:
            # the fixed BI_RGB layouts ARE mask layouts: X1R5G5B5
            # words and BGRX dwords decode through the same machinery
            masks = (
                (0x7C00, 0x03E0, 0x001F)
                if bpp == 16
                else (0xFF0000, 0x00FF00, 0x0000FF)
            )
        layouts = [_mask_layout(m, bpp) for m in masks]
        if (masks[0] & masks[1]) | (masks[0] & masks[2]) | (
            masks[1] & masks[2]
        ):
            raise ValueError("overlapping BITFIELDS masks")
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
        elif bpp == 4:
            for x in range(w):
                b = data[base + (x >> 1)]
                idx = b >> 4 if x % 2 == 0 else b & 0x0F
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out.extend(palette[idx])
        elif bpp == 2:
            # the Windows CE quarter-byte form: four MSB-first 2-bit
            # indices per byte
            for x in range(w):
                idx = (data[base + (x >> 2)] >> (6 - 2 * (x & 3))) & 3
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out.extend(palette[idx])
        elif bpp == 1:
            for x in range(w):
                idx = (data[base + (x >> 3)] >> (7 - (x & 7))) & 1
                if idx >= len(palette):
                    raise ValueError("BMP palette index out of range")
                out.extend(palette[idx])
        elif bpp == 16:
            for x in range(w):
                word = struct.unpack_from("<H", data, base + 2 * x)[0]
                out.extend(
                    _replicate((word >> sh) & ((1 << wd) - 1), wd)
                    for sh, wd in layouts
                )
        elif bpp == 24:
            for x in range(w):
                b, g, rr = data[base + 3 * x : base + 3 * x + 3]
                out.extend((rr, g, b))
        else:
            for x in range(w):
                word = struct.unpack_from("<I", data, base + 4 * x)[0]
                out.extend(
                    _replicate((word >> sh) & ((1 << wd) - 1), wd)
                    for sh, wd in layouts
                )
    return {"width": w, "height": h, "channels": 3, "pixels": bytes(out)}


def _decode_rle(
    data: bytes, pos: int, w: int, h: int, nibble: bool = False
) -> list:
    """BI_RLE8 (nibble=False) / BI_RLE4 (nibble=True) stream → h
    index rows of width w, in STORAGE order (row 0 = bottom scan
    line). Skipped pixels stay index 0. RLE4's encoded runs
    ALTERNATE the two nibbles of the value byte, and its absolute
    packets pack two indices per byte (high nibble first), padded to
    a WORD boundary."""
    kind = "RLE4" if nibble else "RLE8"
    rows = [bytearray(w) for _ in range(h)]
    x, y = 0, 0
    while True:
        if pos + 2 > len(data):
            raise ValueError(f"truncated BMP {kind} stream")
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            if y >= h or x + n > w:
                raise ValueError(f"BMP {kind} run overruns the raster")
            if nibble:
                hi, lo = v >> 4, v & 0x0F
                rows[y][x : x + n] = bytes(
                    hi if i % 2 == 0 else lo for i in range(n)
                )
            else:
                rows[y][x : x + n] = bytes([v]) * n
            x += n
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError(f"BMP {kind} runs past the last row")
        elif v == 1:  # end of bitmap
            return rows
        elif v == 2:  # delta: skip (dx, dy)
            if pos + 2 > len(data):
                raise ValueError(f"truncated BMP {kind} delta")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError(f"BMP {kind} delta leaves the raster")
        else:  # absolute (literal) mode, WORD-padded
            if y >= h or x + v > w:
                raise ValueError(f"BMP {kind} literal overruns the raster")
            nbytes = (v + 1) // 2 if nibble else v
            need = nbytes + (nbytes & 1)
            if pos + need > len(data):
                raise ValueError(f"truncated BMP {kind} literal")
            if nibble:
                lit = bytearray()
                for i in range(v):
                    b = data[pos + (i >> 1)]
                    lit.append(b >> 4 if i % 2 == 0 else b & 0x0F)
                rows[y][x : x + v] = lit
            else:
                rows[y][x : x + v] = data[pos : pos + v]
            pos += need
            x += v


def encode_bmp(
    pixels: bytes,
    width: int,
    height: int,
    bpp: int = 24,
    top_down: bool = False,
) -> bytes:
    """Encode TOP-DOWN RGB pixels as an uncompressed BMP. bpp 24
    writes BGR triples, 32 writes BGRX, 16 writes X1R5G5B5 words
    (channels quantized v >> 3 — decode bit-replicates back, so a
    16-bit round trip is exact precisely on 5-bit-replicated
    values); top_down=True stores rows in natural order via negative
    biHeight (decodes identically to the bottom-up form —
    test-pinned)."""
    if bpp not in (16, 24, 32):
        raise ValueError("encode supports 16, 24 or 32 bpp")
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
            if bpp == 16:
                row.extend(
                    struct.pack(
                        "<H",
                        ((rr >> 3) << 10) | ((g >> 3) << 5) | (b >> 3),
                    )
                )
            else:
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


def encode_bmp_bitfields(
    pixels: bytes,
    width: int,
    height: int,
    masks: tuple[int, int, int] = (0xF800, 0x07E0, 0x001F),
    bpp: int = 16,
) -> bytes:
    """Encode TOP-DOWN RGB pixels as a BI_BITFIELDS BMP under
    arbitrary contiguous per-channel masks — R5G6B5 by default, the
    layout real 16-bpp screenshots actually use. Each channel is
    quantized v >> (8 - mask_width); decode bit-replicates back, so
    the round trip is an idempotent projection, exact on replicated
    values (pinned). Masks are validated exactly as the decoder
    validates them (nonzero, contiguous, disjoint, inside the pixel
    word) — encoder and decoder can never disagree on legality."""
    if bpp not in (16, 32):
        raise ValueError("BI_BITFIELDS supports 16 or 32 bpp")
    if len(pixels) != width * height * 3:
        raise ValueError("pixel count does not match dimensions")
    layouts = [_mask_layout(m, bpp) for m in masks]
    if (masks[0] & masks[1]) | (masks[0] & masks[2]) | (
        masks[1] & masks[2]
    ):
        raise ValueError("overlapping BITFIELDS masks")
    stride = _row_stride(width, bpp)
    word_fmt = "<H" if bpp == 16 else "<I"
    raster = bytearray()
    for r in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            i = (r * width + x) * 3
            word = 0
            for (sh, wd), v in zip(layouts, pixels[i : i + 3]):
                word |= (v >> (8 - wd) if wd <= 8 else v << (wd - 8)) << sh
            row.extend(struct.pack(word_fmt, word))
        row.extend(b"\x00" * (stride - len(row)))
        raster.extend(row)
    pix_off = 14 + 40 + 12
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 3, len(raster),
        2835, 2835, 0, 0,
    )
    return header + info + struct.pack("<III", *masks) + bytes(raster)


def _rle8_row(row: bytes) -> bytes:
    """One scan line as RLE8 packets: encoded runs for >= 2 repeats,
    absolute mode (WORD-padded) for literal stretches of >= 3,
    single encoded pixels otherwise. Ends with the 0x00 0x00 EOL."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and run < 255 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.extend((run, row[i]))
            i += run
            continue
        j = i + 1
        while (
            j < len(row)
            and j - i < 255
            and not (
                j + 2 < len(row) and row[j] == row[j + 1] == row[j + 2]
            )
        ):
            j += 1
        if j - i >= 3:
            out.extend((0, j - i))
            out.extend(row[i:j])
            if (j - i) & 1:
                out.append(0)  # WORD padding
        else:
            for k in range(i, j):
                out.extend((1, row[k]))
        i = j
    out.extend((0, 0))
    return bytes(out)


def _rle4_row(row: bytes) -> bytes:
    """One scan line of nibble indices as RLE4 packets: encoded runs
    (both nibbles = the value), WORD-padded absolute packets for
    literal stretches of >= 3, encoded singles otherwise."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and run < 255 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.extend((run, (row[i] << 4) | row[i]))
            i += run
            continue
        j = i + 1
        while (
            j < len(row)
            and j - i < 255
            and not (
                j + 2 < len(row) and row[j] == row[j + 1] == row[j + 2]
            )
        ):
            j += 1
        if j - i >= 3:
            out.append(0)
            out.append(j - i)
            packed = bytearray()
            for k in range(i, j):
                if (k - i) % 2 == 0:
                    packed.append(row[k] << 4)
                else:
                    packed[-1] |= row[k]
            if len(packed) & 1:
                packed.append(0)  # WORD padding
            out.extend(packed)
        else:
            for k in range(i, j):
                out.extend((1, row[k] << 4))
        i = j
    out.extend((0, 0))
    return bytes(out)


def encode_bmp_rle4(pixels: bytes, width: int, height: int) -> bytes:
    """BI_RLE4 BMP from 4-bit indices (one 0..15 value per byte) with
    the identity 16-gray palette (index v → gray v*17), so decode
    reproduces v*17 as R=G=B exactly."""
    if len(pixels) != width * height:
        raise ValueError("pixel count does not match dimensions")
    if any(p > 15 for p in pixels):
        raise ValueError("RLE4 indices must be 0..15")
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up storage order
        body.extend(_rle4_row(pixels[r * width : (r + 1) * width]))
    body[-2:] = b"\x00\x01"
    pal = bytearray()
    for v in range(16):
        g = v * 17
        pal.extend((g, g, g, 0))
    pix_off = 14 + 40 + len(pal)
    file_size = pix_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 4, 2, len(body),
        2835, 2835, 16, 0,
    )
    return header + info + bytes(pal) + bytes(body)


def encode_bmp_rle8(pixels: bytes, width: int, height: int) -> bytes:
    """BI_RLE8 BMP from GRAYSCALE pixels (one byte per pixel, the
    encode_bmp_palette input contract, identity gray palette) —
    the compressed twin: decode(encode_bmp_rle8(x)) equals
    decode(encode_bmp_palette(x)) pixel-exact (reorder-only rule)."""
    if len(pixels) != width * height:
        raise ValueError("pixel count does not match dimensions")
    if not (0 < width < 2**31 and 0 < height < 2**31):
        raise ValueError("bad dimensions")
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up storage order
        body.extend(_rle8_row(pixels[r * width : (r + 1) * width]))
    # replace the LAST row's EOL with end-of-bitmap
    body[-2:] = b"\x00\x01"
    pal = bytearray()
    for v in range(256):
        pal.extend((v, v, v, 0))
    pix_off = 14 + 40 + len(pal)
    file_size = pix_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 1, len(body),
        2835, 2835, 256, 0,
    )
    return header + info + bytes(pal) + bytes(body)


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


def encode_bmp_palette4(pixels: bytes, width: int, height: int) -> bytes:
    """Uncompressed 4-bpp BMP from 0..15 indices (identity 16-gray
    palette, the encode_bmp_rle4 contract) — the raw twin of RLE4:
    both decode pixel-identical (reorder-only rule, test-pinned)."""
    if len(pixels) != width * height:
        raise ValueError("pixel count does not match dimensions")
    if any(p > 15 for p in pixels):
        raise ValueError("4-bpp indices must be 0..15")
    stride = _row_stride(width, 4)
    raster = bytearray()
    for r in range(height - 1, -1, -1):
        row = bytearray(stride)
        for x in range(width):
            v = pixels[r * width + x]
            if x % 2 == 0:
                row[x >> 1] |= v << 4
            else:
                row[x >> 1] |= v
        raster.extend(row)
    pal = bytearray()
    for v in range(16):
        g = v * 17
        pal.extend((g, g, g, 0))
    pix_off = 14 + 40 + len(pal)
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 4, 0, len(raster),
        2835, 2835, 16, 0,
    )
    return header + info + bytes(pal) + bytes(raster)


def encode_bmp_palette2(pixels: bytes, width: int, height: int) -> bytes:
    """Uncompressed 2-bpp BMP from 0..3 indices (identity 4-gray
    palette v*85 — matching encode_bmp_palette4's tone curve at the
    shared indices so the raw-4bpp twin decodes pixel-EQUAL)."""
    if len(pixels) != width * height:
        raise ValueError("pixel count does not match dimensions")
    if any(p > 3 for p in pixels):
        raise ValueError("2-bpp indices must be 0..3")
    stride = _row_stride(width, 2)
    raster = bytearray()
    for r in range(height - 1, -1, -1):
        row = bytearray(stride)
        for x in range(width):
            row[x >> 2] |= pixels[r * width + x] << (6 - 2 * (x & 3))
        raster.extend(row)
    pal = bytearray()
    for v in range(4):
        g = v * 85
        pal.extend((g, g, g, 0))
    pix_off = 14 + 40 + len(pal)
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 2, 0, len(raster),
        2835, 2835, 4, 0,
    )
    return header + info + bytes(pal) + bytes(raster)


def encode_bmp_1bit(bits: bytes, width: int, height: int) -> bytes:
    """1-bpp BMP from a 0/1-per-byte bitmap (palette: 0 = black,
    1 = white), rows MSB-first and padded to 4 bytes."""
    if len(bits) != width * height:
        raise ValueError("bit count does not match dimensions")
    if any(b not in (0, 1) for b in bits):
        raise ValueError("1-bpp input must be 0 or 1 per byte")
    stride = _row_stride(width, 1)
    raster = bytearray()
    for r in range(height - 1, -1, -1):
        row = bytearray(stride)
        for x in range(width):
            if bits[r * width + x]:
                row[x >> 3] |= 0x80 >> (x & 7)
        raster.extend(row)
    pal = bytes((0, 0, 0, 0, 255, 255, 255, 0))  # index 0 black, 1 white
    pix_off = 14 + 40 + len(pal)
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 1, 0, len(raster),
        2835, 2835, 2, 0,
    )
    return header + info + pal + bytes(raster)
