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

r11 closes the remaining type gates. Monochrome (types 3/11): one
8-bit gray byte per pixel, raw or RLE, decoded to channels=1 — raw
vs RLE pinned pixel-EQUAL. Color-mapped (types 1/9): 8-bit indices
into a 16/24/32-bit color map (entries are A1R5G5B5 words /
BGR / BGRA; first-entry offset honored; out-of-range indices raise)
— a color-mapped image decodes pixel-EQUAL to the true-color
encoding of its palette expansion (the re-container rule).
16-bpp A1R5G5B5 true-color (types 2/10): 5-bit channels
bit-replicate to 8 (the BMP-555 convention, shared helper); the
attribute bit is IGNORED (returned as RGB) — the dominant renderer
convention for files that leave it zero. Corrupt streams raise
ValueError; right-to-left storage stays gated.
"""

from __future__ import annotations

import struct

from .bmp import _replicate

_HDR = struct.Struct("<BBBHHBHHHHBB")


def _rgb555(word: int) -> tuple[int, int, int]:
    """A1R5G5B5 word → replicated 8-bit (r, g, b); bit 15 ignored."""
    return (
        _replicate((word >> 10) & 31, 5),
        _replicate((word >> 5) & 31, 5),
        _replicate(word & 31, 5),
    )


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
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"bad TGA image type {img_type}")
    mapped = img_type in (1, 9)
    mono = img_type in (3, 11)
    if mapped:
        if cmap_type != 1 or cmap_len == 0:
            raise ValueError("color-mapped TGA without a color map")
        if depth != 8:
            raise NotImplementedError(
                f"color-mapped TGA with {depth}-bit indices"
            )
        if _cmap_bits not in (16, 24, 32):
            raise NotImplementedError(
                f"unsupported TGA color-map entry size {_cmap_bits}"
            )
    else:
        if cmap_type != 0 or cmap_len != 0:
            raise ValueError("unmapped TGA with a color map")
        if mono and depth != 8:
            raise NotImplementedError(f"monochrome TGA at {depth} bpp")
        if not mono and depth not in (16, 24, 32):
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
    palette = []
    if mapped:
        entry_bytes = _cmap_bits // 8
        need = cmap_len * entry_bytes
        if len(data) < pos + need:
            raise ValueError("truncated TGA color map")
        for i in range(cmap_len):
            e = data[pos + i * entry_bytes : pos + (i + 1) * entry_bytes]
            if _cmap_bits == 16:
                palette.append(_rgb555(struct.unpack("<H", e)[0]))
            elif _cmap_bits == 24:
                palette.append((e[2], e[1], e[0]))
            else:
                palette.append((e[2], e[1], e[0], e[3]))
        pos += need
    n_pix = w * h
    px = bytearray()
    if img_type in (1, 2, 3):
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
    out_ch = nch
    for r in rows:
        base = r * w * nch
        for x in range(w):
            i = base + x * nch
            if mono:
                out.append(px[i])
                out_ch = 1
            elif mapped:
                idx = px[i] - _cmap_first
                if not (0 <= idx < len(palette)):
                    raise ValueError("TGA color-map index out of range")
                out.extend(palette[idx])
                out_ch = len(palette[0])
            elif nch == 2:
                word = px[i] | (px[i + 1] << 8)
                out.extend(_rgb555(word))
                out_ch = 3
            else:
                b, g, rr = px[i], px[i + 1], px[i + 2]
                out.extend((rr, g, b))
                if nch == 4:
                    out.append(px[i + 3])
    return {
        "width": w, "height": h, "channels": out_ch, "pixels": bytes(out),
    }


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
    if channels not in (1, 3, 4):
        raise ValueError("TGA encodes 1, 3 or 4 channels")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel count does not match dimensions")
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError("dimensions exceed TGA's 16-bit fields")
    descriptor = (8 if channels == 4 else 0) | (0x20 if top_down else 0)
    if channels == 1:
        img_type = 11 if rle else 3  # monochrome
    else:
        img_type = 10 if rle else 2
    header = _HDR.pack(
        0,
        0,
        img_type,
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
    if channels == 1:
        rows = [
            bytes(pixels[r * width : (r + 1) * width])
            for r in range(height)
        ]
    else:
        rows = _bgr_rows(pixels, width, height, channels)
    if not top_down:
        rows = rows[::-1]
    if rle:
        body = b"".join(_rle_row(r, channels) for r in rows)
    else:
        body = b"".join(rows)
    return header + body


def encode_tga16(
    pixels: bytes,
    width: int,
    height: int,
    rle: bool = False,
    top_down: bool = True,
) -> bytes:
    """Encode TOP-DOWN RGB pixels as 16-bpp A1R5G5B5 true-color TGA
    (channels quantized v >> 3, attribute bit left 0): decode
    bit-replicates back, so the round trip is an idempotent
    projection, exact on 5-bit-replicated values — the BMP-16
    contract."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel count does not match dimensions")
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError("dimensions exceed TGA's 16-bit fields")
    descriptor = 0x20 if top_down else 0
    header = _HDR.pack(
        0, 0, 10 if rle else 2, 0, 0, 0, 0, 0,
        width, height, 16, descriptor,
    )
    rows = []
    for r in range(height):
        row = bytearray()
        for x in range(width):
            i = (r * width + x) * 3
            word = (
                ((pixels[i] >> 3) << 10)
                | ((pixels[i + 1] >> 3) << 5)
                | (pixels[i + 2] >> 3)
            )
            row.extend(struct.pack("<H", word))
        rows.append(bytes(row))
    if not top_down:
        rows = rows[::-1]
    body = (
        b"".join(_rle_row(r, 2) for r in rows) if rle else b"".join(rows)
    )
    return header + body


def encode_tga_cmap(
    indices: bytes,
    width: int,
    height: int,
    palette: list,
    entry_bits: int = 24,
    first: int = 0,
    rle: bool = False,
    top_down: bool = True,
) -> bytes:
    """Encode 8-bit palette indices as a color-mapped TGA (type 1
    raw / type 9 RLE): `palette` holds (r, g, b) or (r, g, b, a)
    tuples stored as BGR / BGRA / A1R5G5B5 entries per `entry_bits`;
    `first` sets the color-map origin (indices are stored offset by
    it, the way real writers use cmap_first)."""
    if len(indices) != width * height:
        raise ValueError("index count does not match dimensions")
    if not palette or len(palette) > 256 - first:
        raise ValueError("bad TGA palette size")
    if entry_bits not in (16, 24, 32):
        raise ValueError("TGA color-map entries are 16, 24 or 32 bits")
    if any(i >= len(palette) for i in indices):
        raise ValueError("palette index out of range")
    cmap = bytearray()
    for entry in palette:
        if entry_bits == 16:
            r, g, b = entry[:3]
            cmap.extend(
                struct.pack(
                    "<H", ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
                )
            )
        elif entry_bits == 24:
            r, g, b = entry[:3]
            cmap.extend((b, g, r))
        else:
            r, g, b, a = entry
            cmap.extend((b, g, r, a))
    descriptor = 0x20 if top_down else 0
    header = _HDR.pack(
        0, 1, 9 if rle else 1, first, len(palette), entry_bits,
        0, 0, width, height, 8, descriptor,
    )
    rows = [
        bytes(i + first for i in indices[r * width : (r + 1) * width])
        for r in range(height)
    ]
    if not top_down:
        rows = rows[::-1]
    body = (
        b"".join(_rle_row(r, 1) for r in rows) if rle else b"".join(rows)
    )
    return header + bytes(cmap) + body
