"""Windows ICO container — pure Python, no dependencies.

An icon file is a directory of independently-encoded images (the
multi-resolution favicon format web-crawl corpora are full of): a
6-byte ICONDIR (reserved 0, type 1, count), 16-byte directory
entries, and per entry either a PNG stream (the modern 256px form —
delegated to `multimodal.png`) or a BITMAPINFOHEADER "DIB" with
DOUBLED biHeight covering the XOR color raster (bottom-up BGRA/BGR)
followed by a 1-bpp AND transparency mask (bottom-up, MSB-first,
4-byte row stride).

Decode returns every frame as TOP-DOWN RGBA: 32-bpp XOR rasters keep
their alpha byte, 24-bpp frames derive alpha from the AND mask
(mask bit 1 = transparent), and in BOTH cases an AND bit forces the
pixel transparent (the classic renderer rule — 32-bpp icons written
by pre-alpha tools carry all-zero alpha and rely on the mask).

CUR cursor files (type 2, r10) decode for real: the container is
ICO with the directory's planes/bpp fields reinterpreted as the
click hotspot — decode_cur returns the same RGBA frames plus
(hotspot_x, hotspot_y), bounds-checked against the frame.

Paletted DIB frames (1/4/8 bpp, RGBQUAD color table, MSB-first
packed indices) decode for real since r11 and encode via
``encode_ico(..., paletted={idx: bpp})`` — pinned pixel-EQUAL
against the 32-bpp storage of the same content (the reorder-only
codec-parity principle). BITFIELDS and other depths keep an
explicit NotImplementedError gate; corrupt streams raise
ValueError.
"""

from __future__ import annotations

import struct

from . import png


def is_ico(data: bytes) -> bool:
    return len(data) >= 6 and data[:4] == b"\x00\x00\x01\x00"


def _decode_dib_frame(sub: bytes) -> dict:
    if len(sub) < 40:
        raise ValueError("truncated ICO DIB header")
    (
        hdr_size,
        w,
        h2,
        planes,
        bpp,
        compression,
    ) = struct.unpack_from("<IiiHHI", sub, 0)
    if hdr_size != 40:
        raise NotImplementedError("non-BITMAPINFOHEADER ICO frame")
    if compression != 0:
        raise NotImplementedError("compressed ICO DIB frame")
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"unsupported ICO DIB depth ({bpp} bpp)")
    if planes not in (0, 1):
        raise ValueError("bad ICO DIB planes")
    if w <= 0 or h2 <= 0 or h2 % 2:
        raise ValueError("bad ICO DIB dimensions (height must double)")
    h = h2 // 2
    clr_used = struct.unpack_from("<I", sub, 32)[0]
    if clr_used > 256:
        raise ValueError("bad ICO DIB biClrUsed")
    pal: list[tuple[int, int, int]] = []
    if bpp <= 8:
        # paletted frame: biClrUsed RGBQUADs (2^bpp when zero)
        n_pal = clr_used or (1 << bpp)
        if len(sub) < hdr_size + 4 * n_pal:
            raise ValueError("truncated ICO DIB palette")
        pal = [
            tuple(sub[hdr_size + 4 * j : hdr_size + 4 * j + 3])
            for j in range(n_pal)
        ]
        xor_off = hdr_size + 4 * n_pal
    else:
        # 24/32-bpp frames may still carry a (redundant but legal)
        # "optimal palette" color table of biClrUsed RGBQUADs before
        # the XOR raster — skip it, or the raster would be misread
        # from the palette bytes.
        xor_off = hdr_size + 4 * clr_used
    xor_stride = ((w * bpp + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    and_off = xor_off + xor_stride * h
    if len(sub) < and_off + and_stride * h:
        raise ValueError("truncated ICO DIB raster")
    out = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up storage
        xbase = xor_off + r * xor_stride
        mbase = and_off + r * and_stride
        for x in range(w):
            if bpp == 32:
                b, g, rr, a = sub[xbase + 4 * x : xbase + 4 * x + 4]
            elif bpp == 24:
                b, g, rr = sub[xbase + 3 * x : xbase + 3 * x + 3]
                a = 255
            else:
                if bpp == 8:
                    idx = sub[xbase + x]
                elif bpp == 4:
                    byte = sub[xbase + (x >> 1)]
                    idx = (byte >> 4) if x % 2 == 0 else (byte & 0x0F)
                else:  # 1 bpp, MSB-first
                    idx = (sub[xbase + (x >> 3)] >> (7 - (x & 7))) & 1
                if idx >= len(pal):
                    raise ValueError("ICO palette index out of range")
                b, g, rr = pal[idx]
                a = 255
            mask = (sub[mbase + (x >> 3)] >> (7 - (x & 7))) & 1
            if mask:
                a = 0
            out.extend((rr, g, b, a))
    return {"width": w, "height": h, "channels": 4, "pixels": bytes(out)}


def _png_to_rgba(img: dict) -> dict:
    px, ch = img["pixels"], img["channels"]
    if ch == 4:
        rgba = px
    elif ch == 3:
        rgba = b"".join(
            px[i : i + 3] + b"\xff" for i in range(0, len(px), 3)
        )
    elif ch == 2:  # gray+alpha
        rgba = b"".join(
            bytes((px[i], px[i], px[i], px[i + 1]))
            for i in range(0, len(px), 2)
        )
    else:  # gray
        rgba = b"".join(bytes((v, v, v, 255)) for v in px)
    return {
        "width": img["width"],
        "height": img["height"],
        "channels": 4,
        "pixels": rgba,
    }


def decode_ico(data: bytes) -> list[dict]:
    """ICO → list of TOP-DOWN RGBA frames (directory order)."""
    if not is_ico(data):
        raise ValueError("not an ICO stream")
    count = struct.unpack_from("<H", data, 4)[0]
    if count == 0:
        raise ValueError("empty ICO directory")
    frames = []
    for i in range(count):
        ent = 6 + 16 * i
        if len(data) < ent + 16:
            raise ValueError("truncated ICO directory")
        size, off = struct.unpack_from("<II", data, ent + 8)
        if off + size > len(data):
            raise ValueError("ICO frame outside the file")
        sub = data[off : off + size]
        if png.is_png(sub):
            frames.append(_png_to_rgba(png.decode_png(sub)))
        else:
            frames.append(_decode_dib_frame(sub))
    return frames


def encode_ico(
    frames: list[tuple[bytes, int, int]],
    png_frames: frozenset = frozenset(),
    paletted: dict[int, int] | None = None,
) -> bytes:
    """Encode TOP-DOWN RGBA frames as an ICO — 32-bpp DIB entries by
    default (alpha kept in the XOR raster AND mirrored into the AND
    mask where fully transparent), a real PNG stream for the frame
    indices in `png_frames` (the modern large-size form), or a
    paletted DIB at `paletted[idx]` ∈ {1, 4, 8} bpp (the classic
    small-icon form: a color table of RGBQUADs, MSB-first packed
    indices, transparency ONLY via the AND mask — so paletted frames
    require alpha ∈ {0, 255} and at most 2^bpp distinct colors).
    Decoding any storage returns the same RGBA — test-pinned."""
    if not frames:
        raise ValueError("no ICO frames")
    paletted = paletted or {}
    blobs = []
    dir_meta = []  # (color_count_byte, bpp) per frame directory entry
    for idx, (pixels, w, h) in enumerate(frames):
        if len(pixels) != w * h * 4:
            raise ValueError("frame pixels must be RGBA")
        if not (0 < w <= 256 and 0 < h <= 256):
            raise ValueError("ICO frames are at most 256x256")
        if idx in png_frames:
            blobs.append(png.encode_png(pixels, w, h, color_type=6))
            dir_meta.append((0, 32))
            continue
        and_stride = ((w + 31) // 32) * 4
        mask = bytearray()
        for r in range(h - 1, -1, -1):
            row = bytearray(and_stride)
            for x in range(w):
                if pixels[(r * w + x) * 4 + 3] == 0:
                    row[x >> 3] |= 0x80 >> (x & 7)
            mask.extend(row)
        if idx in paletted:
            bpp = paletted[idx]
            if bpp not in (1, 4, 8):
                raise ValueError("paletted ICO depth must be 1, 4, or 8")
            colors: list[tuple[int, int, int]] = []
            cindex: dict[tuple[int, int, int], int] = {}
            for p in range(0, len(pixels), 4):
                rr, g, b, a = pixels[p : p + 4]
                if a not in (0, 255):
                    raise ValueError(
                        "paletted ICO frames cannot keep partial alpha"
                    )
                key = (rr, g, b)
                if key not in cindex:
                    cindex[key] = len(colors)
                    colors.append(key)
            if len(colors) > (1 << bpp):
                raise ValueError("too many colors for paletted ICO depth")
            xor_stride = ((w * bpp + 31) // 32) * 4
            xor = bytearray()
            for r in range(h - 1, -1, -1):
                row = bytearray(xor_stride)
                for x in range(w):
                    i = (r * w + x) * 4
                    ci = cindex[tuple(pixels[i : i + 3])]
                    if bpp == 8:
                        row[x] = ci
                    elif bpp == 4:
                        row[x >> 1] |= (ci << 4) if x % 2 == 0 else ci
                    elif ci:
                        row[x >> 3] |= 0x80 >> (x & 7)
                xor.extend(row)
            pal = b"".join(bytes((b, g, rr, 0)) for (rr, g, b) in colors)
            hdr = struct.pack(
                "<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0,
                len(pal) + len(xor) + len(mask), 2835, 2835,
                len(colors), 0,
            )
            blobs.append(hdr + pal + bytes(xor) + bytes(mask))
            dir_meta.append((len(colors) % 256, bpp))
            continue
        xor = bytearray()
        for r in range(h - 1, -1, -1):
            for x in range(w):
                i = (r * w + x) * 4
                rr, g, b, a = pixels[i : i + 4]
                xor.extend((b, g, rr, a))
        hdr = struct.pack(
            "<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
            len(xor) + len(mask), 2835, 2835, 0, 0,
        )
        blobs.append(hdr + bytes(xor) + bytes(mask))
        dir_meta.append((0, 32))
    out = bytearray(struct.pack("<HHH", 0, 1, len(frames)))
    off = 6 + 16 * len(frames)
    for (pixels, w, h), blob, (cc, bpp) in zip(frames, blobs, dir_meta):
        out.extend(
            struct.pack(
                "<BBBBHHII",
                w % 256,  # 256 stored as 0 per spec
                h % 256,
                cc,
                0,
                1,
                bpp,
                len(blob),
                off,
            )
        )
        off += len(blob)
    for blob in blobs:
        out.extend(blob)
    return bytes(out)


def is_cur(data: bytes) -> bool:
    return len(data) >= 6 and data[:4] == b"\x00\x00\x02\x00"


def decode_cur(data: bytes) -> list[dict]:
    """CUR (cursor) → ICO frames + per-frame (hotspot_x, hotspot_y):
    the container is byte-identical to ICO except type=2 and the
    directory's planes/bpp fields are reinterpreted as the hotspot."""
    if not is_cur(data):
        raise ValueError("not a CUR stream")
    count = struct.unpack_from("<H", data, 4)[0]
    if count == 0:
        raise ValueError("empty CUR directory")
    frames = decode_ico(b"\x00\x00\x01\x00" + data[4:])
    for i, f in enumerate(frames):
        hx, hy = struct.unpack_from("<HH", data, 6 + 16 * i + 4)
        if hx >= f["width"] or hy >= f["height"]:
            raise ValueError("CUR hotspot outside the frame")
        f["hotspot_x"], f["hotspot_y"] = hx, hy
    return frames


def encode_cur(
    frames: list[tuple[bytes, int, int, int, int]]
) -> bytes:
    """Encode (rgba, w, h, hotspot_x, hotspot_y) frames as a CUR:
    reuse the ICO encoder, then flip the type and write hotspots into
    the directory's planes/bpp slots."""
    for _px, w, h, hx, hy in frames:
        if not (0 <= hx < w and 0 <= hy < h):
            raise ValueError("CUR hotspot outside the frame")
    blob = bytearray(encode_ico([(px, w, h) for px, w, h, _x, _y in frames]))
    struct.pack_into("<H", blob, 2, 2)  # ICONDIR type: cursor
    for i, (_px, _w, _h, hx, hy) in enumerate(frames):
        struct.pack_into("<HH", blob, 6 + 16 * i + 4, hx, hy)
    return bytes(blob)
