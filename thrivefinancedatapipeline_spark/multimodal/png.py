"""Baseline PNG codec on the Python stdlib only (zlib + struct).

The container has no PIL/imageio, but baseline PNG (8-bit, grayscale /
RGB / gray+alpha / RGBA, non-interlaced) needs nothing beyond zlib
inflate and the five scanline filters from the PNG spec (RFC 2083
section 6): None, Sub, Up, Average, Paeth. That is enough to run the
multimodal decode kernel on REAL image bytes instead of the
deterministic fake, keeping the NotImplementedError gate only for the
formats that genuinely need a native codec (JPEG, palette/interlaced/
16-bit PNG, video, audio).

The encoder exists so tests and the demo query can synthesize valid
PNGs deterministically (any filter type per scanline — exercising every
reconstruction branch of the decoder round-trip).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> dict:
    """Decode a baseline PNG → {width, height, channels, pixels}.

    `pixels` is the raw scanline-major bytes (width*channels per row).
    Raises NotImplementedError for PNG features outside the baseline
    subset (palette, interlace, 16-bit) and ValueError for corrupt
    streams — callers keep the explicit not-a-codec-for-this gate.
    """
    if not is_png(data):
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8 or color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "outside the baseline subset (8-bit gray/RGB/GA/RGBA)"
                )
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prior[i], c)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels as a valid baseline PNG. `filter_type`
    applies the chosen scanline filter to EVERY row (0..4) — the test
    hook that makes the decoder walk each reconstruction branch."""
    channels = _CHANNELS[color_type]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    bpp = channels
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        elif filter_type == 1:
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:
            raw += bytes(
                (line[i] - prior[i]) & 0xFF for i in range(stride)
            )
        elif filter_type == 3:
            raw += bytes(
                (
                    line[i]
                    - (((line[i - bpp] if i >= bpp else 0) + prior[i]) >> 1)
                )
                & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"invalid filter type {filter_type}")
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )
