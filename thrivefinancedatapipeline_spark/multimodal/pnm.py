"""Netpbm (PGM/PPM) codec — pure Python, no dependencies.

The netpbm family is the simplest real raster container still in
daily ML-pipeline use (OpenCV/ImageMagick intermediates, scientific
corpora): a whitespace/comment-tolerant ASCII header (magic, width,
height, maxval) followed by the raster in either BINARY (P5 gray /
P6 RGB; 1 byte per sample, or 2 bytes BIG-endian when maxval > 255)
or ASCII (P2 / P3; whitespace-separated decimals) form.

The ascii and binary forms encode the SAME samples — a format
feature that only re-represents bits — so the codec-parity principle
applies: tests pin decode(ascii) == decode(binary) pixel-EXACT, the
strongest possible oracle (the progressive-JPEG/interlace rule).

P1/P4 bitmaps (1-bit) and the PAM 'P7' extension keep an explicit
NotImplementedError gate; corrupt streams raise ValueError.
"""

from __future__ import annotations

import struct

_BINARY = {b"P5": 1, b"P6": 3}
_ASCII = {b"P2": 1, b"P3": 3}


def is_pnm(data: bytes) -> bool:
    return len(data) >= 2 and data[:1] == b"P" and data[1:2] in b"123456"


def _read_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse `n_tokens` whitespace/comment-separated decimal header
    tokens starting after the magic; returns (values, offset past the
    single whitespace byte that terminates the header)."""
    vals: list[int] = []
    i = 2
    n = len(data)
    while len(vals) < n_tokens:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and data[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("bad PNM header")
        vals.append(int(data[i:j]))
        i = j
    if i >= n or not data[i : i + 1].isspace():
        raise ValueError("bad PNM header terminator")
    return vals, i + 1


def decode_pnm(data: bytes) -> dict:
    """PGM/PPM → {'width','height','maxval','channels','pixels'} with
    pixels as raw sample bytes in row-major order (2-byte BIG-endian
    per sample when maxval > 255 — the PNG 16-bit convention)."""
    if not is_pnm(data):
        raise ValueError("not a PNM stream")
    magic = data[:2]
    if magic in (b"P1", b"P4"):
        raise NotImplementedError("1-bit PBM not supported")
    if magic not in _BINARY and magic not in _ASCII:
        raise NotImplementedError(f"unsupported netpbm magic {magic!r}")
    (w, h, maxval), off = _read_header_tokens(data, 3)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError("bad PNM dimensions/maxval")
    ch = _BINARY.get(magic) or _ASCII[magic]
    n_samples = w * h * ch
    wide = maxval > 255
    if magic in _BINARY:
        need = n_samples * (2 if wide else 1)
        raster = data[off : off + need]
        if len(raster) < need:
            raise ValueError("truncated PNM raster")
        if wide:
            samples = list(struct.unpack(f">{n_samples}H", raster))
        else:
            samples = list(raster)
    else:
        toks = data[off:].split()
        if len(toks) < n_samples:
            raise ValueError("truncated PNM raster")
        try:
            samples = [int(t) for t in toks[:n_samples]]
        except ValueError as exc:
            raise ValueError("bad ASCII PNM sample") from exc
    if any(s > maxval for s in samples):
        raise ValueError("PNM sample exceeds maxval")
    if wide:
        pixels = struct.pack(f">{n_samples}H", *samples)
    else:
        pixels = bytes(samples)
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "channels": ch,
        "pixels": pixels,
    }


def _samples(pixels: bytes, maxval: int) -> list[int]:
    if maxval > 255:
        if len(pixels) % 2:
            raise ValueError("odd pixel byte count for 16-bit PNM")
        return list(struct.unpack(f">{len(pixels) // 2}H", pixels))
    return list(pixels)


def encode_pnm(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    maxval: int = 255,
    ascii_form: bool = False,
) -> bytes:
    """Encode raw samples as PGM (1 channel) / PPM (3), binary by
    default, ASCII on request — both decode to identical pixels."""
    if channels not in (1, 3):
        raise ValueError("PNM supports 1 (PGM) or 3 (PPM) channels")
    samples = _samples(pixels, maxval)
    if len(samples) != width * height * channels:
        raise ValueError("pixel count does not match dimensions")
    if any(s > maxval for s in samples):
        raise ValueError("sample exceeds maxval")
    if ascii_form:
        magic = b"P2" if channels == 1 else b"P3"
        body = []
        per_row = width * channels
        for r in range(height):
            row = samples[r * per_row : (r + 1) * per_row]
            body.append(" ".join(str(s) for s in row).encode())
        return (
            magic + b"\n" + f"{width} {height}\n{maxval}\n".encode()
            + b"\n".join(body) + b"\n"
        )
    magic = b"P5" if channels == 1 else b"P6"
    if maxval > 255:
        raster = struct.pack(f">{len(samples)}H", *samples)
    else:
        raster = bytes(samples)
    return magic + b"\n" + f"{width} {height}\n{maxval}\n".encode() + raster
