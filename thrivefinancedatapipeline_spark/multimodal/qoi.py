"""QOI ("Quite OK Image") codec — pure Python, no dependencies.

Implements the complete public specification (qoiformat.org, CC0
one-page spec): 14-byte big-endian header, the six chunk ops
(RGB/RGBA literals, 64-slot running index, small wrap-around DIFF,
two-byte LUMA, 1..62-pixel RUN) and the 8-byte end marker. The
format is lossless and single-pass in both directions, so the codec
is fully verifiable offline: decode(encode(x)) == x bit-exact for
every image, and the channels=3 vs channels=4 encodings of the same
opaque content are a pure bit RE-ORDERING — the codec-parity
principle applies and tests pin their decodes pixel-EXACT (the
interlace/progressive rule).

The encoder mirrors the reference encoder's greedy op order
(run → index → diff → luma → literal), making its output
deterministic; the decoder accepts ANY spec-conforming stream.
Corrupt streams (bad magic, truncation, pixel over/underflow, a
missing end marker) raise ValueError.
"""

from __future__ import annotations

import struct

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def is_qoi(data: bytes) -> bool:
    return data[:4] == _MAGIC


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(data: bytes) -> dict:
    """QOI → {'width','height','channels','pixels'}: RGB bytes when
    the header declares 3 channels, RGBA when 4 (the header channel
    count selects the OUTPUT layout; alpha is tracked through the op
    stream either way, as the spec requires)."""
    if not is_qoi(data):
        raise ValueError("not a QOI stream")
    if len(data) < 14 + len(_END):
        raise ValueError("truncated QOI header")
    w, h = struct.unpack_from(">II", data, 4)
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"bad QOI colorspace {colorspace}")
    if w == 0 or h == 0 or w * h > 400_000_000:
        raise ValueError("bad QOI dimensions")
    n_px = w * h
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    out = bytearray()
    pos, emitted = 14, 0
    end_at = len(data) - len(_END)
    while emitted < n_px:
        if pos >= end_at:
            raise ValueError("QOI chunk stream ends before last pixel")
        op = data[pos]
        pos += 1
        if op == _OP_RGB:
            if pos + 3 > end_at:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == _OP_RGBA:
            if pos + 4 > end_at:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[op & 0x3F]
            elif tag == _OP_DIFF:
                r = (r + ((op >> 4) & 0x03) - 2) % 256
                g = (g + ((op >> 2) & 0x03) - 2) % 256
                b = (b + (op & 0x03) - 2) % 256
            elif tag == _OP_LUMA:
                if pos + 1 > end_at:
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (op & 0x3F) - 32
                byte2 = data[pos]
                pos += 1
                r = (r + dg + ((byte2 >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (byte2 & 0x0F) - 8) % 256
            else:  # _OP_RUN
                run = (op & 0x3F) + 1
                if emitted + run > n_px:
                    raise ValueError("QOI run overflows pixel count")
                px = (r, g, b) if channels == 3 else (r, g, b, a)
                out.extend(bytes(px) * run)
                emitted += run
                index[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out.extend((r, g, b) if channels == 3 else (r, g, b, a))
        emitted += 1
    if data[pos : pos + len(_END)] != _END:
        raise ValueError("missing QOI end marker")
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "pixels": bytes(out),
    }


def encode_qoi(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    colorspace: int = 0,
) -> bytes:
    """Encode top-down row-major RGB (channels=3) or RGBA (channels=4)
    pixels as QOI, using the reference encoder's greedy op order —
    deterministic output for deterministic input."""
    if channels not in (3, 4):
        raise ValueError("QOI encodes 3 or 4 channels")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel count does not match dimensions")
    out = bytearray(
        struct.pack(">4sIIBB", _MAGIC, width, height, channels, colorspace)
    )
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(0, len(pixels), channels):
        r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
        a = pixels[i + 3] if channels == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run > 0:
            out.append(_OP_RUN | (run - 1))
            run = 0
        h = _hash(r, g, b, a)
        if index[h] == (r, g, b, a):
            out.append(_OP_INDEX | h)
        else:
            index[h] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                # the reference encoder computes the cross-diffs with
                # int8 wraparound as well (vg_r/vg_b are signed char)
                dr_dg = (dr - dg + 128) % 256 - 128
                db_dg = (db - dg + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out.extend((_OP_RGB, r, g, b))
            else:
                out.extend((_OP_RGBA, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run > 0:
        out.append(_OP_RUN | (run - 1))
    out.extend(_END)
    return bytes(out)
