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

P1/P4 bitmaps (1-bit, r10) decode for real: P4 packs 8 pixels per
byte MSB-first with every row padded to a byte boundary, P1 is ascii
'0'/'1' digits (contiguous digits are legal — the one netpbm header
whose samples need no separators). Both decode to 8-bit GRAY with
the PBM ink convention (1 = black = 0, 0 = white = 255), so the
ascii and packed forms of one bitmap are again a pure bit
re-representation — decode(P1) == decode(P4) pinned pixel-EXACT.

PAM 'P7' (r11) decodes for real: the line-based keyword header
(WIDTH/HEIGHT/DEPTH/MAXVAL each exactly once, optional TUPLTYPE
lines concatenated, '#' comment lines, ENDHDR terminator) followed
by a binary raster of DEPTH samples per pixel (2-byte big-endian
when MAXVAL > 255). The known tuple types pin their depth
(GRAYSCALE 1, GRAYSCALE_ALPHA 2, RGB 3, RGB_ALPHA 4,
BLACKANDWHITE 1 with maxval 1); unknown types are legal per spec.
A PAM GRAYSCALE / RGB raster holds the SAME samples as the P5 / P6
container — decode parity pinned pixel-EXACT (the re-container
rule). Corrupt streams raise ValueError.
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
    if data[:2] == b"P7":
        return decode_pam(data)
    if not is_pnm(data):
        raise ValueError("not a PNM stream")
    magic = data[:2]
    if magic in (b"P1", b"P4"):
        return _decode_pbm(data, magic)
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


#: TUPLTYPE -> required depth (PAM spec section "TUPLTYPE"); the
#: BLACKANDWHITE type additionally pins maxval 1
_PAM_DEPTHS = {
    b"BLACKANDWHITE": 1,
    b"GRAYSCALE": 1,
    b"GRAYSCALE_ALPHA": 2,
    b"RGB": 3,
    b"RGB_ALPHA": 4,
}


def decode_pam(data: bytes) -> dict:
    """PAM (P7) → the decode_pnm dict shape plus 'tupltype':
    channels == DEPTH, pixels as raw row-major samples (2-byte
    big-endian when MAXVAL > 255)."""
    if data[:2] != b"P7":
        raise ValueError("not a PAM stream")
    fields: dict[bytes, int] = {}
    tupltype: list[bytes] = []
    pos = data.find(b"\n")
    if pos < 0:
        raise ValueError("truncated PAM header")
    # the spec magic is 'P7' ALONE on its line — 'P7FOO' is not a PAM
    # stream (r11 ADVICE: only data[:2] was checked before)
    if data[2:pos].strip():
        raise ValueError("not a PAM stream")
    pos += 1
    while True:
        end = data.find(b"\n", pos)
        if end < 0:
            raise ValueError("PAM header missing ENDHDR")
        line = data[pos:end].strip()
        pos = end + 1
        if not line or line.startswith(b"#"):
            continue
        if line == b"ENDHDR":
            break
        parts = line.split(None, 1)
        key = parts[0]
        if key == b"TUPLTYPE":
            if len(parts) == 2:
                tupltype.append(parts[1])
            continue
        if key not in (b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL"):
            raise ValueError(f"unknown PAM header field {key!r}")
        if key in fields:
            raise ValueError(f"duplicate PAM header field {key!r}")
        if len(parts) != 2 or not parts[1].isdigit():
            raise ValueError(f"bad PAM header value for {key!r}")
        fields[key] = int(parts[1])
    missing = {b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL"} - set(fields)
    if missing:
        raise ValueError(f"PAM header missing {sorted(missing)}")
    w, h = fields[b"WIDTH"], fields[b"HEIGHT"]
    depth, maxval = fields[b"DEPTH"], fields[b"MAXVAL"]
    if w <= 0 or h <= 0 or depth <= 0 or not (0 < maxval < 65536):
        raise ValueError("bad PAM dimensions/depth/maxval")
    tt = b" ".join(tupltype)
    want = _PAM_DEPTHS.get(tt)
    if want is not None and depth != want:
        raise ValueError(f"PAM depth {depth} contradicts TUPLTYPE {tt!r}")
    if tt == b"BLACKANDWHITE" and maxval != 1:
        raise ValueError("BLACKANDWHITE PAM requires maxval 1")
    n_samples = w * h * depth
    wide = maxval > 255
    need = n_samples * (2 if wide else 1)
    raster = data[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PAM raster")
    samples = (
        list(struct.unpack(f">{n_samples}H", raster))
        if wide
        else list(raster)
    )
    if any(v > maxval for v in samples):
        raise ValueError("PAM sample exceeds maxval")
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "channels": depth,
        "tupltype": tt.decode("ascii", "replace"),
        "pixels": bytes(raster[:need]),
    }


def encode_pam(
    pixels: bytes,
    width: int,
    height: int,
    depth: int = 3,
    maxval: int = 255,
    tupltype: str | None = None,
) -> bytes:
    """Encode raw samples as PAM (P7). tupltype defaults to the
    standard name for the depth when one exists."""
    samples = _samples(pixels, maxval)
    if len(samples) != width * height * depth:
        raise ValueError("pixel count does not match dimensions")
    if any(v > maxval for v in samples):
        raise ValueError("sample exceeds maxval")
    if tupltype is None:
        std = {1: "GRAYSCALE", 2: "GRAYSCALE_ALPHA", 3: "RGB",
               4: "RGB_ALPHA"}
        tupltype = std.get(depth, "")
    hdr = (
        f"P7\nWIDTH {width}\nHEIGHT {height}\nDEPTH {depth}\n"
        f"MAXVAL {maxval}\n"
    )
    if tupltype:
        hdr += f"TUPLTYPE {tupltype}\n"
    hdr += "ENDHDR\n"
    if maxval > 255:
        raster = struct.pack(f">{len(samples)}H", *samples)
    else:
        raster = bytes(samples)
    return hdr.encode() + raster


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


def _decode_pbm(data: bytes, magic: bytes) -> dict:
    """P1/P4 bitmap → 8-bit GRAY (PBM ink: bit 1 = black = 0, bit 0 =
    white = 255) with the standard dict shape (maxval reported as
    255, the gray range the bits were mapped onto)."""
    (w, h), off = _read_header_tokens(data, 2)
    if w <= 0 or h <= 0:
        raise ValueError("bad PBM dimensions")
    out = bytearray()
    if magic == b"P4":
        stride = (w + 7) // 8
        need = stride * h
        raster = data[off : off + need]
        if len(raster) < need:
            raise ValueError("truncated PBM raster")
        for r in range(h):
            base = r * stride
            for x in range(w):
                bit = (raster[base + (x >> 3)] >> (7 - (x & 7))) & 1
                out.append(0 if bit else 255)
    else:
        i = off
        n = len(data)
        while len(out) < w * h:
            if i >= n:
                raise ValueError("truncated PBM raster")
            c = data[i : i + 1]
            i += 1
            if c.isspace():
                continue
            if c == b"#":
                while i < n and data[i] not in (0x0A, 0x0D):
                    i += 1
                continue
            if c == b"0":
                out.append(255)
            elif c == b"1":
                out.append(0)
            else:
                raise ValueError("bad P1 PBM sample")
    return {
        "width": w,
        "height": h,
        "maxval": 255,
        "channels": 1,
        "pixels": bytes(out),
    }


def encode_pbm(
    bits: bytes, width: int, height: int, ascii_form: bool = False
) -> bytes:
    """Encode a 0/1-per-byte bitmap as PBM — P4 packed (MSB-first,
    byte-aligned rows) by default, P1 ascii on request; both decode
    to identical gray pixels (test-pinned)."""
    if len(bits) != width * height:
        raise ValueError("bit count does not match dimensions")
    if any(b not in (0, 1) for b in bits):
        raise ValueError("PBM bits must be 0 or 1")
    header = f"{width} {height}\n".encode()
    if ascii_form:
        body = b"\n".join(
            b"".join(
                b"1" if bits[r * width + x] else b"0" for x in range(width)
            )
            for r in range(height)
        )
        return b"P1\n" + header + body + b"\n"
    stride = (width + 7) // 8
    raster = bytearray()
    for r in range(height):
        row = bytearray(stride)
        for x in range(width):
            if bits[r * width + x]:
                row[x >> 3] |= 0x80 >> (x & 7)
        raster.extend(row)
    return b"P4\n" + header + bytes(raster)
