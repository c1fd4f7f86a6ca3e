"""GIF (LZW) codec on the Python stdlib only.

Companion to the baseline-PNG codec (`multimodal/png.py`): GIF87a/89a
with a global or local color table needs nothing beyond bit twiddling —
the LZW variant is specified in the GIF89a spec (CompuServe 1990,
public) with LSB-first code packing and a 12-bit code-width ceiling.
Decoded output mirrors `decode_png`: width/height plus the RGB pixel
bytes (indices mapped through the active color table), so the
multimodal kernel checksums both formats identically.

Interlaced images and animation frames beyond the first keep the
explicit NotImplementedError gate — same policy as non-baseline PNG.
r7: 4-pass INTERLACED images decode for real (row-permutation on the
decoded indices; the encoder can emit the interlaced layout, so the
bit-exact round trip pins both directions).

The encoder synthesizes valid GIFs deterministically for tests and the
demo query. It emits a CLEAR code before every pixel code, which pins
the code width at min+1 bits (the dictionary never grows) — larger
output than real LZW but bit-valid per the spec, and it exercises the
decoder's reset path; the decoder implements the full growing-
dictionary algorithm regardless.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in GIF_MAGICS


def _lzw_decode(min_code: int, data: bytes) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    # the literal table never changes — build it once and dict-copy on
    # CLEAR (a C-speed copy; rebuilding via comprehension per CLEAR
    # dominated decode for the clear-per-symbol encoder's streams)
    base: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    pos = 0
    total = len(data) * 8
    # whole-stream integer: one shift+mask per code instead of
    # bit-by-bit assembly (LSB-first packing makes this a plain
    # right-shift)
    stream = int.from_bytes(data, "little")
    while pos + code_size <= total:
        code = (stream >> pos) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            code_size = min_code + 1
            table = dict(base)
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            # first code after a CLEAR must be a literal already in the
            # table — a dictionary code here is corrupt, and a bare
            # dict lookup would leak KeyError instead of the
            # documented ValueError
            if code not in table:
                raise ValueError(f"corrupt LZW stream: code {code}")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """First image of a GIF → {'width', 'height', 'pixels'} with
    pixels as RGB bytes (indices mapped through the color table)."""
    return decode_gif_frames(data, max_frames=1)[0]


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> list:
    """ALL image blocks of a (possibly animated) GIF, in stream order —
    each {'width', 'height', 'pixels'} with palette-mapped RGB bytes.
    Real multi-frame decode: every frame carries its own descriptor
    and may carry a local color table; extensions (GCE, comments,
    NETSCAPE loop) are skipped per the 89a spec. Frame disposal /
    compositing is NOT applied — frames are returned as stored, which
    is exactly what a frame-sampling pipeline wants. `max_frames`
    stops parsing early (the decode_gif fast path)."""
    if not is_gif(data):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("GIF header truncated")

    def byte_at(p: int) -> int:
        # single guarded read: truncated payloads surface as the
        # documented ValueError, never a bare IndexError
        if p >= len(data):
            raise ValueError("GIF data truncated")
        return data[p]

    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_table = b""
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_table = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list = []
    while pos < len(data):
        intro = data[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 1
            while byte_at(pos):
                pos += 1 + data[pos]
            pos += 1
            continue
        if intro != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        interlaced = bool(ipacked & 0x40)
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            table = data[pos : pos + 3 * n]
            pos += 3 * n
        if not table:
            raise ValueError("GIF image with no color table")
        min_code = byte_at(pos)
        pos += 1
        lzw = bytearray()
        while byte_at(pos):
            size = data[pos]
            if pos + 1 + size > len(data):
                raise ValueError("GIF data truncated")
            lzw += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        indices = _lzw_decode(min_code, bytes(lzw))[: iw * ih]
        if len(indices) < iw * ih:
            raise ValueError("GIF pixel data truncated")
        if interlaced:
            # GIF87a 4-pass interlace: rows arrive 0,8,16../4,12../
            # 2,6,10../1,3,5.. — permute delivery order back to
            # display order
            deint = bytearray(iw * ih)
            for j, row in enumerate(_interlace_rows(ih)):
                deint[row * iw : (row + 1) * iw] = indices[
                    j * iw : (j + 1) * iw
                ]
            indices = bytes(deint)
        pixels = bytearray(iw * ih * 3)
        for i, idx in enumerate(indices):
            off = 3 * idx
            if off + 3 > len(table):
                raise ValueError("palette index out of range")
            pixels[3 * i : 3 * i + 3] = table[off : off + 3]
        frames.append({"width": iw, "height": ih, "pixels": bytes(pixels)})
        if max_frames is not None and len(frames) >= max_frames:
            return frames
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


#: deterministic 256-entry palette: index i → (i, 7i mod 256, 13i mod 256)
PALETTE = b"".join(
    bytes((i, (7 * i) % 256, (13 * i) % 256)) for i in range(256)
)


def _interlace_rows(height: int) -> list:
    """Display-row order of the 4 GIF interlace passes."""
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


def _encode_image_block(indices: bytes, width: int, height: int,
                        interlace: bool = False) -> bytes:
    """One image block (descriptor + clear-per-symbol LZW data)."""
    if interlace:
        rows = _interlace_rows(height)
        indices = b"".join(
            indices[r * width : (r + 1) * width] for r in rows
        )
    out = bytearray()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    min_code = 8
    clear, end = 256, 257
    code_size = 9
    out.append(min_code)
    # bit-pack LSB-first: CLEAR, then (index, CLEAR)* ..., END
    codes = [clear]
    for idx in indices:
        codes.append(idx)
        codes.append(clear)
    codes.append(end)
    acc = 0
    nbits = 0
    stream = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(indices: bytes, width: int, height: int,
               interlace: bool = False) -> bytes:
    """Valid GIF89a from 8-bit palette indices (PALETTE color table);
    interlace=True emits the 4-pass row order with the descriptor
    flag set."""
    return encode_gif_animation(
        [indices], width, height, interlace=interlace
    )


def encode_gif_animation(
    frames: list, width: int, height: int, interlace: bool = False
) -> bytes:
    """Valid multi-frame GIF89a: one image block per frame over the
    shared global color table — the real container format the frame
    sampler decodes (spec-valid without GCE/NETSCAPE extensions,
    which the decoder skips when present anyway)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("every frame must be width*height bytes")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # 256-color GCT
    out += PALETTE
    for f in frames:
        out += _encode_image_block(
            bytes(f), width, height, interlace=interlace
        )
    out.append(0x3B)  # trailer
    return bytes(out)
