"""PNG codec on the Python stdlib only (zlib + struct).

The container has no PIL/imageio, but PNG (8-bit, grayscale / RGB /
gray+alpha / RGBA) needs nothing beyond zlib inflate and the five
scanline filters from the PNG spec (RFC 2083 section 6): None, Sub,
Up, Average, Paeth.

r7 extensions: ADAM7 INTERLACED streams decode for real (seven
sub-images, each independently filtered, scattered on the
(x0,y0,dx,dy) pass grid — the progressive-rendering layout a web
crawl contains), and PALETTE (color type 3) streams decode through
their PLTE chunk to interleaved RGB. The encoder can emit both
(interlace=True, encode_png_palette), so round-trips pin every
reconstruction branch bit-exactly (PNG is lossless) — at depths
1/2/4/8/16 (sub-byte rows defilter packed per RFC 2083's
round-up-bpp rule), and palette tRNS transparency expands to RGBA
(per-index alpha, opaque past the table). r8: color-key tRNS on
gray/RGB streams (the 2-byte-per-sample key compare of RFC 2083
section 4.2.1.1) expands to GA/RGBA at the stream's own sample
width; the encoder emits the key chunk too, so equality round trips
pin the compare at every depth x interlace combination.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_MAGIC


#: Adam7 pass grid: (x0, y0, dx, dy) per pass
ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


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

    `pixels` is the raw scanline-major bytes (width*channels per row;
    2 bytes per sample at depth 16). Raises NotImplementedError for
    PNG features outside the supported subset and ValueError for
    corrupt streams — callers keep the explicit
    not-a-codec-for-this gate.
    """
    if not is_png(data):
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = None
    channels = 0
    interlace_flag = 0
    palette = None
    trns = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("corrupt PNG: IHDR truncated")
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            ok8 = bit_depth == 8 and (
                color_type in _CHANNELS or color_type == 3
            )
            ok16 = bit_depth == 16 and color_type in _CHANNELS
            oksub = bit_depth in (1, 2, 4) and color_type in (0, 3)
            if not (ok8 or ok16 or oksub):
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "outside the supported subset (1/2/4/8/16-bit "
                    "gray, 8/16-bit RGB/GA/RGBA, 1/2/4/8-bit palette)"
                )
            if interlace not in (0, 1):
                raise ValueError("invalid PNG interlace method")
            interlace_flag = interlace
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            channels = 1 if color_type == 3 else _CHANNELS[color_type]
            sample_bytes = max(1, bit_depth // 8)
            depth = bit_depth
        elif ctype == b"PLTE":
            if length % 3 != 0 or length == 0 or length > 768:
                raise ValueError("invalid PLTE length")
            palette = bytes(body)
        elif ctype == b"tRNS":
            trns = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    if color_type != 3:
        palette = None
        if trns is not None:
            # color-key tRNS: one 2-byte field per sample (gray: 2
            # bytes, RGB: 6); illegal on streams with a real alpha
            # channel
            if color_type in (4, 6):
                raise ValueError("tRNS forbidden on alpha color types")
            if len(trns) != 2 * _CHANNELS[color_type]:
                raise ValueError("invalid tRNS length")
    elif trns is not None and len(trns) > 256:
        raise ValueError("invalid tRNS length")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # contract: corrupt payloads raise the documented ValueError,
        # never a bare zlib.error leaking from inflate
        raise ValueError(f"corrupt PNG stream: {e}") from e

    def sub_image(off, pw, ph):
        """Defilter (and, below 8 bits, unpack) one (sub-)image;
        returns (byte-channel pixels, bytes consumed). Filters
        operate on BYTES with bpp = channels * bytes-per-sample,
        which RFC 2083 rounds UP to one byte at sub-byte depths — so
        sub-byte rows defilter as packed bytes with channels=1, then
        unpack MSB-first."""
        if depth >= 8:
            bch = channels * sample_bytes
            return (
                _defilter(raw, off, pw, ph, bch),
                (pw * bch + 1) * ph,
            )
        rb = (pw * depth + 7) // 8  # packed bytes per scanline
        packed = _defilter(raw, off, rb, ph, 1)
        outp = bytearray(pw * ph)
        mask = (1 << depth) - 1
        for j in range(ph):
            base = j * rb
            for i in range(pw):
                byte = packed[base + (i * depth) // 8]
                shift = 8 - depth - ((i * depth) % 8)
                outp[j * pw + i] = (byte >> shift) & mask
        return outp, (rb + 1) * ph

    bch = channels * sample_bytes
    if interlace_flag == 0:
        out, consumed = sub_image(0, width, height)
        if consumed != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    else:
        # Adam7: seven independently-filtered sub-images scattered on
        # the pass grid (empty passes contribute zero bytes)
        out = bytearray(width * height * bch)
        off = 0
        for x0, y0, dx, dy in ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub, consumed = sub_image(off, pw, ph)
            off += consumed
            for j in range(ph):
                for i in range(pw):
                    src = (j * pw + i) * bch
                    dst = ((y0 + j * dy) * width + (x0 + i * dx)) * bch
                    out[dst : dst + bch] = sub[src : src + bch]
        if off != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
    if depth < 8 and palette is None:
        # sub-byte grayscale: scale to the 8-bit range per the spec
        # (v * 255 / (2^d - 1), exact for d in {1,2,4})
        mx = (1 << depth) - 1
        out = bytearray(v * 255 // mx for v in out)
    if palette is not None:
        # tRNS present -> RGBA (per-index alpha, default opaque for
        # indices past the table — emitting the alpha is the CORRECT
        # answer, not a gate); absent -> RGB
        n_entries = len(palette) // 3
        if trns is not None:
            rgba = bytearray(width * height * 4)
            for i, idx in enumerate(out):
                if idx >= n_entries:
                    raise ValueError("PNG palette index out of range")
                rgba[4 * i : 4 * i + 3] = palette[3 * idx : 3 * idx + 3]
                rgba[4 * i + 3] = trns[idx] if idx < len(trns) else 255
            out = rgba
            channels = 4
        else:
            rgb = bytearray(width * height * 3)
            for i, idx in enumerate(out):
                if idx >= n_entries:
                    raise ValueError("PNG palette index out of range")
                rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
            out = rgb
            channels = 3
    if palette is None and trns is not None:
        # color-key transparency (RFC 2083 section 4.2.1.1): pixels
        # whose samples ALL equal the key become fully transparent,
        # everything else opaque; alpha is appended at the stream's
        # own sample width (gray -> GA, RGB -> RGBA). The key is
        # stored as 16-bit fields with the value in the LOW bits at
        # depth < 16; sub-byte samples were scaled to 8-bit above, so
        # the key scales through the same injective map before the
        # compare.
        nsamp = _CHANNELS[color_type]
        key = [
            struct.unpack(">H", trns[2 * i : 2 * i + 2])[0]
            for i in range(nsamp)
        ]
        if depth == 16:
            keyb: bytes | None = b"".join(
                struct.pack(">H", k) for k in key
            )
            px = 2 * nsamp
            opaque, clear = b"\xff\xff", b"\x00\x00"
        else:
            mx = (1 << depth) - 1
            if any(k > mx for k in key):
                keyb = None  # out-of-range key matches nothing
            elif depth < 8:
                keyb = bytes(k * 255 // mx for k in key)
            else:
                keyb = bytes(key)
            px = nsamp
            opaque, clear = b"\xff", b"\x00"
        aw = len(opaque)
        step = px + aw
        res = bytearray(width * height * step)
        for i in range(width * height):
            s = bytes(out[i * px : (i + 1) * px])
            res[i * step : i * step + px] = s
            res[i * step + px : (i + 1) * step] = (
                clear if s == keyb else opaque
            )
        out = res
        channels = nsamp + 1
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": depth,
        "pixels": bytes(out),
    }


def _defilter(raw: bytes, off: int, width: int, height: int,
              channels: int) -> bytearray:
    """Reconstruct one independently-filtered (sub-)image: `height`
    scanlines of `width*channels` bytes each, preceded by a filter
    byte, starting at `off` in the inflated stream. `channels` is
    BYTE-channels (samples x bytes-per-sample): at 16-bit depth the
    filter distance bpp doubles per RFC 2083."""
    stride = width * channels
    if off + (stride + 1) * height > len(raw):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        o = off + y * (stride + 1)
        ftype = raw[o]
        line = bytearray(raw[o + 1 : o + 1 + stride])
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
    return out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_image(pixels: bytes, width: int, height: int,
                  channels: int, filter_type: int) -> bytearray:
    """Apply one filter type to every scanline of an image (the
    inverse of _defilter for a single independently-filtered
    (sub-)image)."""
    stride = width * channels
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
    return raw


def _pack_rows(samples: bytes, width: int, height: int,
               depth: int) -> bytes:
    """Pack one sample-per-pixel rows into MSB-first sub-byte rows
    (each scanline padded to a byte boundary)."""
    out = bytearray()
    for y in range(height):
        acc = 0
        n = 0
        for x in range(width):
            acc = (acc << depth) | (
                samples[y * width + x] & ((1 << depth) - 1)
            )
            n += depth
            if n == 8:
                out.append(acc)
                acc = 0
                n = 0
        if n:
            out.append(acc << (8 - n))
    return bytes(out)


def _encode_idat(samples: bytes, width: int, height: int,
                 channels: int, depth: int, filter_type: int,
                 interlace: bool) -> bytes:
    """Filtered (and possibly Adam7-split / bit-packed) image data
    for any supported depth — shared by encode_png and
    encode_png_palette."""
    def one(sub: bytes, pw: int, ph: int) -> bytearray:
        if depth >= 8:
            return _filter_image(sub, pw, ph, channels, filter_type)
        rb = (pw * depth + 7) // 8
        return _filter_image(
            _pack_rows(sub, pw, ph, depth), rb, ph, 1, filter_type
        )

    bch = channels  # sample-channels; sub-byte implies channels == 1
    if not interlace:
        return bytes(one(samples, width, height))
    raw = bytearray()
    for x0, y0, dx, dy in ADAM7:
        pw = -(-(width - x0) // dx) if width > x0 else 0
        ph = -(-(height - y0) // dy) if height > y0 else 0
        if pw == 0 or ph == 0:
            continue
        sub = bytearray(pw * ph * bch)
        for j in range(ph):
            for i in range(pw):
                src = ((y0 + j * dy) * width + (x0 + i * dx)) * bch
                dst = (j * pw + i) * bch
                sub[dst : dst + bch] = samples[src : src + bch]
        raw += one(bytes(sub), pw, ph)
    return bytes(raw)


def _trns_chunk(
    trns, color_type: int, bit_depth: int
) -> bytes:
    """Validate + serialize a color-key for gray/RGB streams: an int
    (gray) or an (r, g, b) tuple, each sample in [0, 2^depth)."""
    if trns is None:
        return b""
    if color_type == 0:
        key = (int(trns),)
    elif color_type == 2:
        key = tuple(int(v) for v in trns)
        if len(key) != 3:
            raise ValueError("RGB color-key needs 3 samples")
    else:
        raise ValueError("color-key tRNS is gray/RGB-only")
    if any(not (0 <= v < (1 << bit_depth)) for v in key):
        raise ValueError("color-key sample exceeds bit depth")
    return _chunk(
        b"tRNS", b"".join(struct.pack(">H", v) for v in key)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 2,
    filter_type: int = 0,
    interlace: bool = False,
    bit_depth: int = 8,
    trns=None,
) -> bytes:
    """Encode raw 8-bit pixels as a valid PNG. `filter_type` applies
    the chosen scanline filter to EVERY row (0..4) — the test hook
    that makes the decoder walk each reconstruction branch.
    `interlace=True` emits the Adam7 layout: seven sub-images, each
    independently filtered. `bit_depth=16` takes big-endian 2-byte
    samples (pixels buffer doubles); 1/2/4 (grayscale only) take one
    sample value per pixel in [0, 2^d). `trns` emits a color-key
    transparency chunk (gray: int, RGB: (r, g, b) tuple, samples in
    the depth's range) — the decoder expands matches to alpha 0."""
    tchunk = _trns_chunk(trns, color_type, bit_depth)
    if bit_depth in (1, 2, 4):
        if color_type != 0:
            raise ValueError("sub-byte depth is grayscale-only here")
        if len(pixels) != width * height:
            raise ValueError("pixel buffer does not match dimensions")
        if any(v >= (1 << bit_depth) for v in pixels):
            raise ValueError("sample exceeds bit depth")
        raw = _encode_idat(
            pixels, width, height, 1, bit_depth, filter_type, interlace
        )
        ihdr = struct.pack(
            ">IIBBBBB", width, height, bit_depth, 0, 0, 0,
            1 if interlace else 0,
        )
        return (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + tchunk
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b"")
        )
    if bit_depth not in (8, 16):
        raise ValueError("bit_depth must be 1, 2, 4, 8 or 16")
    channels = _CHANNELS[color_type] * (bit_depth // 8)
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub = bytearray(pw * ph * channels)
            for j in range(ph):
                for i in range(pw):
                    src = ((y0 + j * dy) * width + (x0 + i * dx)) * channels
                    dst = (j * pw + i) * channels
                    sub[dst : dst + channels] = pixels[
                        src : src + channels
                    ]
            raw += _filter_image(bytes(sub), pw, ph, channels, filter_type)
        ihdr = struct.pack(
            ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 1
        )
        return (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + tchunk
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b"")
        )
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
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + tchunk
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: bytes, width: int, height: int, palette: bytes,
    filter_type: int = 0, bit_depth: int = 8,
    interlace: bool = False, trns: bytes | None = None,
) -> bytes:
    """Encode palette indices + an RGB palette (<= 256 entries) as a
    color-type-3 PNG at depth 1/2/4/8 (indices must fit the depth)."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    if len(palette) % 3 != 0 or not (3 <= len(palette) <= 768):
        raise ValueError("palette must be 1..256 RGB triples")
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError("palette bit_depth must be 1, 2, 4 or 8")
    n = len(palette) // 3
    if any(i >= n or i >= (1 << bit_depth) for i in indices):
        raise ValueError("palette index out of range")
    raw = _encode_idat(
        indices, width, height, 1, bit_depth, filter_type, interlace
    )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, 3, 0, 0,
        1 if interlace else 0,
    )
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette)
    if trns is not None:
        if len(trns) > n:
            raise ValueError("tRNS longer than the palette")
        out += _chunk(b"tRNS", trns)
    return (
        out
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
