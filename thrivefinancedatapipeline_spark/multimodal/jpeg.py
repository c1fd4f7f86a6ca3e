"""Baseline JPEG (SOF0) codec on the Python stdlib only.

Fourth real container format after PNG, GIF, and WAV: baseline
sequential grayscale JPEG needs nothing beyond bit twiddling and an
8x8 DCT — all specified in ITU-T T.81 (1992, public). The decoder is a
REAL entropy decoder: Huffman and quantization tables are parsed from
the stream's DHT/DQT segments (never assumed), DC is differentially
decoded, AC is run-length decoded with ZRL/EOB handling, coefficients
are dequantized, de-zigzagged and put through a separable float IDCT
with level shift and clamping.

The color path handles 4:4:4 AND chroma-subsampled layouts (any
sampling factors in {1,2}x{1,2}: 4:2:0 — the most common real-world
JPEG — plus 4:2:2/4:4:0), with interleaved h x v MCUs and
nearest-sample chroma upsampling.

PROGRESSIVE (SOF2) decode is supported end-to-end per ITU-T T.81
Annex G: multi-scan coefficient accumulation with spectral selection
(per-band AC scans with EOB-run coding) AND successive approximation
(DC/AC first + refinement scans, including the correction-bit
protocol for already-nonzero coefficients). `decode_jpeg_color`
routes SOF0 and SOF2 transparently, so every Spark-side image op
(decode kernels, frame_sample, meta) handles progressive web JPEGs
with no plumbing changes. `encode_jpeg_progressive` emits a
libjpeg-style 10-scan script (DC Al=1 → AC bands at Al=2/1 → DC
refine → AC refines to Al=0) so encode→decode pins the scan
machinery bit-compatibly against the baseline path: the SAME
quantized coefficients travel either way, so pixels decode EXACTLY
equal.

RESTART INTERVALS (DRI/RSTm) are supported in every decode path —
baseline gray/color and all progressive scan kinds — with T.81
semantics: byte-align, consume RST(m mod 8), reset DC predictors
(and EOB runs, per scan, in progressive mode); every encoder takes a
``restart_interval`` so the round-trip tests pin that restart
streams decode pixel-identically to their unmarked twins.

Sampling factors cover the FULL T.81 range 1..4 in both decoders
(4:1:1 and the tall/wide exotics included); `encode_jpeg_subsampled`
generalizes the 4:2:0 encoder to any luma pair with 1x1 chroma, and
`encode_jpeg_progressive` accepts the same `luma_factors`.

Remaining scope gates (explicit NotImplementedError, same policy as
interlaced GIF / non-baseline PNG): arithmetic coding and
hierarchical/lossless frames.
Encoders emit grayscale (encode_jpeg), 4:4:4 color
(encode_jpeg_color), 4:2:0 color (encode_jpeg_420) and progressive
(encode_jpeg_progressive) JFIF with the tables embedded in the
stream — and because the decoder reads its tables from the stream,
encode→decode correctness never depends on those constants matching
any external library.

JPEG is lossy by construction (DCT quantization), so unlike PNG/GIF/
WAV there is no bit-exact round trip: tests bound the per-pixel
reconstruction error at high quality and pin dimensions/structure
exactly.
"""

from __future__ import annotations

import math
import struct

JPEG_MAGIC = b"\xff\xd8"

#: zigzag order: index i of the scan -> position in the 8x8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: base luminance quantization table (quality 50), row-major
QUANT_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Huffman table specs embedded by the encoder (bits, values). The
#: decoder NEVER uses these — it parses DHT from the stream.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def is_jpeg(data: bytes) -> bool:
    return data[:2] == JPEG_MAGIC


def _quant_table(quality: int) -> list:
    """libjpeg-style quality scaling of the base table (5000/q below
    50, 200-2q above), clamped to [1, 255]."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [max(1, min(255, (v * scale + 50) // 100)) for v in QUANT_BASE]


def _fdct_block(block: list) -> list:
    """8x8 forward DCT-II (separable would be faster; direct is clear
    and the encoder is test-side only)."""
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[x][u]
                for y in range(8):
                    s += block[x * 8 + y] * cu * _COS[y][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct_block(coef: list) -> list:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[x][u]
                for v in range(8):
                    s += cu * _C[v] * coef[u * 8 + v] * _COS[y][v]
            out[x * 8 + y] = 0.25 * s
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _emit_restart(bw: "_BitWriter", idx: int) -> None:
    """Flush to a byte boundary and append RST(idx % 8) — markers are
    raw bytes, never entropy-stuffed."""
    bw.flush()
    bw.out += bytes((0xFF, 0xD0 + (idx % 8)))


def _dri_segment(restart_interval: int) -> bytes:
    return b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)


def _build_encode_table(bits: list, vals: list) -> dict:
    """symbol -> (code, length) from a DHT-style (bits, values) spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple:
    """JPEG magnitude coding: (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    size = v.bit_length() if v > 0 else (-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def encode_jpeg(pixels: bytes, width: int, height: int,
                quality: int = 90, restart_interval: int = 0) -> bytes:
    """Grayscale baseline JFIF from 8-bit pixels (row-major).
    restart_interval > 0 emits DRI + RSTm markers every that many
    MCUs (predictor reset + byte alignment, T.81 F.1.2.3)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    quant = _quant_table(quality)
    dc_tab = _build_encode_table(DC_BITS, DC_VALS)
    ac_tab = _build_encode_table(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _emit_restart(bw, mcu // restart_interval - 1)
                prev_dc = 0
            mcu += 1
            block = [
                float(
                    pixels[min(by + x, height - 1) * width
                           + min(bx + y, width - 1)]
                ) - 128.0
                for x in range(8)
                for y in range(8)
            ]
            coef = _fdct_block(block)
            q = [
                int(round(coef[ZIGZAG[i]] / quant[ZIGZAG[i]]))
                for i in range(64)
            ]
            diff = q[0] - prev_dc
            prev_dc = q[0]
            size, amp = _magnitude(diff)
            code, ln = dc_tab[size]
            bw.write(code, ln)
            if size:
                bw.write(amp, size)
            run = 0
            last_nz = 0
            for i in range(63, 0, -1):
                if q[i]:
                    last_nz = i
                    break
            for i in range(1, last_nz + 1):
                if q[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                size, amp = _magnitude(q[i])
                code, ln = ac_tab[(run << 4) | size]
                bw.write(code, ln)
                bw.write(amp, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_tab[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density + no thumbnail
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)  # DQT, table 0, 8-bit
    out += bytes(quant[ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += _dri_segment(restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes((1, 0x11, 0))  # component 1, 1x1 sampling, qtable 0
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(DC_VALS), 0x00)
    out += bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(AC_VALS), 0x10)
    out += bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += bytes((1, 0x00))  # component 1: DC table 0, AC table 0
    out += bytes((0, 63, 0))  # spectral selection, approximation
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _build_decode_table(bits: list, vals: list) -> dict:
    """(length, code) -> symbol, parsed from a DHT segment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment reader with 0xFF00 de-stuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif nxt == 0xD9:  # EOI reached while padding — emit 1s
                b = 0xFF
            else:
                raise ValueError(
                    f"JPEG marker 0xff{nxt:02x} inside scan "
                    "(entropy data shorter than the frame demands)"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG Huffman stream")

    def align_restart(self, m: int) -> None:
        """Byte-align and consume the expected RSTm marker (skipping
        pad/stuffing bytes the encoder's flush may have left)."""
        self.acc = 0
        self.n = 0
        p = self.pos
        while p + 1 < len(self.data):
            if self.data[p] == 0xFF and self.data[p + 1] not in (
                0x00, 0xFF,
            ):
                break
            p += 1
        if p + 1 >= len(self.data):
            raise ValueError("JPEG restart marker missing (truncated)")
        if self.data[p + 1] != 0xD0 + m:
            raise ValueError(
                f"expected RST{m}, found 0xff{self.data[p + 1]:02x}"
            )
        self.pos = p + 2


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    if amp < (1 << (size - 1)):
        return amp - (1 << size) + 1
    return amp


def decode_jpeg(data: bytes) -> dict:
    """Baseline grayscale JPEG → {'width', 'height', 'pixels'} (8-bit,
    row-major). Tables come from the stream's own DQT/DHT segments."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("JPEG marker stream truncated")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker misalignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("JPEG contains no scan")
        seglen = struct.unpack_from(">H", data, pos)[0]
        if pos + seglen > len(data):
            raise ValueError("JPEG segment truncated")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                zz = body[b + 1 : b + 65]
                if len(zz) < 64:
                    raise ValueError("DQT truncated")
                tab = [0] * 64
                for i in range(64):
                    tab[ZIGZAG[i]] = zz[i]
                quant[tq] = tab
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                if len(vals) < n:
                    raise ValueError("DHT truncated")
                tab = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp != 1:
                raise NotImplementedError(
                    "multi-component JPEG needs a native codec"
                )
            # per-component bytes follow the 6-byte frame header:
            # id, sampling factors, quant table id
            sampling = body[7]
            if sampling != 0x11:
                raise NotImplementedError("subsampling not supported")
            comp_q = body[8]
        elif marker == 0xC2:  # SOF2 — progressive path
            res = _decode_progressive(data)
            if res["channels"] != 1:
                raise NotImplementedError(
                    "color progressive JPEG: use decode_jpeg_color"
                )
            return {
                "width": res["width"], "height": res["height"],
                "pixels": res["pixels"],
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) / progressive (SOF2) supported"
            )
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if body[0] != 1:
                raise NotImplementedError("multi-component scan")
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0x0F
            pos += seglen
            break
        pos += seglen
    if width is None or height is None:
        raise ValueError("JPEG scan before SOF0")
    if comp_q not in quant or comp_dc not in huff_dc or comp_ac not in huff_ac:
        raise ValueError("JPEG scan references missing tables")
    qt = quant[comp_q]
    dc_t, ac_t = huff_dc[comp_dc], huff_ac[comp_ac]
    br = _BitReader(data, pos)
    bw_blocks = -(-width // 8)
    bh_blocks = -(-height // 8)
    pixels = bytearray(width * height)
    prev_dc = 0
    mcu = 0
    for by in range(bh_blocks):
        for bx in range(bw_blocks):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_restart((mcu // restart_interval - 1) % 8)
                prev_dc = 0
            mcu += 1
            zz = [0] * 64
            size = br.read_symbol(dc_t)
            prev_dc += _extend(br.read_bits(size), size)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = br.read_symbol(ac_t)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        i += 16
                        continue
                    break  # EOB
                i += run
                if i > 63:
                    raise ValueError("corrupt JPEG AC run")
                zz[i] = _extend(br.read_bits(size), size)
                i += 1
            coef = [0.0] * 64
            for i in range(64):
                coef[ZIGZAG[i]] = zz[i] * qt[ZIGZAG[i]]
            block = _idct_block(coef)
            for x in range(8):
                py = by * 8 + x
                if py >= height:
                    break
                row = py * width
                for y in range(8):
                    px = bx * 8 + y
                    if px >= width:
                        break
                    v = int(round(block[x * 8 + y])) + 128
                    pixels[row + px] = 0 if v < 0 else (255 if v > 255 else v)
    return {"width": width, "height": height, "pixels": bytes(pixels)}


# ---------------------------------------------------------------------------
# YCbCr color (SOF0) — the color extension of the baseline codec
# above.  Interleaved MCUs with per-component h x v sampling factors
# (4:4:4, 4:2:2, 4:2:0), separate luminance/chrominance quantization
# and Huffman tables (ITU-T T.81 Annex K constants on the encode
# side; the decoder still parses every table from the stream).
# ---------------------------------------------------------------------------

#: base chrominance quantization table (quality 50), row-major
QUANT_BASE_C = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _quant_table_c(quality: int) -> list:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [max(1, min(255, (v * scale + 50) // 100)) for v in QUANT_BASE_C]


def _rgb_to_ycbcr(pixels: bytes, width: int, height: int) -> tuple:
    y, cb, cr = [], [], []
    for i in range(width * height):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        y.append(0.299 * r + 0.587 * g + 0.114 * b)
        cb.append(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
        cr.append(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    return y, cb, cr


def _encode_block(bw, plane, width, height, bx, by, quant,
                  dc_tab, ac_tab, prev_dc: int) -> int:
    block = [
        float(plane[min(by + x, height - 1) * width
                    + min(bx + y, width - 1)]) - 128.0
        for x in range(8)
        for y in range(8)
    ]
    coef = _fdct_block(block)
    q = [int(round(coef[ZIGZAG[i]] / quant[ZIGZAG[i]])) for i in range(64)]
    diff = q[0] - prev_dc
    size, amp = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(amp, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        size, amp = _magnitude(q[i])
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(amp, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]
        bw.write(code, ln)
    return q[0]


def encode_jpeg_color(pixels: bytes, width: int, height: int,
                      quality: int = 90,
                      restart_interval: int = 0) -> bytes:
    """4:4:4 YCbCr baseline JFIF from interleaved 8-bit RGB."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    qy = _quant_table(quality)
    qc = _quant_table_c(quality)
    dc_y = _build_encode_table(DC_BITS, DC_VALS)
    ac_y = _build_encode_table(AC_BITS, AC_VALS)
    dc_c = _build_encode_table(DC_BITS_C, DC_VALS_C)
    ac_c = _build_encode_table(AC_BITS_C, AC_VALS_C)
    planes = _rgb_to_ycbcr(pixels, width, height)
    tabs = [(qy, dc_y, ac_y), (qc, dc_c, ac_c), (qc, dc_c, ac_c)]
    bw = _BitWriter()
    prev = [0, 0, 0]
    mcu = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _emit_restart(bw, mcu // restart_interval - 1)
                prev = [0, 0, 0]
            mcu += 1
            for ci in range(3):
                q, dt, at = tabs[ci]
                prev[ci] = _encode_block(
                    bw, planes[ci], width, height, bx, by, q, dt, at,
                    prev[ci],
                )
    bw.flush()
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(qy[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 1)
    out += bytes(qc[ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += _dri_segment(restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes((1, 0x11, 0))  # Y: 1x1, qtable 0
    out += bytes((2, 0x11, 1))  # Cb: 1x1, qtable 1
    out += bytes((3, 0x11, 1))  # Cr: 1x1, qtable 1
    for tc_th, bits, vals in (
        (0x00, DC_BITS, DC_VALS), (0x10, AC_BITS, AC_VALS),
        (0x01, DC_BITS_C, DC_VALS_C), (0x11, AC_BITS_C, AC_VALS_C),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), tc_th
        )
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11))
    out += bytes((0, 63, 0))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_block(br, dc_t, ac_t, qt, prev_dc: int) -> tuple:
    """One 8x8 block → (spatial pixels pre-shift, new DC predictor)."""
    zz = [0] * 64
    size = br.read_symbol(dc_t)
    prev_dc += _extend(br.read_bits(size), size)
    zz[0] = prev_dc
    i = 1
    while i < 64:
        rs = br.read_symbol(ac_t)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                i += 16
                continue
            break
        i += run
        if i > 63:
            raise ValueError("corrupt JPEG AC run")
        zz[i] = _extend(br.read_bits(size), size)
        i += 1
    coef = [0.0] * 64
    for i in range(64):
        coef[ZIGZAG[i]] = zz[i] * qt[ZIGZAG[i]]
    return _idct_block(coef), prev_dc


def decode_jpeg_color(data: bytes) -> dict:
    """Baseline 4:4:4 color (or grayscale) JPEG → {'width', 'height',
    'channels', 'pixels'} with interleaved RGB for 3-component
    streams.  Same stream-parsed-tables discipline as decode_jpeg;
    grayscale input returns channels=1 with identical pixels."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    width = height = None
    comps: list = []   # (comp_id, qtable)
    restart_interval = 0
    scan: list = []    # (comp_id, dc_table, ac_table)
    while True:
        if pos + 4 > len(data):
            raise ValueError("JPEG marker stream truncated")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker misalignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("JPEG contains no scan")
        seglen = struct.unpack_from(">H", data, pos)[0]
        if pos + seglen > len(data):
            raise ValueError("JPEG segment truncated")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                zz = body[b + 1 : b + 65]
                if len(zz) < 64:
                    raise ValueError("DQT truncated")
                tab = [0] * 64
                for i in range(64):
                    tab[ZIGZAG[i]] = zz[i]
                quant[tq] = tab
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                if len(vals) < n:
                    raise ValueError("DHT truncated")
                tab = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                b += 17 + n
        elif marker == 0xC0:
            prec, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0
            )
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported"
                )
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                sampling = body[7 + 3 * i]
                sh, sv = sampling >> 4, sampling & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise NotImplementedError(
                        "sampling factors must be 1..4 (T.81)"
                    )
                comps.append((cid, body[8 + 3 * i], sh, sv))
            if ncomp == 1 and comps[0][2:] != (1, 1):
                # a single-component scan is non-interleaved per
                # T.81 — sampling factors would apply differently
                raise NotImplementedError(
                    "subsampled single-component JPEG"
                )
        elif marker == 0xC2:  # SOF2 — progressive path
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) / progressive (SOF2) supported"
            )
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError("partial-component scan")
            for i in range(ns):
                scan.append(
                    (body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0x0F)
                )
            pos += seglen
            break
        pos += seglen
    if width is None or height is None:
        raise ValueError("JPEG scan before SOF0")
    qmap = {cid: (qt, sh, sv) for cid, qt, sh, sv in comps}
    order = []
    for cid, dc_id, ac_id in scan:
        if (cid not in qmap or qmap[cid][0] not in quant
                or dc_id not in huff_dc or ac_id not in huff_ac):
            raise ValueError("JPEG scan references missing tables")
        qt_id, sh, sv = qmap[cid]
        order.append(
            (quant[qt_id], huff_dc[dc_id], huff_ac[ac_id], sh, sv)
        )
    br = _BitReader(data, pos)
    n = len(order)
    hmax = max(e[3] for e in order)
    vmax = max(e[4] for e in order)
    # component plane dims per T.81 A.1.1: ceil(dim * factor / max)
    dims = [
        (-(-width * sh // hmax), -(-height * sv // vmax))
        for _qt, _d, _a, sh, sv in order
    ]
    planes = [bytearray(pw * ph) for pw, ph in dims]
    prev = [0] * n
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_restart((mcu // restart_interval - 1) % 8)
                prev = [0] * n
            mcu += 1
            for ci, (qt, dc_t, ac_t, sh, sv) in enumerate(order):
                pw, ph = dims[ci]
                plane = planes[ci]
                for bv in range(sv):
                    for bh in range(sh):
                        block, prev[ci] = _decode_block(
                            br, dc_t, ac_t, qt, prev[ci]
                        )
                        bx0 = (mx * sh + bh) * 8
                        by0 = (my * sv + bv) * 8
                        for x in range(8):
                            py = by0 + x
                            if py >= ph:
                                break
                            row = py * pw
                            for y in range(8):
                                px = bx0 + y
                                if px >= pw:
                                    break
                                v = int(round(block[x * 8 + y])) + 128
                                plane[row + px] = (
                                    0 if v < 0 else (255 if v > 255 else v)
                                )
    if n == 1:
        return {
            "width": width, "height": height, "channels": 1,
            "pixels": bytes(planes[0]),
        }
    factors = [(sh, sv) for _q, _d, _a, sh, sv in order]
    return {
        "width": width, "height": height, "channels": 3,
        "pixels": _ycbcr_planes_to_rgb(
            planes, dims, factors, width, height, hmax, vmax
        ),
    }


def _ycbcr_planes_to_rgb(planes, dims, factors, width, height,
                         hmax, vmax) -> bytes:
    """Y/Cb/Cr component planes → interleaved RGB bytes, with
    nearest-sample chroma upsample (replication) for subsampled
    layouts — shared by the baseline and progressive decoders."""
    out = bytearray(width * height * 3)
    if hmax == 1 and vmax == 1:
        # 4:4:4 fast path — bit-identical to the pre-subsampling codec
        yp, cbp, crp = planes
        for i in range(width * height):
            yv, cb, cr = yp[i], cbp[i] - 128.0, crp[i] - 128.0
            r = int(round(yv + 1.402 * cr))
            g = int(round(yv - 0.344136 * cb - 0.714136 * cr))
            b = int(round(yv + 1.772 * cb))
            out[3 * i] = 0 if r < 0 else (255 if r > 255 else r)
            out[3 * i + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[3 * i + 2] = 0 if b < 0 else (255 if b > 255 else b)
    else:
        # subsampled chroma: nearest-sample upsample (replication) —
        # chroma sample for (x, y) is at (x*sh//hmax, y*sv//vmax)
        yp, cbp, crp = planes
        (yw, _yh), (cbw, _cbh), (crw, _crh) = dims
        ysh, ysv = factors[0]
        csh, csv = factors[1]
        rsh, rsv = factors[2]
        for yy in range(height):
            for xx in range(width):
                i = yy * width + xx
                yv = yp[(yy * ysv // vmax) * yw + (xx * ysh // hmax)]
                cb = cbp[(yy * csv // vmax) * cbw
                         + (xx * csh // hmax)] - 128.0
                cr = crp[(yy * rsv // vmax) * crw
                         + (xx * rsh // hmax)] - 128.0
                r = int(round(yv + 1.402 * cr))
                g = int(round(yv - 0.344136 * cb - 0.714136 * cr))
                b = int(round(yv + 1.772 * cb))
                out[3 * i] = 0 if r < 0 else (255 if r > 255 else r)
                out[3 * i + 1] = 0 if g < 0 else (255 if g > 255 else g)
                out[3 * i + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return bytes(out)


def encode_jpeg_420(pixels: bytes, width: int, height: int,
                    quality: int = 90,
                    restart_interval: int = 0) -> bytes:
    """4:2:0 YCbCr baseline JFIF from interleaved 8-bit RGB — the
    most common real-world JPEG layout: 16x16 MCUs of four luma
    blocks plus one 8x8 block per chroma plane, chroma downsampled
    2x2 by box average (edge samples duplicated on odd dims)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    qy = _quant_table(quality)
    qc = _quant_table_c(quality)
    dc_y = _build_encode_table(DC_BITS, DC_VALS)
    ac_y = _build_encode_table(AC_BITS, AC_VALS)
    dc_c = _build_encode_table(DC_BITS_C, DC_VALS_C)
    ac_c = _build_encode_table(AC_BITS_C, AC_VALS_C)
    y, cb, cr = _rgb_to_ycbcr(pixels, width, height)
    cw, ch = -(-width // 2), -(-height // 2)
    cbd = [0.0] * (cw * ch)
    crd = [0.0] * (cw * ch)
    for cy in range(ch):
        ys = (2 * cy, min(2 * cy + 1, height - 1))
        for cx in range(cw):
            xs = (2 * cx, min(2 * cx + 1, width - 1))
            cbd[cy * cw + cx] = sum(
                cb[yy * width + xx] for yy in ys for xx in xs
            ) / 4.0
            crd[cy * cw + cx] = sum(
                cr[yy * width + xx] for yy in ys for xx in xs
            ) / 4.0
    bw = _BitWriter()
    prev = [0, 0, 0]
    mcu = 0
    for by in range(0, height, 16):
        for bx in range(0, width, 16):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _emit_restart(bw, mcu // restart_interval - 1)
                prev = [0, 0, 0]
            mcu += 1
            for dy in (0, 8):
                for dx in (0, 8):
                    prev[0] = _encode_block(
                        bw, y, width, height, bx + dx, by + dy,
                        qy, dc_y, ac_y, prev[0],
                    )
            prev[1] = _encode_block(
                bw, cbd, cw, ch, bx // 2, by // 2, qc, dc_c, ac_c,
                prev[1],
            )
            prev[2] = _encode_block(
                bw, crd, cw, ch, bx // 2, by // 2, qc, dc_c, ac_c,
                prev[2],
            )
    bw.flush()
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(qy[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 1)
    out += bytes(qc[ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += _dri_segment(restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes((1, 0x22, 0))  # Y: 2x2, qtable 0
    out += bytes((2, 0x11, 1))  # Cb: 1x1, qtable 1
    out += bytes((3, 0x11, 1))  # Cr: 1x1, qtable 1
    for tc_th, bits, vals in (
        (0x00, DC_BITS, DC_VALS), (0x10, AC_BITS, AC_VALS),
        (0x01, DC_BITS_C, DC_VALS_C), (0x11, AC_BITS_C, AC_VALS_C),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), tc_th
        )
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11))
    out += bytes((0, 63, 0))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) — ITU-T T.81 Annex G.  Multi-scan coefficient
# accumulation: DC first/refinement scans (interleaved or per
# component), AC spectral-selection bands with EOB-run coding, and
# AC successive-approximation refinement with the correction-bit
# protocol for already-nonzero coefficients (the semantics libjpeg's
# jdphuff.c implements from figure G.7).  Coefficients accumulate in
# zigzag space across scans; dequantize + IDCT happen once at EOI.
# ---------------------------------------------------------------------------


def _prog_dc(br, blk, dc_t, Ah, Al, pred: int) -> int:
    """One block's DC in a progressive DC scan: Huffman diff decode
    at point transform Al (first scan) or a single appended magnitude
    bit (refinement)."""
    if Ah == 0:
        size = br.read_symbol(dc_t)
        pred += _extend(br.read_bits(size), size)
        blk[0] = pred << Al
    else:
        if br.read_bit():
            blk[0] |= 1 << Al
    return pred


def _prog_ac_first(br, blk, ac_t, Ss, Se, Al, eobrun: int) -> int:
    """One block's AC band in a FIRST (Ah=0) spectral-selection scan:
    run-length coding with shared EOB runs across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = br.read_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > Se:
            raise ValueError("corrupt progressive AC run")
        blk[k] = _extend(br.read_bits(s), s) << Al
        k += 1
    return eobrun


def _prog_ac_refine(br, blk, ac_t, Ss, Se, Al, eobrun: int) -> int:
    """One block's AC band in a REFINEMENT (Ah>0) scan: newly
    significant coefficients arrive as (run, 1) symbols with a sign
    bit; every already-nonzero coefficient passed over (and every one
    in an EOB-covered tail) consumes one correction bit that may add
    ±2^Al toward its true magnitude."""
    p1 = 1 << Al
    m1 = -1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = br.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            sval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt AC refinement scan")
                sval = p1 if br.read_bit() else m1
            # advance over nonzero-history coefficients (each takes a
            # correction bit) and r zero-history ones; stop AT the
            # target zero-history position
            while k <= Se:
                if blk[k] != 0:
                    if br.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval:
                if k > Se:
                    raise ValueError("corrupt AC refinement position")
                blk[k] = sval
            k += 1
    if eobrun > 0:
        # EOB-covered tail: refine every remaining nonzero coefficient
        while k <= Se:
            if blk[k] != 0:
                if br.read_bit() and not (blk[k] & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(data: bytes) -> dict:
    """Progressive JPEG → {'width','height','channels','pixels'} —
    same output contract (and pixel math) as decode_jpeg_color."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    width = height = None
    comps: list = []      # (cid, tq, sh, sv)
    factors: list = []    # (sh, sv) per component
    dims: list = []       # component plane dims (pw, ph)
    nb: list = []         # non-padded block grid (nbw, nbh)
    bwp: list = []        # MCU-padded block-row width per component
    coefs: list = []      # per comp: padded list of 64-int zz blocks
    qsnap: list = []      # per comp: quant table at first scan use
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    restart_interval = 0
    saw_scan = False
    while True:
        if pos + 2 > len(data):
            raise ValueError("JPEG marker stream truncated")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker misalignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            raise ValueError("stray RST marker between segments")
        if pos + 2 > len(data):
            raise ValueError("JPEG marker stream truncated")
        seglen = struct.unpack_from(">H", data, pos)[0]
        if pos + seglen > len(data):
            raise ValueError("JPEG segment truncated")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                zz = body[b + 1 : b + 65]
                if len(zz) < 64:
                    raise ValueError("DQT truncated")
                tab = [0] * 64
                for i in range(64):
                    tab[ZIGZAG[i]] = zz[i]
                quant[tq] = tab
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                if len(vals) < n:
                    raise ValueError("DHT truncated")
                tab = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                b += 17 + n
        elif marker == 0xC2:
            prec, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0
            )
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported"
                )
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                sampling = body[7 + 3 * i]
                sh, sv = sampling >> 4, sampling & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise NotImplementedError(
                        "sampling factors must be 1..4 (T.81)"
                    )
                comps.append((cid, body[8 + 3 * i], sh, sv))
                factors.append((sh, sv))
            hmax = max(f[0] for f in factors)
            vmax = max(f[1] for f in factors)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for sh, sv in factors:
                pw = -(-width * sh // hmax)
                ph = -(-height * sv // vmax)
                dims.append((pw, ph))
                nb.append((-(-pw // 8), -(-ph // 8)))
                bwp.append(mcus_x * sh)
                coefs.append(
                    [[0] * 64 for _ in range(mcus_x * sh * mcus_y * sv)]
                )
                qsnap.append(None)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("multiple frame headers in progressive JPEG")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if width is None:
                raise ValueError("JPEG scan before SOF2")
            ns = body[0]
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            Ah, Al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            scan = []
            cid_index = {c[0]: i for i, c in enumerate(comps)}
            for i in range(ns):
                cid = body[1 + 2 * i]
                dc_id = body[2 + 2 * i] >> 4
                ac_id = body[2 + 2 * i] & 0x0F
                if cid not in cid_index:
                    raise ValueError("scan references unknown component")
                ci = cid_index[cid]
                dc_t = huff_dc.get(dc_id)
                ac_t = huff_ac.get(ac_id)
                if Ss == 0 and Ah == 0 and dc_t is None:
                    raise ValueError("DC scan references missing table")
                if Ss > 0 and ac_t is None:
                    raise ValueError("AC scan references missing table")
                if qsnap[ci] is None:
                    tq = comps[ci][1]
                    if tq not in quant:
                        raise ValueError("scan references missing DQT")
                    qsnap[ci] = list(quant[tq])
                scan.append((ci, dc_t, ac_t))
            pos = _prog_scan(
                data, pos + seglen, scan, Ss, Se, Ah, Al,
                factors, nb, bwp, coefs, mcus_x, mcus_y,
                restart_interval,
            )
            saw_scan = True
            continue
        pos += seglen
    if width is None or not saw_scan:
        raise ValueError("JPEG contains no scan")
    planes = []
    for ci in range(len(comps)):
        qt = qsnap[ci]
        if qt is None:  # component never scanned: flat gray plane
            qt = [1] * 64
        pw, ph = dims[ci]
        nbw, nbh = nb[ci]
        plane = bytearray(pw * ph)
        for by in range(nbh):
            for bx in range(nbw):
                zz = coefs[ci][by * bwp[ci] + bx]
                coef = [0.0] * 64
                for i in range(64):
                    coef[ZIGZAG[i]] = zz[i] * qt[ZIGZAG[i]]
                block = _idct_block(coef)
                for x in range(8):
                    py = by * 8 + x
                    if py >= ph:
                        break
                    row = py * pw
                    for y in range(8):
                        px = bx * 8 + y
                        if px >= pw:
                            break
                        v = int(round(block[x * 8 + y])) + 128
                        plane[row + px] = (
                            0 if v < 0 else (255 if v > 255 else v)
                        )
        planes.append(plane)
    if len(comps) == 1:
        return {
            "width": width, "height": height, "channels": 1,
            "pixels": bytes(planes[0]),
        }
    return {
        "width": width, "height": height, "channels": 3,
        "pixels": _ycbcr_planes_to_rgb(
            planes, dims, factors, width, height, hmax, vmax
        ),
    }


def _prog_scan(data, pos, scan, Ss, Se, Ah, Al,
               factors, nb, bwp, coefs, mcus_x, mcus_y,
               restart_interval: int = 0) -> int:
    """Decode one progressive scan's entropy segment; returns the
    stream position of the next marker (resynced past pad bits).
    Restart intervals count MCUs (a single data unit per MCU in a
    non-interleaved scan); each RSTm resets the DC predictors AND
    the EOB run, per T.81."""
    br = _BitReader(data, pos)
    rst = {"unit": 0, "m": 0}

    def at_restart() -> bool:
        """Consume an expected RSTm at an interval boundary; True if
        a restart happened (caller resets its predictors/EOB run)."""
        hit = (
            restart_interval
            and rst["unit"]
            and rst["unit"] % restart_interval == 0
        )
        if hit:
            br.align_restart(rst["m"] % 8)
            rst["m"] += 1
        rst["unit"] += 1
        return bool(hit)

    if Ss == 0:
        if Se != 0:
            raise ValueError(
                "progressive scan mixes DC and AC coefficients"
            )
        preds = [0] * len(scan)
        if len(scan) > 1:
            # interleaved DC scan: MCU order, sh x sv blocks per comp
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if at_restart():
                        preds = [0] * len(scan)
                    for si, (ci, dc_t, _a) in enumerate(scan):
                        sh, sv = factors[ci]
                        for bv in range(sv):
                            for bh in range(sh):
                                blk = coefs[ci][
                                    (my * sv + bv) * bwp[ci]
                                    + mx * sh + bh
                                ]
                                preds[si] = _prog_dc(
                                    br, blk, dc_t, Ah, Al, preds[si]
                                )
        else:
            ci, dc_t, _a = scan[0]
            nbw, nbh = nb[ci]
            for by in range(nbh):
                for bx in range(nbw):
                    if at_restart():
                        preds = [0]
                    blk = coefs[ci][by * bwp[ci] + bx]
                    preds[0] = _prog_dc(br, blk, dc_t, Ah, Al, preds[0])
    else:
        if len(scan) != 1:
            raise ValueError(
                "progressive AC scan must be single-component"
            )
        if not (Ss <= Se <= 63):
            raise ValueError("bad spectral selection band")
        ci, _d, ac_t = scan[0]
        nbw, nbh = nb[ci]
        eobrun = 0
        for by in range(nbh):
            for bx in range(nbw):
                if at_restart():
                    eobrun = 0
                blk = coefs[ci][by * bwp[ci] + bx]
                if Ah == 0:
                    eobrun = _prog_ac_first(
                        br, blk, ac_t, Ss, Se, Al, eobrun
                    )
                else:
                    eobrun = _prog_ac_refine(
                        br, blk, ac_t, Ss, Se, Al, eobrun
                    )
    # resync: the next marker is FF + non-stuffing, non-fill byte
    p = max(2, br.pos - 1)
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
            return p
        p += 1
    raise ValueError("JPEG entropy data truncated")


# ---------------------------------------------------------------------------
# Progressive encoder — a libjpeg-style scan script (DC first at Al=1,
# AC spectral bands at Al=2/1, then DC + AC refinement scans down to
# Al=0) so the decoder's every Annex-G code path is exercised by our
# own streams.  Because all coefficient bits are transmitted across
# the scans, a progressive encode of the SAME quantized coefficients
# decodes to pixels EXACTLY equal to the baseline encode — the
# bit-compatibility tests pin that.
# ---------------------------------------------------------------------------

#: flat Huffman specs for progressive scans: every DC size category as
#: a 4-bit code, every (run, size) AC symbol — including the EOBn
#: symbols 0x10..0xE0 that baseline tables lack — as an 8-bit code.
#: Valid canonical tables (Kraft sums 12/16 and 176/256), deliberately
#: non-optimal: the tests care about scan semantics, not compression.
PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_VALS = list(range(12))
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _fdct_quant_zz(plane, pw: int, ph: int, bx: int, by: int,
                   quant: list) -> list:
    """One 8x8 block (edge-clamped sampling) → quantized coefficients
    in zigzag order — the shared front half of every encoder."""
    block = [
        float(plane[min(by + x, ph - 1) * pw + min(bx + y, pw - 1)])
        - 128.0
        for x in range(8)
        for y in range(8)
    ]
    coef = _fdct_block(block)
    return [
        int(round(coef[ZIGZAG[i]] / quant[ZIGZAG[i]])) for i in range(64)
    ]


def _enc_ac_first(bw, blocks, ac_tab, Ss, Se, Al,
                  restart_interval: int = 0) -> None:
    """AC first scan (Ah=0): run-length code the point-transformed
    band, folding trailing zeros into shared EOB runs (never across a
    restart boundary)."""
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_tab[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            emit_eobrun()
            _emit_restart(bw, bi // restart_interval - 1)
        r = 0
        for k in range(Ss, Se + 1):
            v = blk[k]
            t = (v if v >= 0 else -v) >> Al
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
            size = t.bit_length()
            amp = t if v > 0 else (1 << size) - 1 - t
            code, ln = ac_tab[(r << 4) | size]
            bw.write(code, ln)
            bw.write(amp, size)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _enc_ac_refine(bw, blocks, ac_tab, Ss, Se, Al,
                   restart_interval: int = 0) -> None:
    """AC refinement scan (Ah=Al+1): newly significant coefficients
    as (run, 1) + sign, correction bits for already-nonzero ones
    buffered and flushed with the symbol (or EOB run) that the
    decoder will be walking when it reads them — the figure G.7
    protocol as implemented by libjpeg's jcphuff."""
    eobrun = 0
    be_bits: list = []  # correction bits belonging to the pending EOB run

    def emit_eobrun():
        nonlocal eobrun, be_bits
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_tab[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
        for bit in be_bits:
            bw.write(bit, 1)
        be_bits = []

    for bi, blk in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            emit_eobrun()
            _emit_restart(bw, bi // restart_interval - 1)
        absv = [0] * 64
        eob_idx = Ss - 1
        for k in range(Ss, Se + 1):
            t = (blk[k] if blk[k] >= 0 else -blk[k]) >> Al
            absv[k] = t
            if t == 1:
                eob_idx = k  # last newly-significant coefficient
        r = 0
        br_bits: list = []  # correction bits since the last symbol
        for k in range(Ss, Se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_idx:
                emit_eobrun()
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                r -= 16
                for bit in br_bits:
                    bw.write(bit, 1)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            emit_eobrun()
            code, ln = ac_tab[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if blk[k] > 0 else 0, 1)
            for bit in br_bits:
                bw.write(bit, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _prog_scan_script(ncomp: int) -> list:
    """(components, Ss, Se, Ah, Al) per scan — the classic libjpeg
    progressive script shape."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def encode_jpeg_progressive(pixels: bytes, width: int, height: int,
                            quality: int = 90, channels: int = 3,
                            subsample_420: bool = False,
                            restart_interval: int = 0,
                            luma_factors: tuple | None = None) -> bytes:
    """Progressive (SOF2) JFIF: grayscale (channels=1), 4:4:4 color,
    4:2:0 color (subsample_420=True), or any luma sampling pair in
    1..4 x 1..4 via luma_factors (chroma stays 1x1) from 8-bit
    pixels. restart_interval > 0 emits RSTm markers every that many
    data units in EVERY scan (DC predictors and EOB runs reset —
    T.81 restart semantics apply per scan in progressive mode)."""
    if subsample_420 and luma_factors is not None:
        raise ValueError("pass subsample_420 OR luma_factors, not both")
    if subsample_420:
        luma_factors = (2, 2)
    if channels == 1:
        if len(pixels) != width * height:
            raise ValueError("pixels must be width*height bytes")
        if luma_factors not in (None, (1, 1)):
            raise ValueError("grayscale has no chroma to subsample")
        planes: list = [pixels]
        factors = [(1, 1)]
        comp_q = [_quant_table(quality)]
        qids = [0]
    elif channels == 3:
        if len(pixels) != width * height * 3:
            raise ValueError("pixels must be width*height*3 bytes")
        y, cb, cr = _rgb_to_ycbcr(pixels, width, height)
        qy, qc = _quant_table(quality), _quant_table_c(quality)
        if luma_factors is not None and luma_factors != (1, 1):
            sh, sv = luma_factors
            if not (1 <= sh <= 4 and 1 <= sv <= 4):
                raise ValueError("luma factors must be 1..4")
            cbd, _cw, _ch = _box_downsample(cb, width, height, sh, sv)
            crd, _cw, _ch = _box_downsample(cr, width, height, sh, sv)
            planes = [y, cbd, crd]
            factors = [(sh, sv), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        comp_q = [qy, qc, qc]
        qids = [0, 1, 1]
    else:
        raise ValueError("channels must be 1 or 3")
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    dims = []
    nb = []
    bwp = []
    coefs = []
    for ci, (sh, sv) in enumerate(factors):
        pw = -(-width * sh // hmax)
        ph = -(-height * sv // vmax)
        dims.append((pw, ph))
        nb.append((-(-pw // 8), -(-ph // 8)))
        bwp.append(mcus_x * sh)
        grid = []
        for by in range(mcus_y * sv):
            for bx in range(mcus_x * sh):
                grid.append(
                    _fdct_quant_zz(
                        planes[ci], pw, ph, bx * 8, by * 8, comp_q[ci]
                    )
                )
        coefs.append(grid)

    dc_tab = _build_encode_table(PROG_DC_BITS, PROG_DC_VALS)
    ac_tab = _build_encode_table(PROG_AC_BITS, PROG_AC_VALS)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(comp_q[0][ZIGZAG[i]] for i in range(64))
    if ncomp == 3:
        out += b"\xff\xdb" + struct.pack(">HB", 67, 1)
        out += bytes(comp_q[1][ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += _dri_segment(restart_interval)
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    )
    for ci in range(ncomp):
        sh, sv = factors[ci]
        out += bytes((ci + 1, (sh << 4) | sv, qids[ci]))
    for tc_th, bits, vals in (
        (0x00, PROG_DC_BITS, PROG_DC_VALS),
        (0x10, PROG_AC_BITS, PROG_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    for comps_s, Ss, Se, Ah, Al in _prog_scan_script(ncomp):
        bw = _BitWriter()
        if Ss == 0:
            preds = [0] * len(comps_s)
            if len(comps_s) > 1:
                mcu = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if (restart_interval and mcu
                                and mcu % restart_interval == 0):
                            _emit_restart(
                                bw, mcu // restart_interval - 1
                            )
                            preds = [0] * len(comps_s)
                        mcu += 1
                        for si, ci in enumerate(comps_s):
                            sh, sv = factors[ci]
                            for bv in range(sv):
                                for bh in range(sh):
                                    blk = coefs[ci][
                                        (my * sv + bv) * bwp[ci]
                                        + mx * sh + bh
                                    ]
                                    v = blk[0] >> Al
                                    if Ah == 0:
                                        size, amp = _magnitude(
                                            v - preds[si]
                                        )
                                        preds[si] = v
                                        code, ln = dc_tab[size]
                                        bw.write(code, ln)
                                        if size:
                                            bw.write(amp, size)
                                    else:
                                        bw.write(v & 1, 1)
            else:
                ci = comps_s[0]
                nbw, nbh = nb[ci]
                unit = 0
                for by in range(nbh):
                    for bx in range(nbw):
                        if (restart_interval and unit
                                and unit % restart_interval == 0):
                            _emit_restart(
                                bw, unit // restart_interval - 1
                            )
                            preds = [0]
                        unit += 1
                        blk = coefs[ci][by * bwp[ci] + bx]
                        v = blk[0] >> Al
                        if Ah == 0:
                            size, amp = _magnitude(v - preds[0])
                            preds[0] = v
                            code, ln = dc_tab[size]
                            bw.write(code, ln)
                            if size:
                                bw.write(amp, size)
                        else:
                            bw.write(v & 1, 1)
        else:
            ci = comps_s[0]
            nbw, nbh = nb[ci]
            blocks = [
                coefs[ci][by * bwp[ci] + bx]
                for by in range(nbh)
                for bx in range(nbw)
            ]
            if Ah == 0:
                _enc_ac_first(bw, blocks, ac_tab, Ss, Se, Al,
                              restart_interval)
            else:
                _enc_ac_refine(bw, blocks, ac_tab, Ss, Se, Al,
                               restart_interval)
        bw.flush()
        ns = len(comps_s)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comps_s:
            out += bytes((ci + 1, 0x00))
        out += bytes((Ss, Se, (Ah << 4) | Al))
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _box_downsample(plane: list, width: int, height: int,
                    sh: int, sv: int) -> tuple:
    """Chroma plane box-averaged by (sh x sv) with edge clamping —
    the generic form of encode_jpeg_420's 2x2 average."""
    cw, ch = -(-width // sh), -(-height // sv)
    out = [0.0] * (cw * ch)
    for cy in range(ch):
        ys = [min(cy * sv + i, height - 1) for i in range(sv)]
        for cx in range(cw):
            xs = [min(cx * sh + i, width - 1) for i in range(sh)]
            out[cy * cw + cx] = sum(
                plane[yy * width + xx] for yy in ys for xx in xs
            ) / float(sh * sv)
    return out, cw, ch


def encode_jpeg_subsampled(pixels: bytes, width: int, height: int,
                           quality: int = 90,
                           luma_factors: tuple = (2, 2),
                           restart_interval: int = 0) -> bytes:
    """Baseline YCbCr JFIF with an ARBITRARY luma sampling pair in
    1..4 x 1..4 and 1x1 chroma — generalizes encode_jpeg_420 ((2,2))
    to the whole T.81 family: (4,1) = 4:1:1 (DV/camera streams),
    (1,2)/(2,1) = 4:4:0 / 4:2:2, (4,2)/(2,4)/(4,4) the tall/wide
    exotics. MCUs carry sh x sv luma blocks + one block per chroma
    plane; chroma is box-averaged sh x sv."""
    sh, sv = luma_factors
    if not (1 <= sh <= 4 and 1 <= sv <= 4):
        raise ValueError("luma factors must be 1..4")
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    qy = _quant_table(quality)
    qc = _quant_table_c(quality)
    dc_y = _build_encode_table(DC_BITS, DC_VALS)
    ac_y = _build_encode_table(AC_BITS, AC_VALS)
    dc_c = _build_encode_table(DC_BITS_C, DC_VALS_C)
    ac_c = _build_encode_table(AC_BITS_C, AC_VALS_C)
    y, cb, cr = _rgb_to_ycbcr(pixels, width, height)
    cbd, cw, ch = _box_downsample(cb, width, height, sh, sv)
    crd, _cw, _ch = _box_downsample(cr, width, height, sh, sv)
    bw = _BitWriter()
    prev = [0, 0, 0]
    mcu = 0
    for by in range(0, height, 8 * sv):
        for bx in range(0, width, 8 * sh):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _emit_restart(bw, mcu // restart_interval - 1)
                prev = [0, 0, 0]
            mcu += 1
            for bv in range(sv):
                for bh in range(sh):
                    prev[0] = _encode_block(
                        bw, y, width, height,
                        bx + 8 * bh, by + 8 * bv,
                        qy, dc_y, ac_y, prev[0],
                    )
            prev[1] = _encode_block(
                bw, cbd, cw, ch, bx // sh, by // sv, qc, dc_c, ac_c,
                prev[1],
            )
            prev[2] = _encode_block(
                bw, crd, cw, ch, bx // sh, by // sv, qc, dc_c, ac_c,
                prev[2],
            )
    bw.flush()
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(qy[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 1)
    out += bytes(qc[ZIGZAG[i]] for i in range(64))
    if restart_interval:
        out += _dri_segment(restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes((1, (sh << 4) | sv, 0))
    out += bytes((2, 0x11, 1))
    out += bytes((3, 0x11, 1))
    for tc_th, bits, vals in (
        (0x00, DC_BITS, DC_VALS), (0x10, AC_BITS, AC_VALS),
        (0x01, DC_BITS_C, DC_VALS_C), (0x11, AC_BITS_C, AC_VALS_C),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), tc_th
        )
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11))
    out += bytes((0, 63, 0))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
