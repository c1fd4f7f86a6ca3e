"""BMP + netpbm codecs: equality round trips (including the
representation-only variants — ascii vs binary PNM, bottom-up vs
top-down BMP — pinned pixel-EXACT per the codec-parity principle),
error surfaces, and the real decode path through the Spark kernel."""

import hashlib
import struct

import pytest

from thrivefinancedatapipeline_spark.multimodal import bmp, pnm


def _pix(n, seed="px"):
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


# ---------------------------------------------------------------- PNM

def test_pnm_binary_roundtrip_gray_and_rgb():
    for ch in (1, 3):
        for w, h in [(1, 1), (5, 3), (16, 7)]:
            px = _pix(w * h * ch)
            data = pnm.encode_pnm(px, w, h, channels=ch)
            img = pnm.decode_pnm(data)
            assert (img["width"], img["height"]) == (w, h)
            assert img["channels"] == ch and img["maxval"] == 255
            assert img["pixels"] == px


def test_pnm_ascii_equals_binary_pixels():
    """Ascii and binary rasters are the SAME samples re-represented:
    decodes must be byte-identical (the interlace/progressive rule)."""
    for ch in (1, 3):
        px = _pix(9 * 4 * ch)
        b = pnm.decode_pnm(pnm.encode_pnm(px, 9, 4, channels=ch))
        a = pnm.decode_pnm(
            pnm.encode_pnm(px, 9, 4, channels=ch, ascii_form=True)
        )
        assert a == b


def test_pnm_16bit_roundtrip_and_comment_tolerance():
    samples = [0, 1, 255, 256, 65535, 40000]
    px = struct.pack(">6H", *samples)
    data = pnm.encode_pnm(px, 3, 2, channels=1, maxval=65535)
    img = pnm.decode_pnm(data)
    assert img["maxval"] == 65535 and img["pixels"] == px
    # header comments are legal anywhere between tokens
    commented = b"P5\n# a comment\n3 # w\n2\n# more\n65535\n" + px
    assert pnm.decode_pnm(commented)["pixels"] == px


def test_pnm_error_surface_and_gates():
    px = _pix(12)
    good = pnm.encode_pnm(px, 4, 3, channels=1)
    with pytest.raises(ValueError):
        pnm.decode_pnm(b"XX no pnm")
    with pytest.raises(ValueError):
        pnm.decode_pnm(good[:-3])  # truncated raster
    with pytest.raises(ValueError):
        pnm.decode_pnm(b"P5\n0 3\n255\n")  # zero width
    with pytest.raises(ValueError):
        # ascii sample above maxval
        pnm.decode_pnm(b"P2\n2 1\n10\n5 11\n")
    with pytest.raises(ValueError):
        # PAM decodes for real since r11 — a header cut off before
        # ENDHDR is CORRUPT, not a gate
        pnm.decode_pnm(b"P7\nWIDTH 4\n")
    with pytest.raises(ValueError):
        pnm.encode_pnm(px, 5, 3, channels=1)  # wrong pixel count


# ---------------------------------------------------------------- BMP

def test_bmp_24_roundtrip_and_row_order_equality():
    """Bottom-up and top-down store the same image with rows
    re-ordered on disk: decodes must be byte-identical."""
    for w, h in [(1, 1), (3, 2), (5, 4), (7, 3)]:  # odd widths pad
        px = _pix(w * h * 3)
        up = bmp.decode_bmp(bmp.encode_bmp(px, w, h))
        dn = bmp.decode_bmp(bmp.encode_bmp(px, w, h, top_down=True))
        assert up["pixels"] == px and up == dn


def test_bmp_32_and_palette_roundtrip():
    w, h = 6, 3
    px = _pix(w * h * 3)
    img = bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=32))
    assert img["pixels"] == px
    gray = _pix(w * h)
    pal = bmp.decode_bmp(bmp.encode_bmp_palette(gray, w, h))
    # identity gray palette: every pixel R=G=B=gray value
    assert pal["pixels"] == b"".join(bytes((v, v, v)) for v in gray)


def test_bmp_error_surface_and_gates():
    px = _pix(12 * 3)
    good = bmp.encode_bmp(px, 4, 3)
    with pytest.raises(ValueError):
        bmp.decode_bmp(b"notbmp")
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:-5])  # truncated raster
    rle = bytearray(good)
    # BI_RLE8 decodes for real since r10, but claiming it on a 24-bpp
    # stream is CORRUPT (the spec ties RLE8 to 8 bpp), not a gate
    struct.pack_into("<I", rle, 30, 1)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(rle))
    deep = bytearray(good)
    # 2 bpp decodes for real since r11; 64 bpp (GDI+ half-float
    # form) keeps the depth gate
    struct.pack_into("<H", deep, 28, 64)
    with pytest.raises(NotImplementedError):
        bmp.decode_bmp(bytes(deep))
    with pytest.raises(ValueError):
        bmp.encode_bmp(px, 5, 3)  # wrong pixel count


def test_codec_fuzz_truncations_and_flips():
    """Systematic truncations + byte flips must raise ValueError /
    NotImplementedError, never KeyError/IndexError/struct.error —
    the decode-kernel contract."""
    px = _pix(8 * 5 * 3)
    streams = [
        bmp.encode_bmp(px, 8, 5),
        bmp.encode_bmp_palette(_pix(8 * 5), 8, 5),
        pnm.encode_pnm(px, 8, 5, channels=3),
        pnm.encode_pnm(px, 8, 5, channels=3, ascii_form=True),
    ]
    for data in streams:
        for cut in range(0, len(data), max(1, len(data) // 23)):
            try:
                bmp.decode_bmp(data[:cut]) if data[:2] == b"BM" \
                    else pnm.decode_pnm(data[:cut])
            except (ValueError, NotImplementedError):
                pass
        for pos in range(0, min(len(data), 60), 7):
            flipped = bytearray(data)
            flipped[pos] ^= 0xFF
            try:
                bmp.decode_bmp(bytes(flipped)) if data[:2] == b"BM" \
                    else pnm.decode_pnm(bytes(flipped))
            except (ValueError, NotImplementedError):
                pass


def test_decode_kernel_runs_real_bmp_and_pnm_bytes(spark):
    """The Spark decode kernel dispatches BMP and PNM for real:
    dims/checksum come from the actual decoded pixels."""
    import zlib

    import pandas as pd

    from thrivefinancedatapipeline_spark.multimodal.binary_ops import (
        decode_image_batch,
    )

    px = _pix(10 * 4 * 3)
    payloads = pd.Series(
        [
            bmp.encode_bmp(px, 10, 4),
            pnm.encode_pnm(px, 10, 4, channels=3),
            pnm.encode_pnm(_pix(10 * 4), 10, 4, channels=1),
        ]
    )
    out = decode_image_batch(payloads, fake=False)
    assert list(out["width"]) == [10, 10, 10]
    assert list(out["height"]) == [4, 4, 4]
    assert out["checksum"][0] == zlib.crc32(px)
    assert out["checksum"][1] == zlib.crc32(px)


# -- BI_RLE8 (r10: the compressed-BMP gate closed) ---------------------


def test_rle8_round_trip_equals_uncompressed_twin():
    import hashlib

    w, h = 37, 9
    pix = bytearray()
    i = 0
    while len(pix) < w * h:
        pix.extend(hashlib.md5(f"rle8:{i}".encode()).digest())
        i += 1
    pix = bytes(pix[: w * h])
    # hash bytes (literal-heavy), solid runs, and a mixed row
    for case in (
        pix,
        b"\x42" * (w * h),
        (b"\x01" * 19 + b"\x02\x03\x04" + b"\x05" * 15) * h,
    ):
        case = case[: w * h]
        rle = bmp.decode_bmp(bmp.encode_bmp_rle8(case, w, h))
        raw = bmp.decode_bmp(bmp.encode_bmp_palette(case, w, h))
        assert rle == raw  # width/height/channels AND pixels


def test_rle8_compresses_runs():
    w, h = 200, 4
    solid = b"\x77" * (w * h)
    assert len(bmp.encode_bmp_rle8(solid, w, h)) < len(
        bmp.encode_bmp_palette(solid, w, h)
    )


def test_rle8_escapes_delta_eol_and_skip_semantics():
    """Hand-crafted stream: EOL short rows, a delta skip, and early
    end-of-bitmap all leave skipped pixels at palette index 0 (the
    documented renderer convention)."""
    w, h = 6, 3
    # bottom row (storage y=0): run of 2 index 9, EOL (rest 0)
    # middle row: delta skip (+2, 0) then literal 3 bytes 1,2,3, EOL
    # top row: nothing — early end-of-bitmap leaves it all index 0
    stream = bytes(
        [2, 9, 0, 0,
         0, 2, 2, 0, 0, 3, 1, 2, 3, 0, 0, 0,
         0, 1]
    )
    pal = bytearray()
    for v in range(256):
        pal.extend((v, v, v, 0))
    pix_off = 14 + 40 + len(pal)
    import struct

    data = (
        struct.pack("<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream),
            2835, 2835, 256, 0,
        )
        + bytes(pal)
        + stream
    )
    d = bmp.decode_bmp(data)
    px = d["pixels"]

    def gray(r, c):  # top-down row r, column c; identity palette
        v = px[(r * w + c) * 3]
        assert px[(r * w + c) * 3 + 1] == px[(r * w + c) * 3 + 2] == v
        return v

    # top-down row 2 is storage row 0 (bottom)
    assert [gray(2, c) for c in range(w)] == [9, 9, 0, 0, 0, 0]
    assert [gray(1, c) for c in range(w)] == [0, 0, 1, 2, 3, 0]
    assert [gray(0, c) for c in range(w)] == [0] * w


def test_rle8_error_surface_and_gates():
    good = bmp.encode_bmp_rle8(b"\x05" * 24, 6, 4)
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:-3])  # truncated mid-stream
    # a run that overruns the row width
    bad = bytearray(good)
    body_off = 14 + 40 + 1024
    bad[body_off : body_off + 2] = bytes([250, 1])
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(bad))
    # RLE8 claims with non-8 bpp are corrupt, not a gate
    import struct

    hdr = bytearray(bmp.encode_bmp(b"\x01\x02\x03" * 24, 6, 4))
    hdr[28:30] = struct.pack("<H", 24)
    hdr[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(hdr))
    # RLE8 must be bottom-up
    neg = bytearray(good)
    neg[22:26] = struct.pack("<i", -4)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(neg))
    # BI_BITFIELDS decodes for real since r11 — claiming it on an
    # 8-bpp stream is CORRUPT (the spec ties it to 16/32 bpp)
    bf = bytearray(good)
    bf[30:34] = struct.pack("<I", 3)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(bf))


# -- P1/P4 bitmaps (r10: the 1-bit PBM gate closed) --------------------


def test_pbm_ascii_equals_packed_and_roundtrip():
    import hashlib

    w, h = 19, 7  # width NOT a multiple of 8: row padding exercised
    digest = hashlib.md5(b"pbm").digest() * 9
    bits = bytes(b & 1 for b in digest[: w * h])
    p4 = pnm.decode_pnm(pnm.encode_pbm(bits, w, h))
    p1 = pnm.decode_pnm(pnm.encode_pbm(bits, w, h, ascii_form=True))
    assert p4 == p1  # ascii vs packed: pure re-representation
    assert (p4["width"], p4["height"], p4["channels"]) == (w, h, 1)
    # ink convention: 1 = black = 0, 0 = white = 255
    assert p4["pixels"] == bytes(0 if b else 255 for b in bits)


def test_pbm_p1_contiguous_digits_and_comments():
    data = b"P1\n# a comment\n4 2\n0110\n# mid\n1001\n"
    d = pnm.decode_pnm(data)
    assert d["pixels"] == bytes(
        0 if b else 255 for b in (0, 1, 1, 0, 1, 0, 0, 1)
    )


def test_pbm_error_surface():
    bits = bytes([0, 1]) * 8
    good = pnm.encode_pbm(bits, 4, 4)
    with pytest.raises(ValueError):
        pnm.decode_pnm(good[:-1])  # truncated packed raster
    with pytest.raises(ValueError):
        pnm.decode_pnm(b"P1\n2 2\n01x1\n")  # bad ascii sample
    with pytest.raises(ValueError):
        pnm.decode_pnm(b"P1\n2 2\n011\n")  # truncated ascii raster
    with pytest.raises(ValueError):
        pnm.encode_pbm(b"\x02\x00\x01\x00", 2, 2)  # non-bit input
    with pytest.raises(ValueError):
        pnm.encode_pbm(bits, 5, 4)  # dim mismatch


# -- BI_RLE4 (r10: the nibble-RLE gate closed too) ----------------------


def test_rle4_round_trip_and_alternating_runs():
    import hashlib

    w, h = 23, 6
    digest = hashlib.md5(b"rle4").digest() * 9
    nib = bytes(b & 0x0F for b in digest[: w * h])
    for case in (
        nib,                                  # literal-heavy
        bytes([7]) * (w * h),                 # one long run
        (bytes([1]) * 9 + bytes([2, 3, 4, 5]) + bytes([6]) * 10) * h,
    ):
        case = case[: w * h]
        d = bmp.decode_bmp(bmp.encode_bmp_rle4(case, w, h))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        want = b"".join(
            bytes((v * 17, v * 17, v * 17)) for v in case
        )
        assert d["pixels"] == want
    # a hand-crafted ALTERNATING encoded run: (n=5, 0xAB) decodes as
    # A B A B A — the RLE4 semantics RLE8 does not have
    import struct

    pal = bytearray()
    for v in range(16):
        g = v * 17
        pal.extend((g, g, g, 0))
    stream = bytes([5, 0xAB, 0, 0, 0, 1])
    pix_off = 14 + 40 + len(pal)
    data = (
        struct.pack("<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, 5, 1, 1, 4, 2, len(stream),
            2835, 2835, 16, 0,
        )
        + bytes(pal)
        + stream
    )
    d = bmp.decode_bmp(data)
    got = [d["pixels"][i * 3] for i in range(5)]
    assert got == [0xA * 17, 0xB * 17, 0xA * 17, 0xB * 17, 0xA * 17]


def test_rle4_error_surface_and_remaining_gates():
    good = bmp.encode_bmp_rle4(bytes([3]) * 24, 6, 4)
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:-3])  # truncated stream
    with pytest.raises(ValueError):
        bmp.encode_bmp_rle4(b"\x10" * 24, 6, 4)  # index > 15
    # RLE4 claims on 8-bpp streams are corrupt
    bad = bytearray(bmp.encode_bmp_palette(b"\x01" * 24, 6, 4))
    struct.pack_into("<I", bad, 30, 2)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(bad))
    # BI_BITFIELDS decodes for real since r11 — on a 4-bpp stream
    # the claim is corrupt (the spec ties it to 16/32 bpp)
    bf4 = bytearray(good)
    struct.pack_into("<I", bf4, 30, 3)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(bf4))


# -- 16-bpp X1R5G5B5 (r10: the high-color gate closed) ------------------


def test_bmp16_roundtrip_on_replicated_values_and_projection():
    w, h = 7, 4  # odd width: 2-byte pixels leave a 2-byte row pad
    # 5-bit-replicated channel values round-trip EXACTLY
    rep = bytes(
        ((b >> 3) << 3) | ((b >> 3) >> 2) for b in _pix(w * h * 3, "b16")
    )
    d = bmp.decode_bmp(bmp.encode_bmp(rep, w, h, bpp=16))
    assert d["pixels"] == rep
    # arbitrary input: decode(encode(x)) is a PROJECTION — applying
    # encode+decode twice equals once (quantize then replicate is
    # idempotent), and both row orders decode identically
    px = _pix(w * h * 3)
    once = bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=16))["pixels"]
    twice = bmp.decode_bmp(bmp.encode_bmp(once, w, h, bpp=16))["pixels"]
    assert twice == once
    dn = bmp.decode_bmp(
        bmp.encode_bmp(px, w, h, bpp=16, top_down=True)
    )["pixels"]
    assert dn == once
    # truncation of the 16-bpp raster is corrupt
    with pytest.raises(ValueError):
        bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=16)[:-3])


def test_resize_nn_handles_16bit_pnm(spark):
    """The 16-bit resize gate is closed (r10): nearest-neighbor does
    no value arithmetic, so wide samples resample as 2-byte units —
    checked against a direct per-sample recompute."""
    import struct as _struct
    import zlib

    import pandas as pd

    from thrivefinancedatapipeline_spark.multimodal.binary_ops import (
        resize_nn,
        resize_pixels_nn,
    )

    w, h, tw, th = 6, 4, 3, 3
    samples = [
        int.from_bytes(_pix(2, f"s{i}"), "big") for i in range(w * h)
    ]
    px = _struct.pack(f">{w * h}H", *samples)
    payload = pnm.encode_pnm(px, w, h, channels=1, maxval=65535)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = resize_nn(df, tw, th).collect()[0]
    # direct recompute in SAMPLE space, then repacked big-endian
    want_samples = [
        samples[(y * h // th) * w + (x * w // tw)]
        for y in range(th)
        for x in range(tw)
    ]
    want = _struct.pack(f">{tw * th}H", *want_samples)
    assert (row.width, row.height) == (tw, th)
    assert row.checksum == zlib.crc32(want)
    # and the byte-unit trick equals the struct-level recompute
    assert resize_pixels_nn(px, w, h, tw, th, channels=2) == want


# -- uncompressed 4-bpp and 1-bpp (r10: the last depth gates closed) ----


def test_bmp4_uncompressed_equals_rle4_decode():
    """Raw 4-bpp and RLE4 store the SAME image — decodes must be
    identical (the reorder-only rule), row padding exercised."""
    w, h = 11, 5
    nib = bytes(b & 0x0F for b in _pix(w * h, "b4"))
    raw = bmp.decode_bmp(bmp.encode_bmp_palette4(nib, w, h))
    rle = bmp.decode_bmp(bmp.encode_bmp_rle4(nib, w, h))
    assert raw == rle
    assert raw["pixels"][0::3] == bytes(v * 17 for v in nib)


def test_bmp1_roundtrip_and_errors():
    w, h = 19, 3  # width far from a byte boundary
    bits = bytes(b & 1 for b in _pix(w * h, "b1"))
    d = bmp.decode_bmp(bmp.encode_bmp_1bit(bits, w, h))
    assert d["pixels"] == b"".join(
        (b"\xff\xff\xff" if b else b"\x00\x00\x00") for b in bits
    )
    with pytest.raises(ValueError):
        bmp.encode_bmp_1bit(b"\x02" * (w * h), w, h)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bmp.encode_bmp_1bit(bits, w, h)[:-2])


# -------------------------------------------------------- BITFIELDS


def test_bitfields_565_roundtrip_and_projection():
    w, h = 7, 4
    # replicated 5/6/5 channel values round-trip EXACTLY
    rep = bytearray()
    for i, b in enumerate(_pix(w * h * 3, "bf565")):
        q = b >> 3 if i % 3 != 1 else b >> 2
        rep.append(
            ((q << 3) | (q >> 2)) if i % 3 != 1 else ((q << 2) | (q >> 4))
        )
    rep = bytes(rep)
    d = bmp.decode_bmp(bmp.encode_bmp_bitfields(rep, w, h))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["pixels"] == rep
    # arbitrary input: encode+decode is an idempotent projection
    px = _pix(w * h * 3)
    once = bmp.decode_bmp(bmp.encode_bmp_bitfields(px, w, h))["pixels"]
    twice = bmp.decode_bmp(bmp.encode_bmp_bitfields(once, w, h))["pixels"]
    assert twice == once


def test_bitfields_555_equals_bi_rgb16_and_standard32_equals_bgrx():
    """BITFIELDS with the 555 masks and BI_RGB 16-bpp are the SAME
    samples re-represented — decodes must be byte-identical (the
    reorder-only rule); likewise 32-bpp BITFIELDS with the standard
    BGRX masks vs BI_RGB 32-bpp."""
    w, h = 6, 5
    px = _pix(w * h * 3, "bf555")
    a = bmp.decode_bmp(
        bmp.encode_bmp_bitfields(px, w, h, masks=(0x7C00, 0x03E0, 0x001F))
    )
    b = bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=16))
    assert a == b
    a32 = bmp.decode_bmp(
        bmp.encode_bmp_bitfields(
            px, w, h, masks=(0xFF0000, 0x00FF00, 0x0000FF), bpp=32
        )
    )
    b32 = bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=32))
    assert a32 == b32


def test_bitfields_exotic_masks():
    w, h = 5, 3
    px = _pix(w * h * 3, "bfx")
    # 4:4:4 in 16 bpp: exact on 4-bit-replicated values
    rep = bytes(((b >> 4) << 4) | (b >> 4) for b in px)
    d = bmp.decode_bmp(
        bmp.encode_bmp_bitfields(rep, w, h, masks=(0x0F00, 0x00F0, 0x000F))
    )
    assert d["pixels"] == rep
    # 10:10:10 in 32 bpp: channel wider than 8 bits is EXACT on all
    # byte values (quantize pads low bits, replicate drops them)
    d10 = bmp.decode_bmp(
        bmp.encode_bmp_bitfields(
            px, w, h,
            masks=(0x3FF00000, 0x000FFC00, 0x000003FF), bpp=32,
        )
    )
    assert d10["pixels"] == px
    # a 1-bit channel replicates to 0x00 / 0xFF
    d1 = bmp.decode_bmp(
        bmp.encode_bmp_bitfields(px, w, h, masks=(0x8000, 0x7FE0, 0x001F))
    )
    assert all(v in (0, 255) for v in d1["pixels"][0::3])


def test_bitfields_v4_header_masks_read_from_same_offset():
    """A V4-header writer embeds the masks at header-relative offset
    40 — the same FILE offset a BITMAPINFOHEADER writer puts the
    appended mask table, so one decode path serves both (pinned by
    rewriting the same stream to a 108-byte header)."""
    w, h = 4, 3
    px = _pix(w * h * 3, "bfv4")
    small = bmp.encode_bmp_bitfields(px, w, h)
    want = bmp.decode_bmp(small)
    raster = small[14 + 40 + 12 :]
    masks = small[14 + 40 : 14 + 40 + 12]
    pix_off = 14 + 108
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off
    )
    info = struct.pack(
        "<IiiHHIIiiII", 108, w, h, 1, 16, 3, len(raster), 2835, 2835, 0, 0
    )
    v4 = header + info + masks + b"\x00" * (108 - 40 - 12) + raster
    assert bmp.decode_bmp(v4) == want


def test_bitfields_error_surfaces():
    w, h = 4, 3
    px = _pix(w * h * 3, "bfe")
    good = bmp.encode_bmp_bitfields(px, w, h)
    for masks in (
        (0, 0x07E0, 0x001F),  # zero mask
        (0xF800, 0xFC00, 0x001F),  # overlapping
        (0xA800, 0x07E0, 0x001F),  # non-contiguous
        (0x1F800, 0x07E0, 0x001F),  # wider than the pixel word
    ):
        with pytest.raises(ValueError):
            bmp.encode_bmp_bitfields(px, w, h, masks=masks)
        bad = bytearray(good)
        bad[14 + 40 : 14 + 40 + 12] = struct.pack("<III", *masks)
        with pytest.raises(ValueError):
            bmp.decode_bmp(bytes(bad))
    with pytest.raises(ValueError):  # BITFIELDS ties to 16/32 bpp
        bmp.encode_bmp_bitfields(px, w, h, bpp=24)
    deep = bytearray(good)
    struct.pack_into("<H", deep, 28, 24)
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(deep))
    with pytest.raises(ValueError):  # mask table cut off
        bmp.decode_bmp(good[: 14 + 40 + 7])


# -- 2-bpp quarter-byte rasters (r11: the Windows CE gate closed) -------


def test_bmp2_roundtrip_and_4bpp_twin():
    w, h = 9, 4  # 9 px -> 3 bytes of 2-bit indices + stride pad
    idx = bytes(b & 3 for b in _pix(w * h, "b2"))
    d = bmp.decode_bmp(bmp.encode_bmp_palette2(idx, w, h))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    # identity 4-gray palette: v*85 as R=G=B
    assert d["pixels"] == bytes(v for i in idx for v in (i * 85,) * 3)
    # the same indices as a 4-bpp raster under a palette matching at
    # the shared entries decode pixel-EQUAL (reorder-only rule);
    # build the 4-bpp twin by scaling indices into the 17-gray curve
    idx17 = bytes(i * 5 for i in idx)  # 0,5,10,15 -> 17*{0,5,10,15}
    d4 = bmp.decode_bmp(bmp.encode_bmp_palette4(idx17, w, h))
    assert d4["pixels"] == d["pixels"]


def test_bmp2_error_surface():
    w, h = 4, 3
    idx = bytes(b & 3 for b in _pix(w * h, "b2e"))
    with pytest.raises(ValueError):
        bmp.encode_bmp_palette2(b"\x04" * (w * h), w, h)  # index > 3
    good = bmp.encode_bmp_palette2(idx, w, h)
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:-3])  # truncated raster
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[: 14 + 40 + 5])  # truncated palette
    # an index past a SHORTENED color table is corrupt
    bad = bytearray(good)
    struct.pack_into("<I", bad, 46, 1)  # biClrUsed = 1
    if any(idx):
        with pytest.raises(ValueError):
            bmp.decode_bmp(bytes(bad))


# -- PAM P7 (r11: the last netpbm gate closed) --------------------------


def test_pam_roundtrip_all_depths_and_pnm_parity():
    w, h = 5, 4
    for depth in (1, 2, 3, 4):
        px = _pix(w * h * depth, f"pam{depth}")
        d = pnm.decode_pnm(pnm.encode_pam(px, w, h, depth=depth))
        assert (d["width"], d["height"], d["channels"]) == (w, h, depth)
        assert d["pixels"] == px
        assert d["tupltype"] == {
            1: "GRAYSCALE", 2: "GRAYSCALE_ALPHA",
            3: "RGB", 4: "RGB_ALPHA",
        }[depth]
    # a PAM GRAYSCALE / RGB raster holds the SAME samples as P5 / P6:
    # decode parity is pixel-EXACT (the re-container rule)
    for depth, ch in ((1, 1), (3, 3)):
        px = _pix(w * h * depth, f"pamp{depth}")
        a = pnm.decode_pnm(pnm.encode_pam(px, w, h, depth=depth))
        b = pnm.decode_pnm(pnm.encode_pnm(px, w, h, channels=ch))
        assert a["pixels"] == b["pixels"]


def test_pam_16bit_comments_and_header_flexibility():
    samples = [0, 1, 255, 256, 65535, 40000]
    px = struct.pack(">6H", *samples)
    d = pnm.decode_pnm(pnm.encode_pam(px, 3, 2, depth=1, maxval=65535))
    assert d["maxval"] == 65535 and d["pixels"] == px
    # field order is free, comment/blank lines are legal, and an
    # unknown TUPLTYPE is allowed per spec
    hdr = (b"P7\n# comment\nMAXVAL 255\n\nDEPTH 2\nHEIGHT 2\n"
           b"WIDTH 2\nTUPLTYPE CUSTOM TYPE\nENDHDR\n")
    raw = _pix(8, "pamflex")
    d2 = pnm.decode_pnm(hdr + raw)
    assert d2["channels"] == 2 and d2["pixels"] == raw
    assert d2["tupltype"] == "CUSTOM TYPE"


def test_pam_error_surface():
    px = _pix(12, "pame")
    good = pnm.encode_pam(px, 2, 2, depth=3)
    with pytest.raises(ValueError):
        pnm.decode_pnm(good[:-3])  # truncated raster
    with pytest.raises(ValueError):
        pnm.decode_pnm(b"P7\nWIDTH 2\nHEIGHT 2\nDEPTH 3\nMAXVAL 255\n")
    with pytest.raises(ValueError):  # missing field
        pnm.decode_pnm(b"P7\nWIDTH 2\nHEIGHT 2\nMAXVAL 255\nENDHDR\n")
    with pytest.raises(ValueError):  # duplicate field
        pnm.decode_pnm(
            b"P7\nWIDTH 2\nWIDTH 2\nHEIGHT 1\nDEPTH 1\nMAXVAL 255\n"
            b"ENDHDR\n" + px[:2]
        )
    with pytest.raises(ValueError):  # tupltype contradicts depth
        pnm.decode_pnm(
            b"P7\nWIDTH 2\nHEIGHT 1\nDEPTH 3\nMAXVAL 255\n"
            b"TUPLTYPE GRAYSCALE\nENDHDR\n" + px[:6]
        )
    with pytest.raises(ValueError):  # unknown header keyword
        pnm.decode_pnm(
            b"P7\nWIDTH 2\nHEIGHT 1\nDEPTH 1\nMAXVAL 255\nBOGUS 1\n"
            b"ENDHDR\n" + px[:2]
        )
    with pytest.raises(ValueError):  # magic is 'P7' ALONE on its line
        pnm.decode_pnm(
            b"P7FOO\nWIDTH 2\nHEIGHT 1\nDEPTH 1\nMAXVAL 255\n"
            b"ENDHDR\n" + px[:2]
        )
    # ...but trailing whitespace after the token stays tolerated
    spaced = b"P7 \n" + good.split(b"\n", 1)[1]
    assert pnm.decode_pnm(spaced)["pixels"] == pnm.decode_pnm(good)["pixels"]
    with pytest.raises(ValueError):
        pnm.encode_pam(px, 5, 2, depth=3)  # wrong pixel count
