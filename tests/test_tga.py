"""TGA codec: equality round trips (raw vs RLE, top-down vs
bottom-up are pure bit re-orderings — the codec-parity principle),
RLE packet edge cases, and the error/gate surface."""

import hashlib

import pytest

from thrivefinancedatapipeline_spark.multimodal import tga


def _px(n: int, seed: str = "tga") -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


def test_raw_and_rle_round_trip_equality_rgb():
    w, h = 9, 5
    pix = _px(w * h * 3)
    for rle in (False, True):
        for top_down in (True, False):
            d = tga.decode_tga(
                tga.encode_tga(pix, w, h, rle=rle, top_down=top_down)
            )
            assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
            assert d["pixels"] == pix, (rle, top_down)


def test_rgba_round_trip_and_alpha_survives():
    w, h = 6, 4
    pix = _px(w * h * 4)
    for rle in (False, True):
        d = tga.decode_tga(
            tga.encode_tga(pix, w, h, channels=4, rle=rle)
        )
        assert d["channels"] == 4
        assert d["pixels"] == pix


def test_rle_long_runs_and_boundaries():
    # a 300-pixel-wide solid row forces run packets past the 128 cap,
    # and alternating rows force raw packets; all must round trip
    w, h = 300, 3
    solid = b"\x10\x20\x30" * w
    alt = b"".join(
        (b"\x01\x02\x03" if x % 2 else b"\x04\x05\x06") for x in range(w)
    )
    pix = solid + alt + solid
    enc = tga.encode_tga(pix, w, h, rle=True)
    raw = tga.encode_tga(pix, w, h, rle=False)
    assert len(enc) < len(raw)  # RLE actually compresses the runs
    assert tga.decode_tga(enc)["pixels"] == pix
    # 1x1 degenerate
    assert tga.decode_tga(tga.encode_tga(b"\x07\x08\x09", 1, 1, rle=True))[
        "pixels"
    ] == b"\x07\x08\x09"


def test_rle_packets_do_not_cross_rows_but_decoder_tolerates():
    # encoder: a run spanning two rows must emit per-row packets
    w, h = 4, 2
    pix = b"\xaa\xbb\xcc" * (w * h)
    enc = tga.encode_tga(pix, w, h, rle=True)
    body = enc[18:]
    # two packets, one per row: each run header covers exactly w pixels
    assert body[0] == 0x80 | (w - 1) and body[4] == 0x80 | (w - 1)
    # decoder tolerates a writer whose run crosses the row boundary
    crossing = enc[:18] + bytes([0x80 | (w * h - 1)]) + b"\xcc\xbb\xaa"
    assert tga.decode_tga(crossing)["pixels"] == b"\xaa\xbb\xcc" * (w * h)


def test_error_surface():
    pix = _px(4 * 2 * 3)
    good = tga.encode_tga(pix, 4, 2, rle=True)
    with pytest.raises(ValueError):
        tga.decode_tga(good[:10])  # truncated header
    with pytest.raises(ValueError):
        tga.decode_tga(good[:-2])  # truncated RLE stream
    raw = tga.encode_tga(pix, 4, 2)
    with pytest.raises(ValueError):
        tga.decode_tga(raw[:-1])  # truncated raster
    with pytest.raises(ValueError):
        tga.encode_tga(pix, 4, 3)  # dim mismatch
    with pytest.raises(ValueError):
        tga.encode_tga(pix, 4, 2, channels=2)
    # an RLE raster that overruns the pixel count is corrupt
    over = good[:18] + bytes([0x80 | 127]) + b"\x01\x02\x03" * 40
    with pytest.raises(ValueError):
        tga.decode_tga(over)


def test_scope_gates():
    """Types 1/9/3/11 and 16 bpp decode for real since r11 — the
    remaining gates are INCONSISTENT claims (corrupt) and genuinely
    unimplemented variants."""
    hdr = bytearray(tga.encode_tga(_px(12), 2, 2)[:18])
    for t, exc in (
        (1, ValueError),   # color-mapped claim without a color map
        (9, ValueError),   # same, RLE
        (3, NotImplementedError),   # mono at 24 bpp stays gated
        (11, NotImplementedError),  # same, RLE
        (7, ValueError),            # undefined type
    ):
        bad = bytes(hdr[:2]) + bytes([t]) + bytes(hdr[3:]) + b"\x00" * 48
        with pytest.raises(exc):
            tga.decode_tga(bad)
    # 16-bpp A1R5G5B5 true-color decodes since r11
    sixteen = bytes(hdr[:16]) + bytes([16]) + bytes(hdr[17:]) + b"\x00" * 48
    d = tga.decode_tga(sixteen)
    assert d["channels"] == 3 and set(d["pixels"]) == {0}
    # 15-bit color-map entries in a mapped image keep the gate only
    # for UNKNOWN entry sizes; 8-bit entries are genuinely gated
    cm = tga.encode_tga_cmap(b"\x00\x01\x02\x03", 2, 2,
                             [(9, 9, 9)] * 4)
    bad_entry = bytearray(cm)
    bad_entry[7] = 8  # cmap entry size 8
    with pytest.raises(NotImplementedError):
        tga.decode_tga(bytes(bad_entry))
    wide_idx = bytearray(cm)
    wide_idx[16] = 16  # 16-bit indices stay gated
    with pytest.raises(NotImplementedError):
        tga.decode_tga(bytes(wide_idx))


# -- r11: monochrome / color-mapped / 16-bpp gates closed ---------------


def test_mono_roundtrip_raw_equals_rle():
    w, h = 9, 5
    gray = _px(w * h)
    raw = tga.decode_tga(tga.encode_tga(gray, w, h, channels=1))
    rle = tga.decode_tga(tga.encode_tga(gray, w, h, channels=1, rle=True))
    assert raw["channels"] == 1 and raw["pixels"] == gray
    assert raw == rle
    up = tga.decode_tga(
        tga.encode_tga(gray, w, h, channels=1, top_down=False)
    )
    assert up == raw


def test_cmap_decodes_equal_to_palette_expansion():
    """A color-mapped image holds the SAME pixels as the true-color
    encoding of its palette expansion — decode parity pinned (the
    re-container rule), across entry widths, RLE, and a nonzero
    color-map origin."""
    w, h = 6, 4
    pal = [(i * 17, 255 - i * 17, (i * 97) % 256) for i in range(16)]
    idx = bytes(b % 16 for b in _px(w * h, "cm"))
    expanded = bytes(v for i in idx for v in pal[i])
    want = tga.decode_tga(tga.encode_tga(expanded, w, h))
    for rle in (False, True):
        for first in (0, 7):
            got = tga.decode_tga(
                tga.encode_tga_cmap(idx, w, h, pal, first=first, rle=rle)
            )
            assert got == want
    # 32-bit entries carry alpha through
    pal4 = [(r, g, b, (r * 7) % 256) for r, g, b in pal]
    got4 = tga.decode_tga(
        tga.encode_tga_cmap(idx, w, h, pal4, entry_bits=32)
    )
    exp4 = bytes(v for i in idx for v in pal4[i])
    assert got4["channels"] == 4 and got4["pixels"] == exp4
    # 16-bit entries replicate like the 16-bpp true-color path
    rep = [(tga._rgb555(((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)))
           for r, g, b in pal]
    got16 = tga.decode_tga(
        tga.encode_tga_cmap(idx, w, h, pal, entry_bits=16)
    )
    assert got16["pixels"] == bytes(v for i in idx for v in rep[i])


def test_cmap_error_surface():
    w, h = 4, 2
    pal = [(1, 2, 3), (4, 5, 6)]
    idx = bytes([0, 1, 0, 1, 1, 0, 1, 0])
    good = tga.encode_tga_cmap(idx, w, h, pal)
    with pytest.raises(ValueError):
        tga.decode_tga(good[: 18 + 3])  # truncated color map
    # an index below the color-map origin is corrupt
    shifted = bytearray(tga.encode_tga_cmap(idx, w, h, pal, first=5))
    shifted[18 + 6] = 2  # below first=5
    with pytest.raises(ValueError):
        tga.decode_tga(bytes(shifted))
    with pytest.raises(ValueError):
        tga.encode_tga_cmap(b"\x02" * 8, w, h, pal)  # index >= palette
    with pytest.raises(ValueError):
        tga.encode_tga_cmap(idx, w, h, [])  # empty palette


def test_tga16_roundtrip_projection_and_bmp_agreement():
    w, h = 7, 3
    px = _px(w * h * 3, "t16")
    rep = bytes(((b >> 3) << 3) | ((b >> 3) >> 2) for b in px)
    d = tga.decode_tga(tga.encode_tga16(rep, w, h))
    assert d["pixels"] == rep  # exact on replicated values
    once = tga.decode_tga(tga.encode_tga16(px, w, h))["pixels"]
    twice = tga.decode_tga(tga.encode_tga16(once, w, h))["pixels"]
    assert twice == once  # idempotent projection
    rle = tga.decode_tga(tga.encode_tga16(px, w, h, rle=True))["pixels"]
    assert rle == once  # raw vs RLE reorder-only
    # the 555 replication convention is SHARED with the BMP codec:
    # both formats' 16-bit decodes of the same content agree
    from thrivefinancedatapipeline_spark.multimodal import bmp

    via_bmp = bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=16))["pixels"]
    assert once == via_bmp
