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
    hdr = bytearray(tga.encode_tga(_px(12), 2, 2)[:18])
    for t, exc in (
        (1, NotImplementedError),   # color-mapped
        (9, NotImplementedError),   # RLE color-mapped
        (3, NotImplementedError),   # mono
        (11, NotImplementedError),  # RLE mono
        (7, ValueError),            # undefined type
    ):
        bad = bytes(hdr[:2]) + bytes([t]) + bytes(hdr[3:]) + b"\x00" * 48
        with pytest.raises(exc):
            tga.decode_tga(bad)
    sixteen = bytes(hdr[:16]) + bytes([16]) + bytes(hdr[17:]) + b"\x00" * 48
    with pytest.raises(NotImplementedError):
        tga.decode_tga(sixteen)
