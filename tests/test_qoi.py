"""QOI codec: lossless equality round trips across content shapes
(each chosen to force a specific op family), the channels=3 vs
channels=4 re-representation pinned pixel-EXACT (the codec-parity
principle), hand-crafted stream decodes against spec arithmetic,
error surfaces, fuzz, and the real decode path through the Spark
kernel."""

import hashlib
import struct
import zlib

import pytest

from thrivefinancedatapipeline_spark.multimodal import qoi


def _pix(n, seed="px"):
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


def _images():
    """(name, pixels, w, h, channels) covering every encoder op:
    md5 noise (RGB/RGBA literals + index hits), flat runs (RUN,
    including the 62-px emit boundary), a slow horizontal ramp
    (DIFF), a steeper ramp (LUMA), and alpha steps (RGBA)."""
    yield ("noise_rgb", _pix(16 * 9 * 3), 16, 9, 3)
    yield ("noise_rgba", _pix(12 * 7 * 4, "a"), 12, 7, 4)
    yield ("flat_long_run", bytes([80, 90, 100]) * 200, 200, 1, 3)
    ramp = bytearray()
    r = g = b = 128
    for _ in range(150):
        ramp.extend((r % 256, g % 256, b % 256))
        r += 1
        g += 1
        b += 1  # dr=dg=db=1 -> QOI_OP_DIFF
    yield ("diff_ramp", bytes(ramp), 150, 1, 3)
    luma = bytearray()
    r = g = b = 10
    for _ in range(100):
        luma.extend((r % 256, g % 256, b % 256))
        r += 9
        g += 12
        b += 5  # dg=12, dr-dg=-3, db-dg=-7 -> QOI_OP_LUMA
    yield ("luma_ramp", bytes(luma), 100, 1, 3)
    alpha = bytearray()
    for i in range(64):
        alpha.extend((i * 3 % 256, 7, 9, (i * 37) % 256))
    yield ("alpha_steps", bytes(alpha), 8, 8, 4)
    # alternating distant colors: after the first literals, every
    # pixel is a 64-slot index hit (hashes 25 and 61 — no collision)
    yield (
        "index_alternation",
        bytes([10, 200, 50, 250, 20, 90]) * 50,
        100, 1, 3,
    )
    yield ("single", bytes([0, 0, 0]), 1, 1, 3)


def test_qoi_roundtrip_every_op_family():
    for name, px, w, h, ch in _images():
        data = qoi.encode_qoi(px, w, h, channels=ch)
        img = qoi.decode_qoi(data)
        assert (img["width"], img["height"]) == (w, h), name
        assert img["channels"] == ch, name
        assert img["pixels"] == px, name


def test_qoi_op_mix_is_complete():
    """The generator images really do exercise all six ops — guard
    against a silently literal-only encoder."""
    tags = set()
    for _name, px, w, h, ch in _images():
        data = qoi.encode_qoi(px, w, h, channels=ch)
        pos = 14
        end = len(data) - 8
        while pos < end:
            op = data[pos]
            if op == 0xFE:
                tags.add("rgb")
                pos += 4
            elif op == 0xFF:
                tags.add("rgba")
                pos += 5
            else:
                tag = op & 0xC0
                if tag == 0x00:
                    tags.add("index")
                    pos += 1
                elif tag == 0x40:
                    tags.add("diff")
                    pos += 1
                elif tag == 0x80:
                    tags.add("luma")
                    pos += 2
                else:
                    tags.add("run")
                    pos += 1
    assert tags == {"rgb", "rgba", "index", "diff", "luma", "run"}


def test_qoi_3ch_equals_4ch_on_opaque_content():
    """channels=3 and channels=4 encodings of the same opaque image
    are re-representations: decodes must agree pixel-exact once the
    constant alpha plane is dropped."""
    px3 = _pix(11 * 6 * 3)
    px4 = bytearray()
    for i in range(0, len(px3), 3):
        px4.extend(px3[i : i + 3])
        px4.append(255)
    d3 = qoi.decode_qoi(qoi.encode_qoi(px3, 11, 6, channels=3))
    d4 = qoi.decode_qoi(qoi.encode_qoi(bytes(px4), 11, 6, channels=4))
    dropped = b"".join(
        d4["pixels"][i : i + 3] for i in range(0, len(d4["pixels"]), 4)
    )
    assert d3["pixels"] == px3 and dropped == px3


def test_qoi_handcrafted_stream_decodes_per_spec():
    """A hand-assembled chunk stream decodes to spec-computed pixels:
    RGB literal, DIFF (+1,+1,+1), LUMA (dg=-10, dr-dg=+2, db-dg=-3),
    RUN of 2, INDEX back to the first pixel."""
    hdr = struct.pack(">4sIIBB", b"qoif", 6, 1, 3, 0)
    first = (100, 150, 200)
    h0 = (100 * 3 + 150 * 5 + 200 * 7 + 255 * 11) % 64
    chunks = bytes(
        [
            0xFE, 100, 150, 200,                 # RGB literal
            0x40 | (3 << 4) | (3 << 2) | 3,      # DIFF +1,+1,+1
            0x80 | (-10 + 32), ((2 + 8) << 4) | (-3 + 8),  # LUMA
            0xC0 | (2 - 1),                      # RUN x2
            0x00 | h0,                           # INDEX -> first
        ]
    )
    data = hdr + chunks + b"\x00" * 7 + b"\x01"
    img = qoi.decode_qoi(data)
    px2 = (101, 151, 201)
    px3 = (101 - 10 + 2, 151 - 10, 201 - 10 - 3)
    want = [first, px2, px3, px3, px3, first]
    got = [
        tuple(img["pixels"][i : i + 3])
        for i in range(0, len(img["pixels"]), 3)
    ]
    assert got == want


def test_qoi_error_surface():
    px = _pix(5 * 4 * 3)
    good = qoi.encode_qoi(px, 5, 4)
    with pytest.raises(ValueError):
        qoi.decode_qoi(b"noqoi")
    with pytest.raises(ValueError):
        qoi.decode_qoi(good[:10])  # truncated header
    with pytest.raises(ValueError):
        qoi.decode_qoi(good[:-9])  # chunk stream cut mid-pixels
    with pytest.raises(ValueError):
        qoi.decode_qoi(good[:-1])  # end marker clipped
    bad_ch = bytearray(good)
    bad_ch[12] = 5
    with pytest.raises(ValueError):
        qoi.decode_qoi(bytes(bad_ch))
    zero_w = bytearray(good)
    struct.pack_into(">I", zero_w, 4, 0)
    with pytest.raises(ValueError):
        qoi.decode_qoi(bytes(zero_w))
    # a run overflowing the declared pixel count
    hdr = struct.pack(">4sIIBB", b"qoif", 2, 1, 3, 0)
    data = hdr + bytes([0xFE, 1, 2, 3, 0xC0 | 61]) + b"\x00" * 7 + b"\x01"
    with pytest.raises(ValueError):
        qoi.decode_qoi(data)
    with pytest.raises(ValueError):
        qoi.encode_qoi(px, 4, 4)  # wrong pixel count
    with pytest.raises(ValueError):
        qoi.encode_qoi(px, 5, 4, channels=2)


def test_qoi_fuzz_truncations_and_flips():
    """Truncations + byte flips raise ValueError only — the
    decode-kernel contract (never IndexError/struct.error/hang)."""
    px = _pix(9 * 6 * 3)
    data = qoi.encode_qoi(px, 9, 6)
    for cut in range(0, len(data), max(1, len(data) // 29)):
        try:
            qoi.decode_qoi(data[:cut])
        except (ValueError, NotImplementedError):
            pass
    for pos in range(0, len(data), 3):
        flipped = bytearray(data)
        flipped[pos] ^= 0xFF
        try:
            qoi.decode_qoi(bytes(flipped))
        except (ValueError, NotImplementedError):
            pass


def test_decode_kernel_runs_real_qoi_bytes(spark):
    import pandas as pd

    from thrivefinancedatapipeline_spark.multimodal.binary_ops import (
        decode_image_batch,
    )

    px = _pix(10 * 4 * 3)
    rgba = _pix(6 * 6 * 4, "k")
    payloads = pd.Series(
        [
            qoi.encode_qoi(px, 10, 4, channels=3),
            qoi.encode_qoi(rgba, 6, 6, channels=4),
        ]
    )
    out = decode_image_batch(payloads, fake=False)
    assert list(out["width"]) == [10, 6]
    assert list(out["height"]) == [4, 6]
    assert out["checksum"][0] == zlib.crc32(px)
    assert out["checksum"][1] == zlib.crc32(rgba)
