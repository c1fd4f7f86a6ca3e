"""Hypothesis property sweep over every LOSSLESS codec: arbitrary
small pixel grids must round-trip EXACTLY through each format and
its representation variants (RLE vs raw, row orders, ascii vs
binary) — the md5-derived attest content exercises one distribution;
this drives adversarial shapes (all-equal runs, alternating stripes,
boundary dims) the strategies are free to find."""

from hypothesis import given, settings
from hypothesis import strategies as st

from thrivefinancedatapipeline_spark.multimodal import (
    bmp,
    ico,
    pnm,
    qoi,
    tga,
)

dims = st.tuples(st.integers(1, 17), st.integers(1, 9))


@settings(max_examples=40, deadline=None)
@given(dims, st.binary(min_size=17 * 9 * 4, max_size=17 * 9 * 4))
def test_rgb_codecs_roundtrip(wh, blob):
    w, h = wh
    px = blob[: w * h * 3]
    assert bmp.decode_bmp(bmp.encode_bmp(px, w, h))["pixels"] == px
    assert (
        bmp.decode_bmp(bmp.encode_bmp(px, w, h, top_down=True))["pixels"]
        == px
    )
    assert bmp.decode_bmp(bmp.encode_bmp(px, w, h, bpp=32))["pixels"] == px
    assert qoi.decode_qoi(qoi.encode_qoi(px, w, h))["pixels"] == px
    assert (
        pnm.decode_pnm(pnm.encode_pnm(px, w, h, channels=3))["pixels"]
        == px
    )
    for rle in (False, True):
        for td in (True, False):
            assert (
                tga.decode_tga(
                    tga.encode_tga(px, w, h, rle=rle, top_down=td)
                )["pixels"]
                == px
            )


@settings(max_examples=40, deadline=None)
@given(dims, st.binary(min_size=17 * 9, max_size=17 * 9))
def test_paletted_codecs_roundtrip(wh, blob):
    w, h = wh
    gray = blob[: w * h]
    rgb_of = b"".join(bytes((v, v, v)) for v in gray)
    assert (
        bmp.decode_bmp(bmp.encode_bmp_palette(gray, w, h))["pixels"]
        == rgb_of
    )
    assert (
        bmp.decode_bmp(bmp.encode_bmp_rle8(gray, w, h))["pixels"]
        == rgb_of
    )
    nib = bytes(v & 0x0F for v in gray)
    want4 = b"".join(bytes((v * 17,) * 3) for v in nib)
    assert (
        bmp.decode_bmp(bmp.encode_bmp_rle4(nib, w, h))["pixels"] == want4
    )
    assert (
        bmp.decode_bmp(bmp.encode_bmp_palette4(nib, w, h))["pixels"]
        == want4
    )
    bits = bytes(v & 1 for v in gray)
    assert bmp.decode_bmp(bmp.encode_bmp_1bit(bits, w, h))["pixels"] == (
        b"".join((b"\xff" * 3 if b else b"\x00" * 3) for b in bits)
    )
    p1 = pnm.decode_pnm(pnm.encode_pbm(bits, w, h, ascii_form=True))
    p4 = pnm.decode_pnm(pnm.encode_pbm(bits, w, h))
    assert p1 == p4
    assert (
        pnm.decode_pnm(pnm.encode_pnm(gray, w, h, channels=1))["pixels"]
        == gray
    )


@settings(max_examples=25, deadline=None)
@given(dims, st.binary(min_size=17 * 9 * 4, max_size=17 * 9 * 4))
def test_ico_and_rgba_roundtrip(wh, blob):
    w, h = wh
    px = blob[: w * h * 4]
    # QOI RGBA is exact for any alpha
    assert (
        qoi.decode_qoi(qoi.encode_qoi(px, w, h, channels=4))["pixels"]
        == px
    )
    assert (
        tga.decode_tga(tga.encode_tga(px, w, h, channels=4, rle=True))[
            "pixels"
        ]
        == px
    )
    # ICO: zero-alpha pixels are CANONICALIZED through the AND mask
    # (the stored color under a masked pixel is unspecified — our
    # encoder keeps it, so equality holds for our own streams)
    dec = ico.decode_ico(ico.encode_ico([(px, w, h)]))[0]
    assert dec["pixels"] == px
