"""ICO container: DIB-vs-PNG storage parity (same RGBA either way —
the reorder-only principle applied to a CONTAINER), AND-mask
semantics, multi-frame directories, and the error/gate surface."""

import hashlib
import struct

import pytest

from thrivefinancedatapipeline_spark.multimodal import ico


def _rgba(w, h, seed="ico"):
    out = bytearray()
    i = 0
    while len(out) < w * h * 4:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    px = bytearray(out[: w * h * 4])
    # avoid accidental alpha-0 pixels so DIB round trips exactly
    # (alpha 0 is the AND-mask transparency case tested separately)
    for j in range(3, len(px), 4):
        px[j] = px[j] or 1
    return bytes(px)


def test_multiframe_roundtrip_and_png_dib_parity():
    frames = [(_rgba(9, 7), 9, 7), (_rgba(16, 16, "b"), 16, 16)]
    # same frames stored as DIB vs as embedded PNG decode IDENTICAL
    as_dib = ico.decode_ico(ico.encode_ico(frames))
    as_png = ico.decode_ico(ico.encode_ico(frames, png_frames=frozenset({0, 1})))
    assert as_dib == as_png
    for (px, w, h), f in zip(frames, as_dib):
        assert (f["width"], f["height"], f["channels"]) == (w, h, 4)
        assert f["pixels"] == px
    # mixed storage in one directory
    mixed = ico.decode_ico(ico.encode_ico(frames, png_frames=frozenset({1})))
    assert mixed == as_dib


def test_and_mask_forces_transparency():
    # alpha-0 pixels must come back alpha-0 (mirrored into the AND
    # mask), and the mask overrides a nonzero alpha byte when a
    # pre-alpha writer crafted the stream
    w, h = 5, 2
    px = bytearray(_rgba(w, h))
    px[3] = 0  # first pixel fully transparent
    d = ico.decode_ico(ico.encode_ico([(bytes(px), w, h)]))[0]
    assert d["pixels"][3] == 0
    assert d["pixels"][7] != 0
    # hand-set an AND bit over an opaque pixel: decoder must honor it
    data = bytearray(ico.encode_ico([(_rgba(w, h), w, h)]))
    and_off = 6 + 16 + 40 + w * h * 4  # dir + entry + hdr + XOR
    data[and_off] |= 0x40  # mask bit for x=1 of the BOTTOM row
    d2 = ico.decode_ico(bytes(data))[0]
    assert d2["pixels"][((h - 1) * w + 1) * 4 + 3] == 0


def test_ico_error_surface_and_gates():
    good = ico.encode_ico([(_rgba(4, 4), 4, 4)])
    with pytest.raises(ValueError):
        ico.decode_ico(b"\x00\x00\x03\x00")  # bad type
    with pytest.raises(ValueError):
        # CUR decodes for real since r10 — but never through the ICO
        # entry point (magic mismatch is corrupt, not a gate)
        ico.decode_ico(b"\x00\x00\x02\x00\x01\x00" + good[6:])
    with pytest.raises(ValueError):
        ico.decode_ico(good[:20])  # truncated directory/frame
    with pytest.raises(ValueError):
        ico.decode_ico(good[:-8])  # frame outside file
    with pytest.raises(ValueError):
        ico.encode_ico([])
    with pytest.raises(ValueError):
        ico.encode_ico([(b"\x00" * 12, 2, 2)])  # RGB, not RGBA
    with pytest.raises(ValueError):
        ico.encode_ico([(_rgba(300, 1), 300, 1)])  # > 256
    # paletted DIB decodes since r11 — a depth claim without the
    # palette bytes is now corrupt (truncated palette), and truly
    # unsupported depths keep a principled gate
    bad = bytearray(good)
    struct.pack_into("<H", bad, 6 + 16 + 14, 8)  # biBitCount = 8
    with pytest.raises(ValueError):
        ico.decode_ico(bytes(bad))
    bad2 = bytearray(good)
    struct.pack_into("<H", bad2, 6 + 16 + 14, 2)  # biBitCount = 2
    with pytest.raises(NotImplementedError):
        ico.decode_ico(bytes(bad2))


def test_decode_kernel_selects_largest_ico_frame():
    import zlib

    import pandas as pd

    from thrivefinancedatapipeline_spark.multimodal.binary_ops import (
        decode_image_batch,
    )

    small, big = _rgba(4, 4, "s"), _rgba(12, 9, "l")
    payload = ico.encode_ico([(small, 4, 4), (big, 12, 9)])
    out = decode_image_batch(pd.Series([payload]))
    assert (out["width"][0], out["height"][0]) == (12, 9)
    assert out["checksum"][0] == zlib.crc32(big)


def test_cur_roundtrip_hotspots_and_errors():
    """CUR (r10): the cursor container round-trips frames AND
    hotspots; hotspot bounds are enforced both ways."""
    frames = [
        (_rgba(8, 6, "c1"), 8, 6, 3, 2),
        (_rgba(4, 4, "c2"), 4, 4, 0, 3),
    ]
    data = ico.encode_cur(frames)
    assert ico.is_cur(data) and not ico.is_ico(data)
    dec = ico.decode_cur(data)
    for (px, w, h, hx, hy), f in zip(frames, dec):
        assert (f["width"], f["height"]) == (w, h)
        assert f["pixels"] == px
        assert (f["hotspot_x"], f["hotspot_y"]) == (hx, hy)
    with pytest.raises(ValueError):
        ico.encode_cur([(_rgba(4, 4), 4, 4, 4, 0)])  # hotspot x == w
    with pytest.raises(ValueError):
        ico.decode_cur(ico.encode_ico([(_rgba(4, 4), 4, 4)]))  # ICO
    # a crafted out-of-bounds hotspot is corrupt on decode too
    bad = bytearray(data)
    import struct as _s

    _s.pack_into("<HH", bad, 6 + 4, 99, 0)
    with pytest.raises(ValueError):
        ico.decode_cur(bytes(bad))


def test_redundant_color_table_skipped():
    # a 24/32-bpp DIB frame may legally carry a redundant "optimal
    # palette" color table (biClrUsed RGBQUADs) before the XOR raster;
    # the decoder must skip it, not misread the raster from palette
    # bytes (and must reject an absurd biClrUsed)
    w, h = 4, 4
    frames = [(_rgba(w, h), w, h)]
    good = ico.encode_ico(frames)
    want = ico.decode_ico(good)
    n_pal = 16
    hdr_off = 6 + 16
    padded = bytearray(good[: hdr_off + 40])
    struct.pack_into("<I", padded, hdr_off + 32, n_pal)  # biClrUsed
    padded += b"\xde\xad\xbe\xef" * n_pal  # palette junk
    padded += good[hdr_off + 40 :]  # XOR + AND rasters
    struct.pack_into("<I", padded, 6 + 8, len(padded) - hdr_off)  # dwBytesInRes
    assert ico.decode_ico(bytes(padded)) == want
    bad = bytearray(good)
    struct.pack_into("<I", bad, hdr_off + 32, 300)  # > 256 entries
    with pytest.raises(ValueError):
        ico.decode_ico(bytes(bad))


def _quantized(w, h, n_colors, seed="pal"):
    # RGBA content with exactly n_colors distinct colors, alpha 255
    palette = [
        tuple(hashlib.md5(f"{seed}:c{c}".encode()).digest()[:3])
        for c in range(n_colors)
    ]
    px = bytearray()
    for i in range(w * h):
        v = hashlib.md5(f"{seed}:p{i}".encode()).digest()[0]
        r, g, b = palette[v % n_colors]
        px.extend((r, g, b, 255))
    return bytes(px)


def test_paletted_dib_parity_all_depths():
    """Paletted storage only RE-INDEXES colors: the same content
    stored 32-bpp vs 8/4/1-bpp paletted must decode pixel-EQUAL
    (the strongest oracle — reorder-only format features)."""
    for bpp, n_colors, w, h in ((8, 200, 9, 7), (4, 16, 8, 5), (1, 2, 17, 3)):
        px = _quantized(w, h, n_colors, seed=f"pal{bpp}")
        as_32 = ico.decode_ico(ico.encode_ico([(px, w, h)]))
        as_pal = ico.decode_ico(
            ico.encode_ico([(px, w, h)], paletted={0: bpp})
        )
        assert as_pal == as_32, f"{bpp}-bpp paletted mismatch"
        assert as_pal[0]["pixels"] == px
    # mixed directory: paletted + 32-bpp + PNG frames coexist
    f1, f2, f3 = (
        (_quantized(6, 6, 16, "m1"), 6, 6),
        (_rgba(5, 4, "m2"), 5, 4),
        (_rgba(4, 4, "m3"), 4, 4),
    )
    mixed = ico.decode_ico(
        ico.encode_ico([f1, f2, f3], png_frames=frozenset({2}),
                       paletted={0: 4})
    )
    plain = ico.decode_ico(ico.encode_ico([f1, f2, f3]))
    assert mixed == plain


def test_paletted_dib_and_mask_transparency():
    # transparency in paletted frames travels ONLY via the AND mask
    w, h = 5, 3
    px = bytearray(_quantized(w, h, 4, "palt"))
    px[3] = 0  # first pixel transparent
    d = ico.decode_ico(ico.encode_ico([(bytes(px), w, h)], paletted={0: 4}))[0]
    assert d["pixels"][3] == 0 and d["pixels"][:3] == bytes(px[:3])
    assert d["pixels"][7] == 255


def test_paletted_dib_encode_errors():
    w, h = 4, 4
    with pytest.raises(ValueError):  # too many colors for the depth
        ico.encode_ico([(_quantized(w, h, 9, "e1"), w, h)], paletted={0: 1})
    partial = bytearray(_quantized(w, h, 4, "e2"))
    partial[3] = 128  # partial alpha can't survive a palette
    with pytest.raises(ValueError):
        ico.encode_ico([(bytes(partial), w, h)], paletted={0: 8})
    with pytest.raises(ValueError):  # bad depth
        ico.encode_ico([(_quantized(w, h, 2, "e3"), w, h)], paletted={0: 2})


def test_paletted_dib_truncated_palette_and_bad_index():
    w, h = 4, 4
    good = ico.encode_ico([(_quantized(w, h, 4, "t1"), w, h)], paletted={0: 4})
    hdr_off = 6 + 16
    with pytest.raises(ValueError):  # palette cut off mid-table
        ico.decode_ico(good[: hdr_off + 40 + 2])
    # an index >= biClrUsed is corrupt, not silently black
    bad = bytearray(good)
    n_pal = struct.unpack_from("<I", bad, hdr_off + 32)[0]
    assert 0 < n_pal <= 4
    # 4-bpp: first XOR byte holds pixels 0-1 of the BOTTOM row
    bad[hdr_off + 40 + 4 * n_pal] = 0xFF  # index 15 > palette size
    with pytest.raises(ValueError):
        ico.decode_ico(bytes(bad))
