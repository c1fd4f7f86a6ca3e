"""Progressive JPEG (SOF2, T.81 Annex G): the multi-scan decoder must
reconstruct EXACTLY the pixels the baseline path produces from the
same quantized coefficients (progressive transmission re-orders bits,
it does not change them), across grayscale / 4:4:4 / 4:2:0, odd
dimensions, and content shapes that exercise every scan code path
(EOB runs, ZRL inside refinement, dense coefficient spectra). The
Spark decode kernel routes progressive payloads with no plumbing
changes — pinned end-to-end against a driver-side decode."""

import hashlib

from thrivefinancedatapipeline_spark.multimodal import jpeg


def _det_bytes(n: int, seed: str) -> bytes:
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{c}".encode()).digest()
        c += 1
    return bytes(out[:n])


def _rgb(w: int, h: int) -> bytes:
    return bytes(
        ((x * 5 + y * 3 + c * 31) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_progressive_gray_bit_compatible_with_baseline():
    for w, h in [(8, 8), (24, 24), (35, 29), (17, 40)]:
        pix = _det_bytes(w * h, f"gray{w}x{h}")
        prog = jpeg.encode_jpeg_progressive(
            pix, w, h, quality=90, channels=1
        )
        base = jpeg.encode_jpeg(pix, w, h, quality=90)
        a = jpeg.decode_jpeg(prog)
        b = jpeg.decode_jpeg(base)
        assert (a["width"], a["height"]) == (w, h)
        assert a["pixels"] == b["pixels"], (w, h)
        # the color entrypoint routes the same stream identically
        c = jpeg.decode_jpeg_color(prog)
        assert c["channels"] == 1 and c["pixels"] == a["pixels"]


def test_progressive_color_444_and_420_bit_compatible():
    for w, h in [(16, 16), (21, 13), (33, 17)]:
        pix = _rgb(w, h)
        b444 = jpeg.decode_jpeg_color(jpeg.encode_jpeg_color(pix, w, h, 90))
        p444 = jpeg.decode_jpeg_color(
            jpeg.encode_jpeg_progressive(pix, w, h, 90)
        )
        assert p444["channels"] == 3
        assert p444["pixels"] == b444["pixels"], (w, h, "444")
        b420 = jpeg.decode_jpeg_color(jpeg.encode_jpeg_420(pix, w, h, 90))
        p420 = jpeg.decode_jpeg_color(
            jpeg.encode_jpeg_progressive(pix, w, h, 90, subsample_420=True)
        )
        assert p420["pixels"] == b420["pixels"], (w, h, "420")


def test_progressive_scan_codepaths_by_content():
    """Content shapes chosen to exercise specific Annex-G machinery:
    flat → long shared EOB runs; stripes → 16+ zero runs (ZRL in both
    first and refinement scans); md5 noise → dense spectra with
    correction bits on nearly every coefficient."""
    w = h = 40
    cases = {
        "flat": bytes([77]) * (w * h * 3),
        "stripes": bytes(
            (255 if (i // 3) % w < 2 else 0) for i in range(w * h * 3)
        ),
        "noise": _det_bytes(w * h * 3, "noise"),
    }
    for name, pix in cases.items():
        for q in (50, 90):
            b = jpeg.decode_jpeg_color(jpeg.encode_jpeg_color(pix, w, h, q))
            p = jpeg.decode_jpeg_color(
                jpeg.encode_jpeg_progressive(pix, w, h, q)
            )
            assert p["pixels"] == b["pixels"], (name, q, "444")
            b2 = jpeg.decode_jpeg_color(jpeg.encode_jpeg_420(pix, w, h, q))
            p2 = jpeg.decode_jpeg_color(
                jpeg.encode_jpeg_progressive(
                    pix, w, h, q, subsample_420=True
                )
            )
            assert p2["pixels"] == b2["pixels"], (name, q, "420")


def test_progressive_error_bound_vs_original():
    w = h = 40
    pix = bytes(
        min(255, (i % 120) * 2 + c) for i in range(w * h) for c in range(3)
    )
    dec = jpeg.decode_jpeg_color(
        jpeg.encode_jpeg_progressive(pix, w, h, quality=95)
    )
    err = max(abs(a - b) for a, b in zip(pix, dec["pixels"]))
    assert err <= 12  # smooth content at q95 reconstructs tightly


def test_progressive_error_surface():
    import pytest

    pix = _det_bytes(16 * 16, "surf")
    prog = jpeg.encode_jpeg_progressive(pix, 16, 16, channels=1)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(prog[:40])  # truncated marker stream
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(prog[:-40])  # truncated entropy data
    with pytest.raises(ValueError):
        jpeg.encode_jpeg_progressive(pix, 16, 16, channels=2)
    with pytest.raises(ValueError):
        jpeg.encode_jpeg_progressive(
            pix, 16, 16, channels=1, subsample_420=True
        )
    # a DRI that PROMISES restarts the stream doesn't contain fails
    # loudly (missing RST marker), not silently
    idx = prog.find(b"\xff\xda")
    with_dri = (
        prog[:idx] + b"\xff\xdd\x00\x04\x00\x02" + prog[idx:]
    )
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(with_dri)


def test_progressive_and_baseline_restart_intervals():
    """DRI/RSTm support end-to-end: streams encoded WITH restart
    markers decode pixel-identically to the same content without
    them, for every codec path (gray/444/420 x baseline/progressive)
    — restarts re-order bytes and reset predictors/EOB runs, they
    never change coefficients."""
    w, h = 33, 17
    gray = _det_bytes(w * h, "rst-gray")
    rgb = _rgb(w, h)
    for ri in (1, 2, 5):
        pairs = [
            (jpeg.encode_jpeg(gray, w, h, 90, restart_interval=ri),
             jpeg.encode_jpeg(gray, w, h, 90)),
            (jpeg.encode_jpeg_color(rgb, w, h, 90, restart_interval=ri),
             jpeg.encode_jpeg_color(rgb, w, h, 90)),
            (jpeg.encode_jpeg_420(rgb, w, h, 90, restart_interval=ri),
             jpeg.encode_jpeg_420(rgb, w, h, 90)),
            (jpeg.encode_jpeg_progressive(
                gray, w, h, 90, channels=1, restart_interval=ri),
             jpeg.encode_jpeg_progressive(gray, w, h, 90, channels=1)),
            (jpeg.encode_jpeg_progressive(
                rgb, w, h, 90, restart_interval=ri),
             jpeg.encode_jpeg_progressive(rgb, w, h, 90)),
            (jpeg.encode_jpeg_progressive(
                rgb, w, h, 90, subsample_420=True, restart_interval=ri),
             jpeg.encode_jpeg_progressive(
                 rgb, w, h, 90, subsample_420=True)),
        ]
        for with_rst, without in pairs:
            a = jpeg.decode_jpeg_color(with_rst)
            b = jpeg.decode_jpeg_color(without)
            assert a["pixels"] == b["pixels"], ri
        # the restart stream really contains RST markers
        assert any(
            bytes((0xFF, 0xD0 + m)) in pairs[0][0] for m in range(8)
        )


def test_spark_decode_kernel_routes_progressive_payloads(spark):
    """The mapInPandas decode kernel (fake=False) handles progressive
    payloads through the same decode_jpeg_color router — dims and
    checksums match a driver-side decode of the same bytes."""
    import zlib

    from thrivefinancedatapipeline_spark.multimodal import binary_ops as mm

    rows = []
    for i, (w, h) in enumerate([(16, 16), (21, 13), (24, 24)]):
        pix = _rgb(w, h)
        rows.append(
            (i, bytearray(jpeg.encode_jpeg_progressive(pix, w, h, 90)))
        )
        gray = _det_bytes(w * h, f"g{i}")
        rows.append(
            (
                100 + i,
                bytearray(
                    jpeg.encode_jpeg_progressive(
                        gray, w, h, 90, channels=1
                    )
                ),
            )
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in mm.decode_stub(df, fake=False).collect()}
    assert len(out) == len(rows)
    for doc_id, payload in rows:
        img = jpeg.decode_jpeg_color(bytes(payload))
        r = out[doc_id]
        assert (r.width, r.height) == (img["width"], img["height"])
        assert r.checksum == zlib.crc32(img["pixels"])


def test_full_sampling_factor_family():
    """T.81 sampling factors 1..4 end-to-end: encode_jpeg_subsampled
    generalizes 4:2:0 to the whole family (4:1:1 = (4,1) — the
    DV/camera layout — plus tall/wide exotics), the decoder handles
    any pair, progressive at the same factors decodes pixel-EXACTLY
    equal to baseline (same coefficients), and restarts compose."""
    w, h = 37, 29
    pix = bytes(
        min(255, (x + y) * 2 + c * 5)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    for lf in [(2, 1), (4, 1), (1, 4), (4, 2), (4, 4), (3, 2)]:
        enc = jpeg.encode_jpeg_subsampled(pix, w, h, 92, luma_factors=lf)
        dec = jpeg.decode_jpeg_color(enc)
        assert (dec["width"], dec["height"]) == (w, h)
        err = max(abs(a - b) for a, b in zip(pix, dec["pixels"]))
        assert err <= 16, (lf, err)  # smooth content reconstructs
        prog = jpeg.decode_jpeg_color(
            jpeg.encode_jpeg_progressive(pix, w, h, 92, luma_factors=lf)
        )
        assert prog["pixels"] == dec["pixels"], lf
        # restarts change bytes, never pixels
        rst = jpeg.decode_jpeg_color(
            jpeg.encode_jpeg_subsampled(
                pix, w, h, 92, luma_factors=lf, restart_interval=2
            )
        )
        assert rst["pixels"] == dec["pixels"], lf
    # (2,2) through the generic path == the proven encode_jpeg_420
    a = jpeg.decode_jpeg_color(
        jpeg.encode_jpeg_subsampled(pix, w, h, 90, luma_factors=(2, 2))
    )
    b = jpeg.decode_jpeg_color(jpeg.encode_jpeg_420(pix, w, h, 90))
    assert a["pixels"] == b["pixels"]
    # factors > 4 stay gated
    import pytest

    with pytest.raises(ValueError):
        jpeg.encode_jpeg_subsampled(pix, w, h, 90, luma_factors=(5, 1))
