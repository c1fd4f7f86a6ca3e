"""Multimodal plumbing: frame sampling, resize, audio features — the
batch shapes are real even though the codecs are deterministic fakes."""

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.multimodal import binary_ops as mm


def _payloads(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return mm.with_binary_payload(docs)


def test_frame_sample_fans_out_and_is_deterministic(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    a = mm.frame_sample(p, every_n=4).orderBy("doc_id", "frame_idx").collect()
    b = mm.frame_sample(p, every_n=4).orderBy("doc_id", "frame_idx").collect()
    assert a == b
    assert len(a) >= p.count()          # every doc yields >= 1 frame
    assert all(r.frame_idx % 4 == 0 for r in a)
    assert all(0 < r.frame_bytes <= mm.FRAME_SIZE for r in a)


def test_frame_sample_rate_monotone(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    dense = mm.frame_sample(p, every_n=2).count()
    sparse = mm.frame_sample(p, every_n=8).count()
    assert dense >= sparse


def test_resize_preserves_rows(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    decoded = mm.decode_stub(p, fake=True)
    resized = mm.resize_stub(decoded, 224, 224)
    rows = resized.collect()
    assert len(rows) == p.count()
    assert all(r.width == 224 and r.height == 224 for r in rows)


def test_audio_energy_windows_cover_payload(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    out = mm.audio_energy(p).join(
        p.select("doc_id", F.octet_length("payload").alias("n_bytes")),
        "doc_id",
    )
    for r in out.collect():
        expected = max(1, -(-r.n_bytes // mm.AUDIO_WINDOW))
        assert r.n_windows == expected
        assert len(r.energy) == r.n_windows
        assert all(e >= 0.0 for e in r.energy)


def test_png_codec_roundtrips_every_filter_and_color_type():
    from thrivefinancedatapipeline_spark.multimodal import png

    w, h = 13, 9
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        pix = bytes(
            (x * 5 + y * 17 + c * 29) & 0xFF
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )
        decoded = []
        for ft in range(5):
            enc = png.encode_png(pix, w, h, color_type=ct, filter_type=ft)
            img = png.decode_png(enc)
            assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
            decoded.append(img["pixels"])
        # filters 1-4 must reconstruct the same pixels as the trivially
        # correct filter-0 path — the branches cross-validate
        assert all(p == pix for p in decoded)


def test_decode_kernel_runs_real_png_bytes(spark, sf_dir):
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import png

    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = mm.decode_stub(mm.png_payloads(docs), fake=False).collect()
    assert len(out) == docs.count()
    # verify one row end-to-end against a driver-side decode
    row = min(out, key=lambda r: r.doc_id)
    d = docs.filter(F.col("doc_id") == row.doc_id).collect()[0]
    stride = mm.PNG_WIDTH * 3
    raw = d.text.encode("utf-8")
    height = max(1, min(64, -(-len(raw) // stride)))
    buf = (raw + b"\x00" * (stride * height))[: stride * height]
    assert (row.width, row.height) == (mm.PNG_WIDTH, height)
    assert row.checksum == zlib.crc32(buf)


def test_decode_gate_still_armed_for_non_png(spark, sf_dir):
    import pandas as pd
    import pytest

    # WebP-ish RIFF container: not WAVE, not PNG/GIF/JPEG — gate holds
    with pytest.raises(NotImplementedError):
        mm.decode_image_batch(pd.Series([b"RIFF\x00\x00\x00\x00WEBPVP8 "]))
    # jpeg-ish bytes now route to the REAL decoder, which rejects the
    # corrupt stream with the documented ValueError instead of faking
    with pytest.raises(ValueError):
        mm.decode_image_batch(pd.Series([b"\xff\xd8\xff jpeg-ish"]))
    # and through the Spark kernel too
    p = _payloads(spark, sf_dir)  # utf-8 text bytes, not PNG
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        mm.decode_stub(p, fake=False).collect()


def _real_lzw_encode(indices, min_code=8):
    """Growing-dictionary GIF-LZW compressor (test-only) — exercises
    the decoder's dictionary-growth and KwKwK paths that the
    clear-per-symbol production encoder never hits. Emits a CLEAR
    whenever the dictionary nears the 9-bit boundary so the code width
    stays constant (sidesteps the early-vs-deferred width-change
    ambiguity while still growing the dictionary up to 511 entries)."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    codes = [clear]
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
        else:
            codes.append(table[w])
            table[wk] = next_code
            next_code += 1
            w = bytes([b])
            if next_code >= (1 << (min_code + 1)) - 1:
                codes.append(clear)
                table = fresh()
                next_code = end + 1
                # w keeps the pending single byte; it's in the fresh table
    if w:
        codes.append(table[w])
    codes.append(end)
    # repack with the same width schedule the decoder uses
    acc = nbits = 0
    stream = bytearray()
    size = min_code + 1
    for code in codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def test_gif_codec_roundtrips(spark, sf_dir):
    from thrivefinancedatapipeline_spark.multimodal import gif

    for w, h, pat in [(4, 3, "ramp"), (16, 8, "repeat"), (255, 2, "mix")]:
        n = w * h
        if pat == "ramp":
            idx = bytes(i % 256 for i in range(n))
        elif pat == "repeat":
            idx = bytes([7, 7, 7, 9] * (n // 4) + [7] * (n % 4))
        else:
            idx = bytes((i * 31 + (i >> 3)) % 256 for i in range(n))
        img = gif.decode_gif(gif.encode_gif(idx, w, h))
        assert (img["width"], img["height"]) == (w, h)
        want = b"".join(gif.PALETTE[3 * i : 3 * i + 3] for i in idx)
        assert img["pixels"] == want


def test_gif_lzw_decoder_handles_growing_dictionary():
    """The production encoder pins the code width via clear-per-symbol;
    feed the decoder a REAL growing-dictionary stream (incl. highly
    repetitive input that triggers the KwKwK special case)."""
    from thrivefinancedatapipeline_spark.multimodal import gif

    for indices in (
        bytes([5] * 500),                      # KwKwK immediately
        bytes(i % 17 for i in range(2000)),    # steady growth
        bytes([3, 3, 1, 1, 3, 3, 3, 1] * 100),
    ):
        data = _real_lzw_encode(indices)
        assert gif._lzw_decode(8, data)[: len(indices)] == indices


def test_gif_corrupt_inputs_raise_valueerror_not_keyerror():
    """Error surface contract: every corrupt-payload path raises the
    documented ValueError — never a bare KeyError/IndexError leaking
    from the table lookup or sub-block reads."""
    import pytest

    from thrivefinancedatapipeline_spark.multimodal import gif

    good = gif.encode_gif(bytes(range(64)), 8, 8)

    # dictionary code immediately after CLEAR (prev is None): pack
    # [CLEAR, 300] at 9 bits — 300 is not in the fresh table
    bad_first = bytearray()
    acc, nbits = 0, 0
    for code in (256, 300):
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            bad_first.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bad_first.append(acc & 0xFF)
    with pytest.raises(ValueError, match="corrupt LZW"):
        gif._lzw_decode(8, bytes(bad_first))

    truncations = [
        good[:10],               # header cut inside the screen desc
        good[: 13 + 3 * 256 + 5],  # cut inside the image descriptor
        good[:-20],              # cut inside the LZW sub-blocks
    ]
    for payload in truncations:
        with pytest.raises(ValueError):
            gif.decode_gif(payload)
    with pytest.raises(ValueError):
        gif.decode_gif(b"GIF89a\x01")  # shorter than any valid header


def test_decode_kernel_runs_real_gif_bytes(spark, sf_dir):
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import gif

    docs = load_table(spark, sf_dir, "documents").limit(30)
    out = mm.decode_stub(mm.gif_payloads(docs), fake=False).collect()
    assert len(out) == docs.count()
    row = min(out, key=lambda r: r.doc_id)
    d = docs.filter(F.col("doc_id") == row.doc_id).collect()[0]
    raw = d.text.encode("utf-8")
    height = max(1, min(64, -(-len(raw) // mm.PNG_WIDTH)))
    buf = (raw + b"\x00" * (mm.PNG_WIDTH * height))[: mm.PNG_WIDTH * height]
    rgb = b"".join(gif.PALETTE[3 * i : 3 * i + 3] for i in buf)
    assert (row.width, row.height) == (mm.PNG_WIDTH, height)
    assert row.checksum == zlib.crc32(rgb)


def test_wav_codec_roundtrips_and_error_surface():
    from thrivefinancedatapipeline_spark.multimodal import wav

    for samples in (
        [0, 1, -1, 32767, -32768],
        list(range(-500, 500, 7)),
        [],
    ):
        data = wav.encode_wav(samples, sample_rate=8_000)
        dec = wav.decode_wav(data)
        assert dec["samples"] == samples
        assert dec["n_channels"] == 1
        assert dec["sampwidth"] == 2
        assert dec["framerate"] == 8_000
        assert dec["n_frames"] == len(samples)

    import pytest

    with pytest.raises(ValueError):
        wav.decode_wav(b"not audio at all")
    good = wav.encode_wav([1, 2, 3, 4])
    with pytest.raises(ValueError):
        wav.decode_wav(good[:30])  # truncated header/frames


def test_audio_energy_real_wav_path(spark, sf_dir):
    """audio_energy over REAL WAV payloads: windowed sum-of-squares of
    the exact PCM samples (which are the text's utf-8 bytes) — the
    decode gate stays armed (fake=False) so any non-WAV byte stream
    would raise instead of silently faking."""
    from thrivefinancedatapipeline_spark.datamodel import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = mm.audio_energy(mm.wav_payloads(docs), fake=False).collect()
    by_id = {r.doc_id: r for r in out}
    for d in docs.collect():
        raw = d.text.encode("utf-8")
        want = [
            float(sum(x * x for x in raw[i : i + mm.AUDIO_WINDOW]))
            for i in range(0, max(len(raw), 1), mm.AUDIO_WINDOW)
        ]
        row = by_id[d.doc_id]
        assert row.n_windows == len(want)
        assert list(row.energy) == want


def test_wav_roundtrip_property():
    """Hypothesis: any int16 sample vector round-trips bit-exact
    through the stdlib PCM codec (encode -> decode identity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from thrivefinancedatapipeline_spark.multimodal import wav

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), max_size=400
        ),
        st.sampled_from([8_000, 16_000, 44_100]),
    )
    def check(samples, rate):
        dec = wav.decode_wav(wav.encode_wav(samples, sample_rate=rate))
        assert dec["samples"] == samples
        assert dec["framerate"] == rate
        assert dec["n_frames"] == len(samples)

    check()


def test_gif_roundtrip_property():
    """Hypothesis: any index buffer round-trips through encode_gif /
    decode_gif with palette mapping applied (covers arbitrary widths,
    heights, and repetitive content that stresses the LZW reset
    path)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from thrivefinancedatapipeline_spark.multimodal import gif

    @settings(max_examples=25, deadline=None)
    @given(st.data())
    def check(data):
        w = data.draw(st.integers(min_value=1, max_value=40))
        h = data.draw(st.integers(min_value=1, max_value=12))
        idx = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=w * h,
                    max_size=w * h,
                )
            )
        )
        img = gif.decode_gif(gif.encode_gif(idx, w, h))
        assert (img["width"], img["height"]) == (w, h)
        want = b"".join(gif.PALETTE[3 * i : 3 * i + 3] for i in idx)
        assert img["pixels"] == want

    check()


def test_resize_nn_real_kernel(spark, sf_dir):
    """Real nearest-neighbor resize over decoded PNG payloads:
    identity resize returns the original pixels bit-exact, and a
    downsample matches an independent reference loop on the driver."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import png

    docs = load_table(spark, sf_dir, "documents").limit(15)
    payloads = mm.png_payloads(docs)

    # identity: same target dims -> crc of the original pixel buffer
    rows_id = {r.doc_id: r for r in mm.resize_nn(payloads, mm.PNG_WIDTH, 1).collect()}
    # independent reference on the driver
    by_id = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    for doc_id, data in by_id.items():
        img = png.decode_png(data)
        w, h, ch = img["width"], img["height"], img["channels"]
        # reference NN loop written independently of resize_pixels_nn
        tw, th = mm.PNG_WIDTH, 1
        ref = bytearray()
        for y in range(th):
            for x in range(tw):
                sy, sx = (y * h) // th, (x * w) // tw
                base = (sy * w + sx) * ch
                ref += img["pixels"][base : base + ch]
        r = rows_id[doc_id]
        assert (r.width, r.height) == (tw, th)
        assert r.checksum == zlib.crc32(bytes(ref))

    # full-size identity returns the original buffer exactly
    one = docs.limit(1)
    p1 = mm.png_payloads(one).collect()[0]
    img = png.decode_png(bytes(p1.payload))
    same = mm.resize_pixels_nn(
        img["pixels"], img["width"], img["height"],
        img["width"], img["height"], img["channels"],
    )
    assert same == img["pixels"]


def test_gif_animation_roundtrip_and_real_frame_sampling(spark, sf_dir):
    """Multi-frame GIF: every encoded frame decodes back bit-exact
    through the shared container, and the real frame sampler keeps
    exactly the every-Nth frames with checksums of the DECODED RGB of
    each sampled frame."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import gif

    # codec-level: rotated frames round-trip in order
    base = bytes((i * 7 + 3) % 256 for i in range(8 * 4))
    frames = [base[k:] + base[:k] for k in range(5)]
    data = gif.encode_gif_animation(frames, 8, 4)
    decoded = gif.decode_gif_frames(data)
    assert len(decoded) == 5
    for want_idx, f in zip(frames, decoded):
        want = b"".join(gif.PALETTE[3 * i : 3 * i + 3] for i in want_idx)
        assert (f["width"], f["height"]) == (8, 4)
        assert f["pixels"] == want
    # decode_gif (single-frame API) = frame 0
    first = gif.decode_gif(data)
    assert first["pixels"] == decoded[0]["pixels"]

    # kernel-level: sample every 2nd frame of 6 across the corpus
    docs = load_table(spark, sf_dir, "documents").limit(10)
    anim = mm.gif_animation_payloads(docs, n_frames=6)
    rows = mm.frame_sample_gif(anim, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d.doc_id for d in docs.collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in anim.collect()}
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rs] == [0, 2, 4]
        all_frames = gif.decode_gif_frames(payloads[doc_id])
        assert len(all_frames) == 6
        for r in rs:
            f = all_frames[r.frame_idx]
            assert (r.width, r.height) == (f["width"], f["height"])
            assert r.checksum == zlib.crc32(f["pixels"])


def test_jpeg_codec_roundtrip_error_bounds():
    """Baseline JPEG is lossy by construction: pin structure exactly
    (dims, marker layout survives decode) and bound reconstruction
    error at high quality — smooth and block-aligned content under
    ~2 levels, noisy non-multiple-of-8 content under ~16 at q=90."""
    from thrivefinancedatapipeline_spark.multimodal import jpeg

    cases = [
        ("flat", 16, 16, bytes([128] * 256), 1),
        (
            "ramp", 16, 8,
            bytes((y * 16 + x * 3) % 256 for y in range(8) for x in range(16)),
            4,
        ),
        (
            "blocks", 24, 24,
            bytes(
                255 if (x // 8 + y // 8) % 2 else 0
                for y in range(24) for x in range(24)
            ),
            2,
        ),
        (
            "noise13x9", 13, 9,
            bytes((x * 29 + y * 17) % 256 for y in range(9) for x in range(13)),
            16,
        ),
    ]
    for name, w, h, pix, bound in cases:
        img = jpeg.decode_jpeg(jpeg.encode_jpeg(pix, w, h, quality=90))
        assert (img["width"], img["height"]) == (w, h), name
        assert len(img["pixels"]) == w * h
        err = max(abs(a - b) for a, b in zip(pix, img["pixels"]))
        assert err <= bound, (name, err)


def test_jpeg_error_surface_and_gates():
    import pytest

    from thrivefinancedatapipeline_spark.multimodal import jpeg

    good = jpeg.encode_jpeg(bytes(range(64)), 8, 8)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[:20])  # truncated in the marker stream
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[:-30])  # truncated entropy data
    # a baseline stream with its SOF0 flipped to SOF2 is now a CORRUPT
    # progressive stream (baseline SOS has Ss=0, Se=63 — a progressive
    # scan may not mix DC and AC), not an unimplemented feature
    idx = good.find(b"\xff\xc0")
    prog = good[:idx] + b"\xff\xc2" + good[idx + 2 :]
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(prog)


def test_decode_kernel_runs_real_jpeg_bytes(spark, sf_dir):
    """The Spark decode kernel handles JPEG payloads with the real
    codec (fake=False): dims match the writer's layout and the
    checksum equals a driver-side decode of the same payload."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import jpeg

    docs = load_table(spark, sf_dir, "documents").limit(20)
    payloads = mm.jpeg_payloads(docs)
    out = {r.doc_id: r for r in mm.decode_stub(payloads, fake=False).collect()}
    assert len(out) == docs.count()
    for p in payloads.collect():
        img = jpeg.decode_jpeg(bytes(p.payload))
        r = out[p.doc_id]
        assert (r.width, r.height) == (img["width"], img["height"])
        assert r.width == mm.PNG_WIDTH
        assert r.checksum == zlib.crc32(img["pixels"])


def test_avi_container_roundtrip_property():
    """Hypothesis: the RIFF/AVI container is byte-transparent — any
    list of frame payloads (arbitrary bytes, including odd lengths
    that force pad bytes) comes back verbatim and in order from
    avi_frame_chunks(encode_avi_mjpeg(...))."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from thrivefinancedatapipeline_spark.multimodal import avi

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.binary(max_size=200), max_size=8),
        st.sampled_from([1, 10, 30]),
    )
    def check(frames, fps):
        data = avi.encode_avi_mjpeg(frames, 16, 4, fps=fps)
        assert avi.is_avi(data)
        assert avi.avi_frame_chunks(data) == frames
        if frames:
            assert avi.avi_frame_chunks(data, max_frames=1) == frames[:1]

    check()


def test_avi_corrupt_inputs_raise_valueerror():
    """Error surface: truncated/garbage containers raise ValueError
    ('corrupt AVI container'), never struct.error/IndexError."""
    import pytest

    from thrivefinancedatapipeline_spark.multimodal import avi

    good = avi.encode_avi_mjpeg([b"abc", b"defgh"], 8, 4)
    assert avi.avi_frame_chunks(good) == [b"abc", b"defgh"]
    for bad in (
        b"",
        b"RIFF\x00\x00\x00",
        b"RIFX" + good[4:],
        good[:30],                      # truncated inside hdrl
        good[:-3],                      # truncated inside idx1
        good[:16] + b"\xff\xff\xff\xff" + good[20:],  # size overruns
    ):
        with pytest.raises(ValueError):
            avi.avi_frame_chunks(bad)


def test_avi_mjpeg_real_video_frame_sampling(spark, sf_dir):
    """End-to-end REAL video path: MJPEG frames inside a RIFF/AVI
    container, decoded by the stdlib JPEG codec. The kernel keeps
    exactly the every-Nth frames, skipping the DCT for dropped frames,
    and its checksums equal a driver-side decode of the same chunks."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import avi, jpeg

    docs = load_table(spark, sf_dir, "documents").limit(10)
    vids = mm.avi_payloads(docs, n_frames=5)
    rows = mm.frame_sample_avi(vids, every_n=2).collect()
    payloads = {r.doc_id: bytes(r.payload) for r in vids.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(payloads)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rs] == [0, 2, 4]
        chunks = avi.avi_frame_chunks(payloads[doc_id])
        assert len(chunks) == 5
        for r in rs:
            img = jpeg.decode_jpeg(chunks[r.frame_idx])
            assert (r.width, r.height) == (img["width"], img["height"])
            assert r.width == mm.PNG_WIDTH
            assert r.checksum == zlib.crc32(img["pixels"])


def test_jpeg_color_codec_roundtrip_and_gray_parity():
    """4:4:4 YCbCr color JPEG: structure pinned exactly, per-channel
    reconstruction error bounded (smooth <=3, noisy <=20 at q=90-95 —
    the color transform adds ~1 LSB over the gray bounds), and the
    color decoder reproduces the legacy gray decoder bit-for-bit on
    single-component streams."""
    import math

    from thrivefinancedatapipeline_spark.multimodal import jpeg

    w, h = 16, 8
    smooth = bytes(
        int(128 + 100 * math.sin((i % w) / 6) * math.cos((i // w) / 5))
        for i in range(w * h)
        for _ in range(3)
    )
    d = jpeg.encode_jpeg_color(smooth, w, h, quality=90)
    img = jpeg.decode_jpeg_color(d)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert len(img["pixels"]) == w * h * 3
    assert max(abs(a - b) for a, b in zip(smooth, img["pixels"])) <= 3

    noisy = bytes(((i * 7 + c * 31) % 256)
                  for i in range(w * h) for c in range(3))
    img2 = jpeg.decode_jpeg_color(
        jpeg.encode_jpeg_color(noisy, w, h, quality=95)
    )
    assert max(abs(a - b) for a, b in zip(noisy, img2["pixels"])) <= 20

    gray = bytes((i * 5) % 256 for i in range(w * h))
    gd = jpeg.encode_jpeg(gray, w, h, quality=95)
    legacy = jpeg.decode_jpeg(gd)
    via_color = jpeg.decode_jpeg_color(gd)
    assert via_color["channels"] == 1
    assert via_color["pixels"] == legacy["pixels"]


def test_jpeg_color_subsampling_gate():
    """Error surface: sampling factors outside 1..4 (and subsampled
    single-component streams) hit the explicit NotImplementedError
    gate, not a misdecode — the whole 1..4 family is a REAL decode
    path now (r7)."""
    import pytest

    from thrivefinancedatapipeline_spark.multimodal import jpeg

    rgb = bytes((i % 256) for i in range(16 * 8 * 3))
    d = bytearray(jpeg.encode_jpeg_color(rgb, 16, 8))
    sof = d.find(b"\xff\xc0")
    assert sof > 0
    # body starts after marker(2)+len(2): prec,h,h,w,w,ncomp then
    # comp0 = id, sampling, tq — sampling is body[7] = d[sof+4+7]
    assert d[sof + 4 + 7] == 0x11
    d[sof + 4 + 7] = 0x51  # h=5: beyond the T.81 1..4 factor range
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg_color(bytes(d))

    gray = bytes((i % 256) for i in range(16 * 8))
    g = bytearray(jpeg.encode_jpeg(gray, 16, 8))
    sof = g.find(b"\xff\xc0")
    assert g[sof + 4 + 7] == 0x11
    g[sof + 4 + 7] = 0x22  # subsampled single-component: gated
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg_color(bytes(g))


def test_decode_kernel_runs_real_color_jpeg_bytes(spark, sf_dir):
    """The Spark decode kernel handles COLOR JPEG payloads with the
    real 4:4:4 codec: dims match the writer's layout and the checksum
    equals a driver-side decode of the same payload's RGB buffer."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import jpeg

    docs = load_table(spark, sf_dir, "documents").limit(15)
    payloads = mm.jpeg_color_payloads(docs)
    out = {
        r.doc_id: r for r in mm.decode_stub(payloads, fake=False).collect()
    }
    assert len(out) == docs.count()
    for p in payloads.collect():
        img = jpeg.decode_jpeg_color(bytes(p.payload))
        assert img["channels"] == 3
        r = out[p.doc_id]
        assert (r.width, r.height) == (img["width"], img["height"])
        assert r.width == mm.PNG_WIDTH
        assert r.checksum == zlib.crc32(img["pixels"])


def test_avi_color_video_frame_sampling(spark, sf_dir):
    """COLOR video end to end: 4:4:4 MJPEG frames in the AVI
    container; kernel checksums equal driver-side decodes of the RGB
    buffers, and the color frames really carry 3 channels."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import avi, jpeg

    docs = load_table(spark, sf_dir, "documents").limit(6)
    vids = mm.avi_payloads(docs, n_frames=4, color=True)
    rows = mm.frame_sample_avi(vids, every_n=2).collect()
    payloads = {r.doc_id: bytes(r.payload) for r in vids.collect()}
    assert {r.doc_id for r in rows} == set(payloads)
    for r in rows:
        chunks = avi.avi_frame_chunks(payloads[r.doc_id])
        img = jpeg.decode_jpeg_color(chunks[r.frame_idx])
        assert img["channels"] == 3
        assert (r.width, r.height) == (img["width"], img["height"])
        assert r.checksum == zlib.crc32(img["pixels"])


def test_resize_nn_handles_color_jpeg(spark, sf_dir):
    """The real resize kernel resamples COLOR JPEG payloads through
    the 4:4:4 decoder: checksum equals a driver-side decode+resample
    of the same RGB buffer."""
    import zlib

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.multimodal import jpeg

    docs = load_table(spark, sf_dir, "documents").limit(8)
    payloads = mm.jpeg_color_payloads(docs)
    out = {r.doc_id: r for r in mm.resize_nn(payloads, 8, 4).collect()}
    for p in payloads.collect():
        img = jpeg.decode_jpeg_color(bytes(p.payload))
        want = zlib.crc32(
            mm.resize_pixels_nn(
                img["pixels"], img["width"], img["height"], 8, 4, 3
            )
        )
        r = out[p.doc_id]
        assert (r.width, r.height) == (8, 4)
        assert r.checksum == want


def _grad_rgb(w, h):
    # non-wrapping gradients: a modulo wrap is a sharp edge, which
    # chroma decimation legitimately blurs — the error bound tests
    # smooth content, the thing 4:2:0 is designed for
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (
            (x * 255) // max(1, w - 1),
            (y * 255) // max(1, h - 1),
            ((x + y) * 255) // max(1, w + h - 2),
        )
    )


def test_jpeg_420_roundtrip_error_bounded():
    """4:2:0 decode is REAL: smooth gradients round-trip within tight
    error bounds, gray content (constant chroma) is near-lossless
    despite the 2x2 chroma decimation, odd dims exercise the 16x16
    MCU edge clamps, and the stream is smaller than 4:4:4 of the
    same content (the point of subsampling)."""
    from thrivefinancedatapipeline_spark.multimodal import jpeg

    # error scales with gradient steepness (chroma decimation blurs
    # steep transitions) — at 8x8 a full 0..255 ramp is 36/px and the
    # "smooth" premise no longer holds, so the sizes here keep ramps
    # gentle while still covering odd dims / MCU edge clamps
    for w, h in ((32, 16), (20, 13), (48, 32)):
        smooth = _grad_rgb(w, h)
        d = jpeg.encode_jpeg_420(smooth, w, h, quality=92)
        img = jpeg.decode_jpeg_color(d)
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        err = [abs(img["pixels"][i] - smooth[i]) for i in range(len(smooth))]
        assert sum(err) / len(err) <= 5.0
        assert max(err) <= 24
        d444 = jpeg.encode_jpeg_color(smooth, w, h, quality=92)
        assert len(d) < len(d444)

    w, h = 24, 17
    gray = bytes(
        v
        for i in range(w * h)
        for v in ((i * 255) // (w * h - 1),) * 3
    )
    dg = jpeg.encode_jpeg_420(gray, w, h, quality=95)
    img = jpeg.decode_jpeg_color(dg)
    errg = [abs(img["pixels"][i] - gray[i]) for i in range(len(gray))]
    assert max(errg) <= 3


def test_avi_420_video_frame_sampling(spark):
    """4:2:0 MJPEG stream end to end: container walk + frame sampler
    decode the subsampled frames; kernel checksums equal driver-side
    decodes of the same chunks."""
    import zlib

    from thrivefinancedatapipeline_spark.multimodal import avi, jpeg

    w, h = 24, 16
    frames = [
        jpeg.encode_jpeg_420(
            bytes(((p + 13 * k) % 256) for p in range(w * h * 3)), w, h,
            quality=90,
        )
        for k in range(5)
    ]
    payload = avi.encode_avi_mjpeg(frames, w, h)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = mm.frame_sample_avi(df, every_n=2).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
    chunks = avi.avi_frame_chunks(payload)
    for r in rows:
        img = jpeg.decode_jpeg_color(chunks[r.frame_idx])
        assert img["channels"] == 3
        assert (r.width, r.height) == (w, h)
        assert r.checksum == zlib.crc32(img["pixels"])


def test_png_adam7_and_palette_roundtrip():
    """r7 PNG extensions: Adam7 interlaced streams decode BIT-EXACTLY
    (PNG is lossless — seven independently-filtered sub-images
    scattered on the pass grid), palette streams expand through PLTE
    to the exact RGB, and the honest gates hold (tRNS, non-8-bit)."""
    import hashlib
    import struct
    import zlib

    import pytest

    from thrivefinancedatapipeline_spark.multimodal import png

    def det(n, seed):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    for (w, h) in [(1, 1), (7, 3), (13, 21), (33, 17)]:
        for ct in (0, 2, 4, 6):
            ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
            pix = det(w * h * ch, f"{w}x{h}x{ct}")
            for ft in range(5):
                enc = png.encode_png(
                    pix, w, h, color_type=ct, filter_type=ft,
                    interlace=True,
                )
                dec = png.decode_png(enc)
                assert dec["pixels"] == pix, (w, h, ct, ft)
                assert (dec["width"], dec["height"], dec["channels"]) == (
                    w, h, ch,
                )
    pal = det(256 * 3, "pal")
    idx = det(19 * 11, "idx")
    enc = png.encode_png_palette(idx, 19, 11, pal)
    dec = png.decode_png(enc)
    assert dec["channels"] == 3
    assert dec["pixels"] == b"".join(
        pal[3 * i : 3 * i + 3] for i in idx
    )
    # interlaced palette composes
    enc_i = png.encode_png_palette(idx, 19, 11, pal, filter_type=2)
    assert png.decode_png(enc_i)["pixels"] == dec["pixels"]
    # palette tRNS decodes to RGBA (late-r7): index 0 gets the tRNS
    # alpha, everything past the table stays opaque
    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    idat_end = enc.rindex(chunk(b"IEND", b""))
    with_trns = enc[:idat_end] + chunk(b"tRNS", b"\x80") + enc[idat_end:]
    rgba = png.decode_png(with_trns)
    assert rgba["channels"] == 4
    assert rgba["pixels"] == b"".join(
        pal[3 * i : 3 * i + 3] + bytes([0x80 if i == 0 else 255])
        for i in idx
    )
    # gray color-key tRNS decodes (r8 — was the last PNG gate): the
    # injected key 5 turns exactly that pixel transparent
    gray_png = png.encode_png(bytes(range(16)), 4, 4, color_type=0)
    ge = gray_png.rindex(chunk(b"IEND", b""))
    ga = png.decode_png(
        gray_png[:ge] + chunk(b"tRNS", b"\x00\x05") + gray_png[ge:]
    )
    assert ga["channels"] == 2
    assert ga["pixels"] == b"".join(
        bytes([v, 0 if v == 5 else 255]) for v in range(16)
    )
    with pytest.raises(ValueError):
        png.encode_png_palette(bytes([9]), 1, 1, pal[:9])


def test_gif_interlaced_roundtrip_bit_exact():
    """r7: 4-pass GIF interlacing decodes for real — interlaced and
    sequential encodes of the same indices produce IDENTICAL pixels
    (row permutation is lossless), across odd/1-px/tall dims."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import gif

    def det(n, seed):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    for (w, h) in [(1, 1), (4, 3), (16, 8), (7, 29), (10, 64)]:
        idx = det(w * h, f"gifi{w}x{h}")
        plain = gif.decode_gif(gif.encode_gif(idx, w, h))
        inter_bytes = gif.encode_gif(idx, w, h, interlace=True)
        inter = gif.decode_gif(inter_bytes)
        assert inter["pixels"] == plain["pixels"], (w, h)
        # the stream really carries the interlace flag
        assert inter_bytes != gif.encode_gif(idx, w, h) or h == 1
    # the 4 passes partition the rows exactly once
    rows = gif._interlace_rows(29)
    assert sorted(rows) == list(range(29))


def test_wav_g711_mulaw_alaw_decode():
    """r7: G.711 companded WAV (format tags 7/6) decodes for real —
    formula-specified laws self-validated against the PUBLISHED
    figures (max linear 32124 mu / 32256 A), exhaustive code
    round-trips (all 256 A-law codes; 255 mu-law — the +0/-0 pair
    shares a linear value by design), idempotent companding, and a
    bounded quantization error. Truly compressed audio stays gated."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import wav

    assert max(wav.mulaw_decode_byte(c) for c in range(256)) == 32124
    assert min(wav.mulaw_decode_byte(c) for c in range(256)) == -32124
    assert max(wav.alaw_decode_byte(c) for c in range(256)) == 32256
    assert min(wav.alaw_decode_byte(c) for c in range(256)) == -32256
    assert sum(
        wav.mulaw_encode_sample(wav.mulaw_decode_byte(c)) == c
        for c in range(256)
    ) == 255
    assert all(
        wav.alaw_encode_sample(wav.alaw_decode_byte(c)) == c
        for c in range(256)
    )
    samples = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) - 32768
        for i in range(500)
    ]
    for law, max_err in (("mulaw", 700), ("alaw", 600)):
        enc = wav.encode_wav_g711(samples, 8000, law)
        dec = wav.decode_wav(enc)
        assert dec["encoding"] == law
        assert dec["n_frames"] == 500 and dec["framerate"] == 8000
        # idempotent: re-companding decoded samples is a fixpoint
        enc2 = wav.encode_wav_g711(dec["samples"], 8000, law)
        assert wav.decode_wav(enc2)["samples"] == dec["samples"]
        err = max(abs(a - b) for a, b in zip(samples, dec["samples"]))
        assert 0 < err <= max_err
    # PCM path unchanged; format-tag probe works on stdlib-wave output
    pcm = wav.encode_wav(samples[:100])
    assert wav.wav_format_tag(pcm) == 1
    assert wav.decode_wav(pcm)["samples"] == samples[:100]


def test_png_16bit_depth_roundtrip():
    """r7: 16-bit PNG decodes bit-exactly — the same filter machinery
    with byte-channels doubled (RFC 2083's bpp is bytes per pixel),
    across all color types, filters, and interlaced layouts."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import png

    def det(n, seed):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    for (w, h) in [(1, 1), (13, 21), (33, 17)]:
        for ct in (0, 2, 4, 6):
            ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
            pix = det(w * h * ch * 2, f"16:{w}x{h}x{ct}")
            for ft in (0, 4):
                for il in (False, True):
                    enc = png.encode_png(
                        pix, w, h, color_type=ct, filter_type=ft,
                        interlace=il, bit_depth=16,
                    )
                    dec = png.decode_png(enc)
                    assert dec["pixels"] == pix, (w, h, ct, ft, il)
                    assert dec["bit_depth"] == 16
                    assert dec["channels"] == ch
    # existing 8-bit streams still report bit_depth 8
    pix8 = det(5 * 4 * 3, "8bit")
    assert png.decode_png(png.encode_png(pix8, 5, 4))["bit_depth"] == 8


def test_codec_error_surface_fuzz():
    """100 TB crawl posture: the decode kernels map arbitrary web
    bytes, so every codec path must surface corruption as the
    documented (ValueError, NotImplementedError) contract — never a
    leaked struct/zlib/Index/KeyError that would kill a whole Arrow
    batch untyped. Deterministic fuzz: systematic truncations + byte
    flips over one valid stream per r7 codec path (this sweep caught
    PNG leaking struct.error on IHDR truncation and zlib.error on
    IDAT truncation — both normalized)."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import (
        gif,
        jpeg,
        png,
        wav,
    )

    def det(n, seed):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    pix = det(24 * 24 * 3, "fz")
    gray = det(24 * 24, "fzg")
    streams = [
        (jpeg.encode_jpeg_progressive(pix, 24, 24, 90),
         jpeg.decode_jpeg_color),
        (jpeg.encode_jpeg_420(pix, 24, 24, 90, restart_interval=2),
         jpeg.decode_jpeg_color),
        (jpeg.encode_jpeg_subsampled(pix, 24, 24, 90,
                                     luma_factors=(4, 1)),
         jpeg.decode_jpeg_color),
        (png.encode_png(det(24 * 24 * 3 * 2, "p16"), 24, 24,
                        interlace=True, bit_depth=16), png.decode_png),
        (png.encode_png_palette(gray, 24, 24, det(768, "pal")),
         png.decode_png),
        (gif.encode_gif(gray, 24, 24, interlace=True), gif.decode_gif),
        (wav.encode_wav_g711(list(range(-250, 250)), 8000, "mulaw"),
         wav.decode_wav),
    ]
    for data, dec in streams:
        step_t = max(1, len(data) // 120)
        for cut in range(1, len(data), step_t):
            try:
                dec(data[:cut])
            except (ValueError, NotImplementedError):
                pass
        step_f = max(1, len(data) // 90)
        for i in range(0, len(data), step_f):
            mut = bytearray(data)
            mut[i] ^= 0xFF
            try:
                dec(bytes(mut))
            except (ValueError, NotImplementedError):
                pass


def test_png_sub_byte_depths_roundtrip():
    """r7: 1/2/4-bit PNG decodes exactly — packed rows defilter with
    bpp rounded up to one byte (RFC 2083), unpack MSB-first, gray
    scales by v*255/(2^d-1) exactly, palette indexes directly; both
    sequential and Adam7 layouts, gray and palette, all filters."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import png

    def det(n, seed):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    for (w, h) in [(1, 1), (7, 3), (13, 21), (33, 17)]:
        for d in (1, 2, 4):
            mx = (1 << d) - 1
            samp = bytes(b % (mx + 1) for b in det(w * h, f"g{d}{w}{h}"))
            want = bytes(v * 255 // mx for v in samp)
            for ft in (0, 2, 4):
                for il in (False, True):
                    dec = png.decode_png(
                        png.encode_png(
                            samp, w, h, color_type=0, filter_type=ft,
                            interlace=il, bit_depth=d,
                        )
                    )
                    assert dec["pixels"] == want, (w, h, d, ft, il)
                    assert dec["bit_depth"] == d
            pal = det((mx + 1) * 3, f"p{d}")
            decp = png.decode_png(
                png.encode_png_palette(
                    samp, w, h, pal, bit_depth=d, interlace=(d == 4)
                )
            )
            assert decp["channels"] == 3
            assert decp["pixels"] == b"".join(
                pal[3 * i : 3 * i + 3] for i in samp
            )
    # samples exceeding the depth are refused at encode time
    import pytest

    with pytest.raises(ValueError):
        png.encode_png(bytes([2]), 1, 1, color_type=0, bit_depth=1)


def test_png_color_key_trns_roundtrip():
    """r8: gray/RGB color-key tRNS (RFC 2083 section 4.2.1.1) — the
    last PNG gate. Pixels matching the key decode to alpha 0,
    everything else opaque, at the stream's own sample width
    (gray->GA, RGB->RGBA); EQUALITY round trips across depths x
    filters x interlace (transparency only re-labels pixels, so the
    strongest oracle applies)."""
    import hashlib

    import pytest

    from thrivefinancedatapipeline_spark.multimodal import png

    def det(n, seed):
        out = bytearray()
        c = 0
        while len(out) < n:
            out += hashlib.md5(f"{seed}:{c}".encode()).digest()
            c += 1
        return bytes(out[:n])

    w, h = 13, 7

    def expand(pix, px, key, width2):
        res = bytearray()
        aw = len(key) // px * 0 + (2 if width2 else 1)
        for i in range(0, len(pix), px):
            s = pix[i : i + px]
            res += s
            a = b"\x00" if s == key else b"\xff"
            res += a * aw
        return bytes(res)

    # 8-bit gray and RGB, every filter, both layouts
    for ctype, nsamp in ((0, 1), (2, 3)):
        pix = det(w * h * nsamp, f"ck{ctype}")
        key_px = bytes(pix[:nsamp])  # guaranteed present
        key = key_px[0] if ctype == 0 else tuple(key_px)
        for ft in (0, 1, 2, 3, 4):
            for il in (False, True):
                dec = png.decode_png(
                    png.encode_png(
                        pix, w, h, color_type=ctype, filter_type=ft,
                        interlace=il, trns=key,
                    )
                )
                assert dec["channels"] == nsamp + 1
                assert dec["pixels"] == expand(
                    pix, nsamp, key_px, width2=False
                ), (ctype, ft, il)
    # 16-bit: full 2-byte-per-sample compare, 16-bit alpha
    for ctype, nsamp in ((0, 1), (2, 3)):
        pix = det(w * h * nsamp * 2, f"ck16{ctype}")
        key_px = bytes(pix[: nsamp * 2])
        vals = [
            int.from_bytes(key_px[2 * i : 2 * i + 2], "big")
            for i in range(nsamp)
        ]
        key = vals[0] if ctype == 0 else tuple(vals)
        dec = png.decode_png(
            png.encode_png(
                pix, w, h, color_type=ctype, bit_depth=16, trns=key,
            )
        )
        assert dec["channels"] == nsamp + 1
        assert dec["pixels"] == expand(pix, nsamp * 2, key_px, width2=True)
    # sub-byte gray: key scales through the same v*255/(2^d-1) map
    for d in (1, 2, 4):
        mx = (1 << d) - 1
        samp = bytes(b % (mx + 1) for b in det(w * h, f"cks{d}"))
        keyv = samp[0]
        dec = png.decode_png(
            png.encode_png(
                samp, w, h, color_type=0, bit_depth=d, trns=keyv,
            )
        )
        scaled = bytes(v * 255 // mx for v in samp)
        kb = bytes([keyv * 255 // mx])
        assert dec["channels"] == 2
        assert dec["pixels"] == expand(scaled, 1, kb, width2=False)
    # a key never present -> fully opaque output
    pix = bytes(range(16)) * 2
    dec = png.decode_png(
        png.encode_png(pix, 8, 4, color_type=0, trns=255)
        if 255 not in pix
        else png.encode_png(pix, 8, 4, color_type=0, trns=200)
    )
    assert all(dec["pixels"][2 * i + 1] == 255 for i in range(32))
    # error surface: bad key shapes refused at encode, stream-side
    # length/type violations refused at decode
    with pytest.raises(ValueError):
        png.encode_png(pix, 8, 4, color_type=0, trns=256)
    with pytest.raises(ValueError):
        png.encode_png(
            det(8 * 4 * 3, "x"), 8, 4, color_type=2, trns=(1, 2)
        )
    with pytest.raises(ValueError):
        png.encode_png(
            det(8 * 4 * 4, "x"), 8, 4, color_type=6, trns=(1, 2, 3)
        )
    # decode-side: tRNS with the wrong byte length for its color type
    good = png.encode_png(det(8 * 4, "y"), 8, 4, color_type=0, trns=7)
    ihdr_end = good.index(b"tRNS") - 4
    bad = (
        good[:ihdr_end]
        + png._chunk(b"tRNS", b"\x00\x07\x00")
        + good[good.index(b"IDAT") - 4 :]
    )
    with pytest.raises(ValueError):
        png.decode_png(bad)


def test_wav_24_and_32_bit_pcm_roundtrip():
    """r11 closes the wide-PCM gate: 24-bit (studio interchange) and
    32-bit signed samples round-trip exactly across the full range,
    and a 16-bit sample set widened by <<8 decodes to exactly the
    widened values (the width relation, not a resample)."""
    from thrivefinancedatapipeline_spark.multimodal import wav

    v24 = [0, 1, -1, 8_388_607, -8_388_608, 123_456, -654_321]
    d24 = wav.decode_wav(wav.encode_wav(v24, sampwidth=3))
    assert d24["sampwidth"] == 3 and d24["samples"] == v24
    v32 = [0, 1, -1, 2**31 - 1, -(2**31), 987_654_321]
    d32 = wav.decode_wav(wav.encode_wav(v32, sampwidth=4))
    assert d32["sampwidth"] == 4 and d32["samples"] == v32
    s16 = [0, 1, -1, 32_767, -32_768, 777]
    widened = wav.decode_wav(
        wav.encode_wav([v << 8 for v in s16], sampwidth=3)
    )
    assert widened["samples"] == [v << 8 for v in s16]
    # truncated wide rasters stay corrupt, exotic widths stay gated
    import pytest as _pt

    good = wav.encode_wav(v24, sampwidth=3)
    with _pt.raises(ValueError):
        wav.decode_wav(good[:-2])
    with _pt.raises(NotImplementedError):
        wav.encode_wav(v24, sampwidth=5)


def test_avi_dib_frames_decode_pixel_exact():
    """r11: uncompressed-DIB AVI streams decode through the proven
    BMP raster path — frames come back pixel-EXACT (unlike the lossy
    MJPEG path), with an odd width to exercise stride padding."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import avi

    def _p(n, seed):
        out = bytearray()
        i = 0
        while len(out) < n:
            out.extend(hashlib.md5(f"{seed}{i}".encode()).digest())
            i += 1
        return bytes(out[:n])

    w, h = 7, 4
    frames = [_p(w * h * 3, f"dib{k}") for k in range(4)]
    data = avi.encode_avi_dib(frames, w, h, fps=5)
    info = avi.avi_stream_info(data)
    assert info["handler"] == b"DIB "
    dec = avi.decode_avi_frames(data)
    assert [d["pixels"] for d in dec] == frames
    assert all((d["width"], d["height"]) == (w, h) for d in dec)
    # the container layer stays byte-transparent: stored raster
    # chunks survive verbatim (stride * h each)
    chunks = avi.avi_frame_chunks(data)
    assert len(chunks) == 4 and all(len(c) == 24 * h for c in chunks)
    # max_frames slices the stream order
    assert [d["pixels"] for d in avi.decode_avi_frames(data, 2)] \
        == frames[:2]


def test_avi_dib_error_surface_and_handler_gate():
    import hashlib
    import struct as _s

    import pytest as _pt

    from thrivefinancedatapipeline_spark.multimodal import avi

    px = hashlib.md5(b"e").digest() * 3  # 48 bytes = 4x4 RGB
    data = avi.encode_avi_dib([px], 4, 4)
    with _pt.raises(ValueError):
        avi.encode_avi_dib([px], 5, 4)  # dim mismatch
    with _pt.raises(ValueError):
        avi.encode_avi_dib([px], 4, 4, fps=0)
    # an unknown video handler is a principled gate, not a crash
    gated = bytearray(data)
    pos = gated.find(b"vids") + 4
    gated[pos : pos + 4] = b"XVID"
    with _pt.raises(NotImplementedError):
        avi.decode_avi_frames(bytes(gated))
    # a truncated strf is corrupt
    cut = bytearray(data)
    pos = cut.find(b"strf")
    _s.pack_into("<I", cut, pos + 4, 10)
    with _pt.raises(ValueError):
        avi.decode_avi_frames(bytes(cut))


def test_avi_audio_first_stream_resolution():
    """A valid AVI whose FIRST stream is audio ('auds') resolves its
    VIDEO stream (r11 ADVICE: the old scan took the first strh/strf in
    document order and rejected audio-first files as corrupt); an AVI
    with well-formed streams but no video raises the distinct
    'no video stream' ValueError, not 'corrupt'."""
    import hashlib
    import struct as _s

    import pytest as _pt

    from thrivefinancedatapipeline_spark.multimodal import avi

    w, h = 4, 4
    px = hashlib.md5(b"af").digest() * 3  # 48 bytes = 4x4 RGB
    data = avi.encode_avi_dib([px], w, h, fps=5)

    strh_a = avi._chunk(
        b"strh",
        avi._STRH_HEAD.pack(
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, 16_000, 0, 100, 0, 0xFFFFFFFF, 2, 0, 0, 0, 0,
        ),
    )
    strf_a = avi._chunk(
        b"strf", _s.pack("<2H2I2H", 1, 1, 16_000, 32_000, 2, 16)
    )
    strl_a = avi._list(b"strl", strh_a + strf_a)

    # splice the audio strl BEFORE the video strl inside hdrl
    assert data[12:16] == b"LIST"
    (hsz,) = _s.unpack_from("<I", data, 16)
    hdrl_end = 20 + hsz
    inner = data[24:hdrl_end]  # after 'hdrl': avih + strl(vids)
    (asz,) = _s.unpack_from("<I", inner, 4)
    avih_len = 8 + asz + (asz % 2)
    avih, vids_strl = inner[:avih_len], inner[avih_len:]
    new_hdrl = avi._list(b"hdrl", avih + strl_a + vids_strl)
    body = b"AVI " + new_hdrl + data[hdrl_end + (hsz % 2):]
    audio_first = b"RIFF" + _s.pack("<I", len(body)) + body

    info = avi.avi_stream_info(audio_first)
    assert info["handler"] == b"DIB "
    dec = avi.decode_avi_frames(audio_first)
    assert [d["pixels"] for d in dec] == [px]
    assert (dec[0]["width"], dec[0]["height"]) == (w, h)

    # audio-ONLY: well-formed container, no vids stream at all
    hdrl_audio = avi._list(b"hdrl", avih + strl_a)
    movi = avi._list(b"movi", b"")
    body2 = b"AVI " + hdrl_audio + movi
    audio_only = b"RIFF" + _s.pack("<I", len(body2)) + body2
    with _pt.raises(ValueError, match="no video stream"):
        avi.avi_stream_info(audio_only)


def test_encode_wav_out_of_range_uniform_valueerror():
    """Out-of-range samples raise ValueError at EVERY width (r11
    ADVICE: 24-bit leaked OverflowError while 16/32-bit leaked
    struct.error — one contract for the same misuse), and the exact
    boundary values still round-trip at every width."""
    import pytest

    from thrivefinancedatapipeline_spark.multimodal import wav

    for sw, bad in (
        (2, 1 << 15), (3, 1 << 23), (4, 1 << 31),
        (2, -(1 << 15) - 1), (3, -(1 << 23) - 1), (4, -(1 << 31) - 1),
    ):
        with pytest.raises(ValueError, match="out of range"):
            wav.encode_wav([0, bad], sampwidth=sw)
    for sw in (2, 3, 4):
        lo, hi = -(1 << (8 * sw - 1)), (1 << (8 * sw - 1)) - 1
        dec = wav.decode_wav(wav.encode_wav([lo, 0, hi], sampwidth=sw))
        assert dec["samples"] == [lo, 0, hi]
        assert dec["sampwidth"] == sw


def test_avi_stream_resolution_any_stream_order_property():
    """Fuzz the r12 strl-scan fix: an AVI with up to 4 streams in ANY
    order (audio/video mixed) must resolve the FIRST video stream —
    never reject a valid container, never pick an audio strf."""
    import struct as _s

    import pytest as _pt
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from thrivefinancedatapipeline_spark.multimodal import avi

    def _strl(kind, tag):
        if kind == "vids":
            strh = avi._chunk(
                b"strh",
                avi._STRH_HEAD.pack(
                    b"vids", tag, 0, 0, 0, 0, 1, 10, 0, 1,
                    0, 0xFFFFFFFF, 0, 0, 0, 4, 4,
                ),
            )
            strf = avi._chunk(
                b"strf",
                avi._BMIH.pack(40, 4, 4, 1, 24, 0, 48, 0, 0, 0, 0),
            )
        else:
            strh = avi._chunk(
                b"strh",
                avi._STRH_HEAD.pack(
                    b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
                    1, 16_000, 0, 0, 0, 0xFFFFFFFF, 2, 0, 0, 0, 0,
                ),
            )
            strf = avi._chunk(
                b"strf",
                _s.pack("<2H2I2H", 1, 1, 16_000, 32_000, 2, 16),
            )
        return avi._list(b"strl", strh + strf)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.sampled_from(["auds", "vids"]),
                    min_size=1, max_size=4))
    def check(kinds):
        # distinct vids handler tags so we can verify WHICH vids won
        tags = iter([b"DIB ", b"MJPG", b"RGB ", b"\x00\x00\x00\x00"])
        strls, want = [], None
        for k in kinds:
            t = next(tags) if k == "vids" else None
            if k == "vids" and want is None:
                want = t
            strls.append(_strl(k, t))
        avih = avi._chunk(b"avih", avi._AVIH.pack(
            100_000, 0, 0, 0x10, 0, 0, len(kinds), 0, 4, 4, 0, 0, 0, 0,
        ))
        hdrl = avi._list(b"hdrl", avih + b"".join(strls))
        movi = avi._list(b"movi", b"")
        body = b"AVI " + hdrl + movi
        data = b"RIFF" + _s.pack("<I", len(body)) + body
        if want is None:
            with _pt.raises(ValueError, match="no video stream"):
                avi.avi_stream_info(data)
        else:
            info = avi.avi_stream_info(data)
            assert info["handler"] == want
            assert len(info["strf"]) >= 40

    check()


def test_avi_nested_list_bomb_keeps_valueerror_contract():
    """A crafted AVI with ~1000 nested wrapper LISTs (~12 KB of input)
    must raise the documented ValueError('corrupt AVI container'), not
    RecursionError (r12 ADVICE: the recursive walk broke the error
    contract the decode gates rely on for untrusted raw-crawl bytes) —
    while LEGITIMATE nesting inside the bound still resolves streams."""
    import struct as _s

    import pytest as _pt

    from thrivefinancedatapipeline_spark.multimodal import avi

    # depth bomb: LIST(wrap0 LIST(wrap1 ... )) 1000 deep
    inner = b""
    for _ in range(1000):
        inner = avi._list(b"wrp0", inner)
    body = b"AVI " + avi._list(b"hdrl", inner)
    bomb = b"RIFF" + _s.pack("<I", len(body)) + body
    with _pt.raises(ValueError, match="corrupt AVI container"):
        avi.avi_stream_info(bomb)

    # _find_chunks shares the bound: a strl whose strh hides under a
    # 1000-deep LIST chain is rejected the same way
    deep = b""
    for _ in range(1000):
        deep = avi._list(b"wrp1", deep)
    strl_bomb = avi._list(b"strl", deep)
    body2 = b"AVI " + avi._list(b"hdrl", strl_bomb)
    bomb2 = b"RIFF" + _s.pack("<I", len(body2)) + body2
    with _pt.raises(ValueError, match="corrupt AVI container"):
        avi.avi_stream_info(bomb2)

    # legitimate shallow extra wrapping still resolves: wrap the whole
    # hdrl contents in 3 cosmetic LIST levels (inside _MAX_LIST_DEPTH)
    import hashlib

    px = hashlib.md5(b"deep").digest() * 3  # 4x4 RGB
    data = avi.encode_avi_dib([px], 4, 4, fps=5)
    (hsz,) = _s.unpack_from("<I", data, 16)
    hdrl_end = 20 + hsz
    inner_hdrl = data[24:hdrl_end]  # avih + strl(vids)
    wrapped = inner_hdrl
    for _ in range(3):
        wrapped = avi._list(b"wrpx", wrapped)
    new_hdrl = avi._list(b"hdrl", wrapped)
    body3 = b"AVI " + new_hdrl + data[hdrl_end + (hsz % 2):]
    shallow = b"RIFF" + _s.pack("<I", len(body3)) + body3
    info = avi.avi_stream_info(shallow)
    assert info["handler"] == b"DIB "
    assert [d["pixels"] for d in avi.decode_avi_frames(shallow)] == [px]
