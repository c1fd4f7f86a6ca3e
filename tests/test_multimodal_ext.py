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
