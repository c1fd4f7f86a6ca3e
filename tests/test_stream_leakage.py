"""Streaming twin of split_leakage_audit (r8 VERDICT item 5):
row-local MinHash banding parity, and drain parity of the stateful
leakage counters against the batch audit."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.streaming import stateful

from test_streaming_stateful import drain


def test_row_local_minhash_bands_match_batch(spark, sf_dir):
    """The streaming form's per-row signature fold produces the
    IDENTICAL (doc_id, band, key) relation as the batch
    explode+groupBy banding — the property that lets a stream probe
    the corpus band index without silently missing collisions."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        _docs,
        minhash_bands_for,
        minhash_bands_row_local,
    )

    docs = _docs(spark, sf_dir)
    got = sorted(
        tuple(r)
        for r in minhash_bands_row_local(docs)
        .select("doc_id", "band", "key")
        .collect()
    )
    want = sorted(tuple(r) for r in minhash_bands_for(docs).collect())
    assert got == want
    # the carried verify payload matches the shingle relation
    n = dict(
        minhash_bands_row_local(docs)
        .select("doc_id", "n_shingles")
        .distinct()
        .collect()
    )
    from thrivefinancedatapipeline_spark.operators.dedup import (
        _shingle_rows,
    )

    want_n = dict(
        _shingle_rows(docs).groupBy("doc_id").count().collect()
    )
    assert n == want_n


def test_row_local_bands_parity_with_shingle_less_docs(spark):
    """Docs with < 3 tokens have NO shingles: the batch banding emits
    no rows for them (no shingle rows → no groupBy group), and the
    row-local form must match — not fold the empty array to the
    [P]*16 init signature and emit NB sentinel-key band rows that
    collide every short doc with every other (the r9 ADVICE gap:
    parity must hold for EVERY corpus, not just shingle-rich ones)."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        minhash_bands_for,
        minhash_bands_row_local,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha"),                      # 1 token → 0 shingles
            (2, "alpha beta"),                 # 2 tokens → 0 shingles
            (3, "alpha beta gamma delta"),     # 2 shingles
            (4, "alpha beta gamma delta"),     # exact dup of 3
            (5, ""),                           # empty text
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in minhash_bands_row_local(docs)
        .select("doc_id", "band", "key")
        .collect()
    )
    want = sorted(tuple(r) for r in minhash_bands_for(docs).collect())
    assert got == want
    # short docs emit nothing; the two real docs band identically
    assert {r[0] for r in got} == {3, 4}


def test_stream_split_leakage_matches_batch(spark, sf_dir):
    """Drain parity: after the full corpus streams through, the
    max-seq n_pairs per (split_a, split_b) cell equals the batch
    split_leakage_audit's n_dup_pairs — each unordered pair is
    counted exactly once (when its later doc arrives), whatever the
    arrival order. Counters are monotone along the stream."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sampling import (
        split_leakage_audit,
    )

    src = tempfile.mkdtemp(prefix="stream_leak_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
            part = (
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                )
                .orderBy("doc_id")
                .coalesce(1)
            )
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i)
            )
        got = drain(
            stateful.stream_split_leakage(
                spark, src, sf_dir, max_files_per_trigger=1
            ),
            "stream_leak",
            "append",
        )
        latest = {}
        for r in got:
            cell = (r.split_a, r.split_b)
            if cell not in latest or r.seq > latest[cell].seq:
                latest[cell] = r
        final = sorted(
            (a, b, r.n_pairs) for (a, b), r in latest.items()
        )
        want = sorted(
            (r.split_a, r.split_b, r.n_dup_pairs)
            for r in split_leakage_audit(spark, sf_dir).collect()
        )
        assert final == want
        assert len(final) >= 1  # non-vacuous: the corpus has leaks
        # per-cell counters never decrease along the stream
        by_cell = {}
        for r in sorted(got, key=lambda r: r.seq):
            prev = by_cell.get((r.split_a, r.split_b))
            if prev is not None:
                assert r.n_pairs >= prev
            by_cell[(r.split_a, r.split_b)] = r.n_pairs
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_quality_split_drift_matches_batch(spark, sf_dir):
    """Drain parity for the quality-mix stream: max-seq rows per
    (split, bucket) equal the batch quality_split_drift exactly
    (same bucket expression, same split hash); per-split counters
    are monotone along the stream and shares always sum to ~1e6."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sampling import (
        quality_split_drift,
    )

    src = tempfile.mkdtemp(prefix="stream_qsd_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
            part = (
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                )
                .orderBy("doc_id")
                .coalesce(1)
            )
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i)
            )
        got = drain(
            stateful.stream_quality_split_drift(
                spark, src, max_files_per_trigger=1
            ),
            "stream_qsd",
            "append",
        )
        latest = {}
        for r in got:
            cell = (r.split, r.quality_bucket)
            if cell not in latest or r.seq > latest[cell].seq:
                latest[cell] = r
        final = sorted(
            (s, b, r.n_docs, r.share_ppm)
            for (s, b), r in latest.items()
        )
        want = sorted(
            tuple(r) for r in quality_split_drift(spark, sf_dir).collect()
        )
        assert final == want
        # monotone counters per cell; shares sum to 1e6 - (floor loss)
        by_cell = {}
        for r in sorted(got, key=lambda r: r.seq):
            prev = by_cell.get((r.split, r.quality_bucket))
            if prev is not None:
                assert r.n_docs >= prev
            by_cell[(r.split, r.quality_bucket)] = r.n_docs
        from collections import defaultdict

        per_emit = defaultdict(list)
        for r in got:
            per_emit[(r.split, r.seq)].append(r.share_ppm)
        for ppms in per_emit.values():
            assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000
    finally:
        shutil.rmtree(src, ignore_errors=True)
