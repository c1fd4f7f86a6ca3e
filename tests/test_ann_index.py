"""Persisted IVF-PQ index audit: the probe must (1) return rows
IDENTICAL to the in-query ivfpq_knn, (2) plan its code scan with
partition pruning on the probed cells and NO shuffle exchange on cell,
and (3) survive encode-only append maintenance — appending new vectors
equals having encoded the union in one pass with the frozen quantizer.
The vector-side twin of tests/test_bucketing.py's band-index audit."""

import contextlib
import io

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators import similarity as sim


def simple_plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def _rows(df):
    def freeze(v):
        return tuple(v) if isinstance(v, list) else v

    return sorted(tuple(freeze(v) for v in r) for r in df.collect())


def _drop_all(spark):
    for t in (
        sim.IVFPQ_CENTROIDS_TABLE,
        sim.IVFPQ_CODEBOOKS_TABLE,
        sim.IVFPQ_CODES_TABLE,
    ):
        sim._drop_table(spark, t)


def test_ivfpq_index_probe_parity_plan_and_append(spark, sf_dir):
    try:
        sim.build_ivfpq_index(spark, sf_dir)

        # 1. probe == in-query ivfpq, row for row
        probe = sim.probe_ivfpq_index(spark, sf_dir)
        assert _rows(probe) == _rows(sim.ivfpq_knn(spark, sf_dir))

        # 2. plan: the code-table scan is pruned to the probed cells
        # (PartitionFilters) and feeds the join without a shuffle on
        # cell (probe side broadcasts; the only hash exchanges are the
        # per-query windows on the pruned pool)
        plan = simple_plan(probe)
        scan_lines = [
            ln for ln in plan.splitlines() if "ivfpq_codes" in ln
        ]
        assert scan_lines, plan
        assert any(
            "PartitionFilters: [" in ln
            and "PartitionFilters:[]" not in ln.replace(" ", "")
            for ln in scan_lines
        ), scan_lines
        assert "hashpartitioning(cell" not in plan, plan

        # 3. append maintenance: encode-only, union-equivalent
        iv = sim._int_vecs(spark, sf_dir)
        new = iv.orderBy("vec_id").limit(5).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "xi"
        )
        sim.append_ivfpq_index(spark, new)
        coarse, books = sim.load_ivfpq_quantizer(spark)
        expect = sim._ivfpq_encode(iv, coarse, books).unionByName(
            sim._ivfpq_encode(new, coarse, books)
        )
        got = spark.table(sim.IVFPQ_CODES_TABLE).select(
            "neighbor_id", "cell", "codes"
        )
        assert _rows(got) == _rows(
            expect.select("neighbor_id", "cell", "codes")
        )

        # the probe keeps working against the appended table
        again = sim.probe_ivfpq_index(spark, sf_dir)
        assert again.count() > 0
    finally:
        _drop_all(spark)


def test_ivfpq_quantizer_roundtrip(spark, sf_dir):
    """Header tables reconstruct the trained quantizer EXACTLY —
    centroid integers, book order, and the flat ADC index alignment
    all survive the catalog round-trip."""
    try:
        iv = sim._int_vecs(spark, sf_dir)
        coarse = sim._trained_centroids_cached(spark, sf_dir, iv)
        books = sim._ivfpq_books_cached(sf_dir, iv, coarse)
        sim.build_ivfpq_index(spark, sf_dir)
        coarse2, books2 = sim.load_ivfpq_quantizer(spark)
        assert [(c, list(map(int, v))) for c, v in coarse] == coarse2
        assert [
            [(int(c), list(map(int, v))) for c, v in book]
            for book in books
        ] == books2
    finally:
        _drop_all(spark)


def test_ivfpq_stream_append_parity_and_idempotence(spark, sf_dir, tmp_path):
    """Streaming encode-only maintenance: draining two micro-batches
    of new vectors yields codes identical to a one-pass encode under
    the frozen quantizer, and a replayed batch overwrites itself (no
    duplicate codes)."""
    from thrivefinancedatapipeline_spark.streaming.stateful import (
        run_ivfpq_stream_append,
    )

    try:
        sim.build_ivfpq_index(spark, sf_dir)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        src = str(tmp_path / "incoming")
        a = emb.orderBy("vec_id").limit(6).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        )
        b = emb.orderBy(F.col("vec_id").desc()).limit(5).withColumn(
            "vec_id", F.col("vec_id") + 2_000_000
        )
        a.coalesce(1).write.parquet(f"{src}/f1")
        b.coalesce(1).write.parquet(f"{src}/f2")
        # the file source walks subdirs only with glob; write flat files
        import glob as g
        import shutil

        flat = str(tmp_path / "flat")
        import os

        os.makedirs(flat)
        for i, f in enumerate(
            sorted(g.glob(f"{src}/*/part-*.parquet"))
        ):
            shutil.copy(f, f"{flat}/file{i}.parquet")

        codes_path = str(tmp_path / "stream_codes")
        got = run_ivfpq_stream_append(
            spark, flat, str(tmp_path / "ckpt"), codes_path
        )
        coarse, books = sim.load_ivfpq_quantizer(spark)
        expect = sim._ivfpq_encode(
            sim.to_int_vecs(a.unionByName(b)), coarse, books
        )

        def freeze(df):
            return sorted(
                (r.neighbor_id, r.cell, tuple(r.codes))
                for r in df.collect()
            )

        assert freeze(got) == freeze(expect)

        # replay: re-running a batch with the same id must not grow
        # the table (dynamic partition overwrite of batch=<id>)
        n_before = spark.read.parquet(codes_path).count()
        enc = sim._ivfpq_encode(sim.to_int_vecs(a), coarse, books)
        (
            enc.withColumn("batch", F.lit(0))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "cell")
            .parquet(codes_path)
        )
        assert spark.read.parquet(codes_path).count() == n_before
    finally:
        _drop_all(spark)


def test_ivfpq_probe_rejects_foreign_corpus(spark, sf_dir):
    """The persisted source stamp guards cross-process probes: an
    index built from corpus X refuses to answer for corpus Y instead
    of silently returning X's neighbors (r6 ADVICE closed)."""
    import os

    import pytest

    other = sf_dir.replace("sf0.001", "sf0.01")
    if not os.path.isdir(other):
        pytest.skip("needs a second SF dir")
    try:
        sim.build_ivfpq_index(spark, sf_dir)
        assert sim.index_source_sf_dir(spark) == os.path.abspath(sf_dir)
        with pytest.raises(ValueError, match="built from"):
            sim.probe_ivfpq_index(spark, other)
        # the registered query self-heals: it REBUILDS for the new
        # corpus instead of erroring (train-once per corpus)
        assert sim.knn_ivfpq_index_probe(spark, other).count() > 0
        assert sim.index_source_sf_dir(spark) == os.path.abspath(other)
    finally:
        _drop_all(spark)
