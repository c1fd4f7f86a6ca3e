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


def test_ivfpq_probe_rebuilds_partial_index(spark, sf_dir):
    """A build that crashed after the stamped centroids table (or a
    separately dropped codes table) must trigger a REBUILD, not a
    permanent error: the stamp alone is not evidence of a complete
    index (r7 ADVICE closed)."""
    import os

    try:
        sim.build_ivfpq_index(spark, sf_dir)
        full = sorted(
            tuple(r)
            for r in sim.knn_ivfpq_index_probe(spark, sf_dir).collect()
        )
        # simulate the partial build: stamp present, codes gone
        sim._drop_table(spark, sim.IVFPQ_CODES_TABLE)
        assert sim.index_source_sf_dir(spark) == os.path.abspath(sf_dir)
        healed = sorted(
            tuple(r)
            for r in sim.knn_ivfpq_index_probe(spark, sf_dir).collect()
        )
        assert healed == full
        # and again with the codebooks table missing
        sim._drop_table(spark, sim.IVFPQ_CODEBOOKS_TABLE)
        healed2 = sorted(
            tuple(r)
            for r in sim.knn_ivfpq_index_probe(spark, sf_dir).collect()
        )
        assert healed2 == full
        # dir-exists-but-unreadable (a crashed write leaving only
        # _temporary): read.parquet raises AnalysisException, which
        # must also heal, not become a permanent error
        from urllib.parse import urlparse

        sim._drop_table(spark, sim.IVFPQ_CODES_TABLE)
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        junk = os.path.join(wh, sim.IVFPQ_CODES_TABLE.lower(), "_temporary")
        os.makedirs(junk, exist_ok=True)
        healed3 = sorted(
            tuple(r)
            for r in sim.knn_ivfpq_index_probe(spark, sf_dir).collect()
        )
        assert healed3 == full
    finally:
        _drop_all(spark)


def test_ivfpq_lifecycle_composed_cross_process(spark, sf_dir, tmp_path):
    """The full persisted-index lifecycle as a deployment runs it,
    each stage in its OWN process on a FRESH warehouse dir: (1) CLI
    build, (2) cross-process read-only probe row-identical to the
    in-process knn_ivfpq (path-fallback catalog read + source-stamp
    validation), (3) streaming encode-only append under the frozen
    quantizer loaded cross-process, (4) probe again over the appended
    table. Closes the loop the per-link tests pin individually."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="4",
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    wd = str(tmp_path)  # fresh ./spark-warehouse lives here

    def run(args_or_script, script=False):
        cmd = (
            [sys.executable, "-c", args_or_script]
            if script
            else [sys.executable, "-m", "thrivefinancedatapipeline_spark"]
            + args_or_script
        )
        r = subprocess.run(
            cmd, cwd=wd, env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    # 1. CLI build in a fresh process + fresh warehouse
    out = run(["ann-index", "build", "--sf-dir", sf_dir])
    built = _json.loads(out.strip().splitlines()[-1])
    assert built["codes_rows"] > 0

    # 2. cross-process probe: rows IDENTICAL to in-process knn_ivfpq
    out = run(["ann-index", "probe", "--sf-dir", sf_dir, "--json"])
    probe_rows = [
        tuple(r) for r in _json.loads(out.strip().splitlines()[-1])["rows"]
    ]
    want = sorted(
        tuple(r) for r in sim.ivfpq_knn(spark, sf_dir).collect()
    )
    assert probe_rows == want

    # ... and the stamp guard holds across processes: probing the
    # same index for a DIFFERENT corpus errors instead of answering
    other = sf_dir.replace("sf0.001", "sf0.01")
    if os.path.isdir(other):
        r = subprocess.run(
            [sys.executable, "-m", "thrivefinancedatapipeline_spark",
             "ann-index", "probe", "--sf-dir", other],
            cwd=wd, env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode != 0
        assert "built from" in (r.stderr + r.stdout)

    # 3. streaming append in a third process: quantizer loaded via the
    # path fallback (this process's catalog never saw the build), two
    # micro-batches encoded and landed idempotently
    script = f"""
import json
from thrivefinancedatapipeline_spark.session import get_spark
from thrivefinancedatapipeline_spark.operators import similarity as sim
from thrivefinancedatapipeline_spark.streaming.stateful import (
    run_ivfpq_stream_append,
)
from pyspark.sql import functions as F
spark = get_spark("lifecycle-append")
emb = spark.read.parquet("{sf_dir}/embeddings.parquet").select(
    "vec_id", "embedding"
)
a = emb.orderBy("vec_id").limit(4).withColumn(
    "vec_id", F.col("vec_id") + 1_000_000
)
a.coalesce(1).write.mode("overwrite").parquet("{wd}/incoming_raw")
import glob, shutil, os
os.makedirs("{wd}/incoming", exist_ok=True)
for i, f in enumerate(sorted(glob.glob("{wd}/incoming_raw/part-*.parquet"))):
    shutil.copy(f, "{wd}/incoming/file" + str(i) + ".parquet")
got = run_ivfpq_stream_append(
    spark, "{wd}/incoming", "{wd}/ckpt", "{wd}/stream_codes"
)
coarse, books = sim.load_ivfpq_quantizer(spark)  # path fallback
expect = sim._ivfpq_encode(sim.to_int_vecs(a), coarse, books)
def freeze(df):
    return sorted(
        (r.neighbor_id, r.cell, tuple(r.codes)) for r in df.collect()
    )
assert freeze(got) == freeze(expect), "stream-append parity"
# cross-process append into the warehouse layout itself
sim.append_ivfpq_index(spark, sim.to_int_vecs(a))
print(json.dumps({{"stream_rows": got.count()}}))
"""
    out = run(script, script=True)
    assert _json.loads(out.strip().splitlines()[-1])["stream_rows"] == 4

    # 4. the probe keeps answering over the appended table in yet
    # another fresh process (appended ids may enter pools — only
    # shape and non-emptiness are contractual here)
    out = run(["ann-index", "probe", "--sf-dir", sf_dir, "--json"])
    again = _json.loads(out.strip().splitlines()[-1])["rows"]
    assert len(again) > 0 and len(again[0]) == len(want[0])
