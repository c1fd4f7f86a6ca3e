"""Scale-UP probe: extend the measured scaling curve BEYOND sf0.1 by
deriving an M-times corpus from sf0.1 and timing the heavy LLM-data
family on it.

The existing tools/scale_probe.py measures sf0.001 -> sf0.1 (100x) —
a range where fixed per-job overhead still dominates, so sub-linear
ratios are expected. This probe pushes the top of the curve another
decade-plus (default M=32: 160k documents / 64k vectors) so any
quadratic term that hides under the JVM floor at sf0.1 has room to
show itself. Run it after touching any operator in PROBE_QUERIES.

Derivation is DETERMINISTIC (no rand(), the repo-wide rule):
- documents: each row replicated M times; replica k keeps the source/
  lang mix but gets a distinct doc_id (id * M + k) and a HALF-SPLICED
  text — the first half of doc i's tokens followed by the back half
  of a deterministic partner doc's tokens plus one unique md5 marker
  word. Half-splicing matters: a simple suffix-append would leave all
  M replicas of a doc mutual NEAR-DUPS (Jaccard ~0.9), inflating the
  LSH pair volume QUADRATICALLY in M — a data artifact, not a plan
  property, that would poison the timing signal (and trip the 1M-edge
  driver-CC budget). Spliced replicas share ~1/3 Jaccard with their
  parents (below the dedup thresholds), so the derived corpus's
  near-dup RATE tracks the base corpus while its SIZE scales M-fold
  with a realistic shared token head.
- embeddings: replica k gets vec_id * M + k and a deterministic small
  perturbation on dimension (k mod dim) — distinct vectors, same
  cluster geometry, so IVF/PQ cell balance is preserved.
- every other table is copied as-is (the probed queries read only
  documents/embeddings; the copies keep load_tables working).
- the derived dir uses the sf-dir single-file layout ({d}/{t}.parquet
  is a FILE, rewritten by a streaming DuckDB COPY), so it is a valid
  SPARK_GRAFT_SF_DIR target for the DuckDB-side tooling too.

Caveat for pair-finding operators (measured, M=100 — see
SCALEUP100_r14.json): with n base docs and n*M derived docs built
from n halves, each half is necessarily reused ~M times, so the
density of moderately-similar (J~1/3) pairs grows linearly with M
and LSH candidate volume grows ~M^2 — a data-construction stress
bound, not a plan property. Volume-scaling ops (agg, join, window,
encode, top-k) are unaffected. Interpret dedup_* ratios at large M
against the band-sweep candidate counts, which track the s^r
collision model exactly.

Usage:
    python tools/scaleup_probe.py [M] [query ...]

Prints one JSON object; wall ratios are per M-times data. A healthy
plan reads well under M (sub-linear); ~M is linear; >> M is the
quadratic smell this tool exists to catch.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"

#: heavy LLM-data family — the operators whose 100 TB posture the
#: scale-up curve is evidence for (document + embedding readers only,
#: so the derived corpus semantics stay clean).
PROBE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_containment",
    # the graph consumer rides the wide relation here (its 60-bit
    # default is guarded off above SIMHASH_WIDE_THRESHOLD_DOCS = 2^16
    # docs, and every derived corpus this probe builds is above it)
    "dedup_clusters_star_wide",
    "knn_bruteforce_cosine",
    "ivf_knn",
    "knn_ivfpq",
    "text_tfidf_top_terms",
    "corpus_bigram_familiarity",
    "pack_sequences",
]


def _singlefile(stage_dir: str, dest_file: str) -> None:
    """Rewrite a Spark multi-part parquet directory as ONE parquet
    file, so the derived dir matches the sf-dir layout everywhere
    ({d}/{t}.parquet is a FILE) and is a valid SPARK_GRAFT_SF_DIR
    target for the DuckDB-side tooling (ADVICE r14). DuckDB streams
    the copy — no driver-memory proportionality."""
    import duckdb

    # small row groups: a single file is only as parallel as its row
    # groups (first probe run at default 122880-row groups read the
    # whole derived corpus in <= 2 tasks and inflated every x32 wall
    # ~8x — a layout artifact, not a plan property)
    duckdb.connect().execute(
        f"COPY (SELECT * FROM parquet_scan('{stage_dir}/*.parquet')) "
        f"TO '{dest_file}' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)"
    )
    shutil.rmtree(stage_dir, ignore_errors=True)


def build_scaled_dir(spark, out_dir: str, m: int) -> None:
    """Materialize the derived M-times corpus under out_dir."""
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import TABLES, load_table

    for name in TABLES:
        if name in ("documents", "embeddings"):
            continue
        shutil.copy(f"{BASE}/{name}.parquet", f"{out_dir}/{name}.parquet")

    docs = load_table(spark, BASE, "documents")
    n_docs = docs.count()
    # doc_ids are contiguous 0..n-1 in the driver's testdata (asserted
    # below), so the partner position is plain modular arithmetic — no
    # global window needed for the derivation
    assert docs.agg(
        (F.max("doc_id") == n_docs - 1) & (F.min("doc_id") == 0)
    ).first()[0], "doc_ids not contiguous; derivation needs a rank"
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
        F.col("doc_id").alias("pos"),
    ).localCheckpoint(eager=True)
    partners = base.select(
        F.col("pos").alias("ppos"), F.col("toks").alias("ptoks")
    )
    reps = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("k")
    ).withColumn("ppos", F.expr(f"pmod(pos + k * 7919, {n_docs})"))
    spliced = reps.join(partners, "ppos").select(
        (F.col("doc_id") * m + F.col("k")).alias("doc_id"),
        F.when(F.col("k") == 0, F.array_join("toks", " "))
        .otherwise(
            F.concat(
                F.array_join(
                    F.expr(
                        "slice(toks, 1, greatest(size(toks) div 2, 1))"
                    ),
                    " ",
                ),
                F.lit(" "),
                F.array_join(
                    F.expr(
                        "slice(ptoks, size(ptoks) div 2 + 1,"
                        " size(ptoks) - size(ptoks) div 2)"
                    ),
                    " ",
                ),
                F.lit(" r"),
                F.substring(
                    F.md5(F.concat_ws("|", "doc_id", "k")), 1, 6
                ),
            )
        )
        .alias("text"),
        "lang",
        "source",
    )
    scaled_docs = spliced.withColumn(
        "n_chars", F.length("text").cast("long")
    ).select("doc_id", "text", "lang", "source", "n_chars")
    scaled_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet.stage"
    )
    _singlefile(
        f"{out_dir}/documents.parquet.stage", f"{out_dir}/documents.parquet"
    )

    emb = load_table(spark, BASE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    scaled_emb = (
        emb.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("k")
        )
        .select(
            (F.col("vec_id") * m + F.col("k")).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x +"
                f" CASE WHEN i = pmod(k, {dim})"
                " THEN (pmod(k, 7) + 1) / 1000.0 ELSE 0.0 END"
                " AS FLOAT))"
            ).alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet.stage"
    )
    _singlefile(
        f"{out_dir}/embeddings.parquet.stage", f"{out_dir}/embeddings.parquet"
    )


def _extra_probes() -> dict:
    """Non-registered probe targets: the graph consumers RIDING the
    registered 120-bit relation via pairs_fn (their registered default
    stays 60-bit — quadratic past SIMHASH_WIDE_THRESHOLD_DOCS, which
    is exactly why the wide path must be the one measured here)."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        q_dedup_clusters_star,
        q_dedup_pagerank,
        q_dedup_simhash_wide_pairs,
    )

    from thrivefinancedatapipeline_spark.operators.dedup import (
        kcore_decompose,
    )

    return {
        "dedup_clusters_star_wide": lambda spark, d: q_dedup_clusters_star(
            spark, d, pairs_fn=q_dedup_simhash_wide_pairs
        ),
        "dedup_pagerank_wide": lambda spark, d: q_dedup_pagerank(
            spark, d, pairs_fn=q_dedup_simhash_wide_pairs
        ),
        # the r16-wired seventh consumer: iterative peeling over the
        # wide relation (its 60-bit default raises above threshold)
        "kcore_decompose_wide": lambda spark, d: kcore_decompose(
            spark, d, pairs_fn=q_dedup_simhash_wide_pairs
        ),
    }


def main() -> None:
    from thrivefinancedatapipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    m = int(argv[0]) if argv and argv[0].isdigit() else 32
    names = [a for a in argv if not a.isdigit()] or PROBE_QUERIES

    spark = get_spark("scaleup-probe")
    # the derived tables are SINGLE parquet files (sf-dir layout
    # parity); split them down to row-group granularity so the scan
    # parallelism matches what any real multi-file table gets — at
    # 100 TB nothing is one 128 MB split
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    qs = {**entrymod.queries(), **_extra_probes()}
    unknown = sorted(set(names) - set(qs))
    if unknown:
        print(f"ERROR: unknown queries: {unknown}")
        raise SystemExit(2)

    out_dir = tempfile.mkdtemp(prefix="scaleup_sf_")
    t0 = time.perf_counter()
    build_scaled_dir(spark, out_dir, m)
    build_s = round(time.perf_counter() - t0, 1)

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    result: dict = {"m": m, "build_s": build_s, "queries": {}}
    try:
        for name in names:
            per: dict[str, float] = {}
            for label, d in (("sf0.1", BASE), (f"x{m}", out_dir)):
                force(qs[name](spark, d))  # untimed warmup (codegen)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                force(qs[name](spark, d))
                per[label] = round(time.perf_counter() - t0, 3)
                spark.catalog.clearCache()
            per["ratio"] = round(per[f"x{m}"] / max(per["sf0.1"], 1e-9), 2)
            per["ratio_per_mx"] = round(per["ratio"] / m, 3)
            result["queries"][name] = per
            print(f"  {name:30s} {per}", file=sys.stderr)
        print(json.dumps(result))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
