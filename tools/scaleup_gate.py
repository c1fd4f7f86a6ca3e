"""Standing end-of-round scale gate: value parity + wall ratios ABOVE
the bench SF, produced by ONE command (r15 verdict item 5).

r15 proved the derived single-file corpus is a valid
SPARK_GRAFT_SF_DIR target (15 queries hash-exact vs DuckDB at x32,
both r15 registrations at x100). This tool makes that check standing:
it builds the xM corpus ONCE (tools/scaleup_probe.build_scaled_dir —
half-spliced docs, single-file sf-dir layout, ROW_GROUP_SIZE 5000),
then on the same session

1. times the registered-path wide/scale targets at sf0.1 vs xM
   (the scaleup_probe warmup + noop-sink protocol), and
2. runs the check_correctness compare (row count + column set +
   order-insensitive value hash vs DuckDB) for the standing heavy
   dedup/text/ANN subset at xM,

and emits one JSON object with both sections. With --round N it also
writes SCALEUP_r{N}.json at the repo root (the artifact the judge
reads next to BENCH_r{N}.json).

Usage:
    python tools/scaleup_gate.py [--round N] [M]      # default M=32
    python tools/scaleup_gate.py 320 --timing a,b --parity a,b
                                  # subset overrides for extreme-M
                                  # volume-only runs (pair-finding ops
                                  # go density-quadratic by data
                                  # construction at large M)

Graph consumers are excluded from the parity subset by design: their
registered default is the guarded 60-bit relation (sub-threshold
path), and a 37M-pair recursive CTE at x32 would stress DuckDB, not
the engine. Their xM evidence is the timing section's *_wide rides
plus the identity pins in tests/test_simhash_scale_path.py.

Pair-density caveat (scaleup_probe docstring): derived halves are
reused ~M times, so pair-finding ratios at large M are stress bounds,
not plan properties — read them against the band-sweep candidate
model. Volume ops' ratios are trustworthy.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_correctness import TABLES, frame_hash  # noqa: E402
from scaleup_probe import BASE, _extra_probes, build_scaled_dir  # noqa: E402

#: timing targets — every registered wide/scale operator plus the two
#: graph consumers riding the registered 120-bit relation via pairs_fn
TIMING_QUERIES = [
    "dedup_simhash_wide_pairs",
    "dedup_simhash_wide_radius_sweep",
    "dedup_minhash_lsh_r8",
    "corpus_perplexity_buckets",
    "dedup_clusters_star_wide",
    "dedup_pagerank_wide",
]

#: standing parity subset — the heavy dedup/text/ANN family the r15
#: round proved at x32, plus the r16 registrations (their scale points)
PARITY_QUERIES = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_simhash_wide_pairs",
    "dedup_simhash_wide_radius_sweep",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_r8",
    "dedup_containment",
    "corpus_perplexity_buckets",
    "corpus_vocabulary",
    "corpus_length_histogram",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "knn_bruteforce_cosine",
    "embedding_centroids",
]


def main() -> None:
    import duckdb

    from thrivefinancedatapipeline_spark.session import get_spark

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    rnd = None
    timing_names = TIMING_QUERIES
    parity_names = PARITY_QUERIES
    if "--round" in argv:
        i = argv.index("--round")
        rnd = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--timing" in argv:
        i = argv.index("--timing")
        timing_names = [s for s in argv[i + 1].split(",") if s]
        argv = argv[:i] + argv[i + 2:]
    if "--parity" in argv:
        i = argv.index("--parity")
        parity_names = [s for s in argv[i + 1].split(",") if s]
        argv = argv[:i] + argv[i + 2:]
    m = int(argv[0]) if argv else 32

    # private warehouse: hermetic against concurrent pytest/sweeps
    wh = tempfile.mkdtemp(prefix="tfdp-wh-gate-")
    spark = get_spark("scaleup-gate", warehouse_dir=wh)
    # single-file derived tables are only as parallel as their row
    # groups — split to row-group granularity (the r15 layout lesson)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))

    qs = {**entrymod.queries(), **_extra_probes()}
    oracles = entrymod.oracle_sql()
    unknown = sorted(
        (set(timing_names) | set(parity_names)) - set(qs)
    )
    if unknown:  # green-by-vacuity guard (the check_prebuilt rule)
        print(f"ERROR: unknown queries: {unknown}")
        raise SystemExit(2)

    out_dir = tempfile.mkdtemp(prefix="scaleup_gate_sf_")
    result: dict = {"m": m}
    if rnd is not None:
        result["round"] = rnd
    try:
        t0 = time.perf_counter()
        build_scaled_dir(spark, out_dir, m)
        result["build_s"] = round(time.perf_counter() - t0, 1)

        def force(df):
            df.write.mode("overwrite").format("noop").save()

        timing: dict = {}
        for name in timing_names:
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
            timing[name] = per
            print(f"  time {name:32s} {per}", file=sys.stderr)
        result["timing"] = timing

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{out_dir}/{t}.parquet'"
            )
        greens: list[str] = []
        fails: list[dict] = []
        t_par = time.perf_counter()
        for name in parity_names:
            t_q = time.perf_counter()
            try:
                sdf = qs[name](spark, out_dir).toPandas()
                odf = con.execute(oracles[name]).fetchdf()
            except Exception as exc:  # noqa: BLE001
                fails.append({"query": name, "error": str(exc)[:300]})
                print(f"  FAIL {name}: {exc}", file=sys.stderr)
                continue
            problems = []
            if len(sdf) != len(odf):
                problems.append(f"rows {len(sdf)} vs {len(odf)}")
            if sorted(sdf.columns) != sorted(odf.columns):
                problems.append("column set")
            elif not problems and frame_hash(sdf) != frame_hash(odf):
                problems.append("value-hash mismatch")
            if problems:
                fails.append({"query": name, "error": "; ".join(problems)})
                print(f"  FAIL {name}: {problems}", file=sys.stderr)
            else:
                greens.append(name)
                print(
                    f"  ok   {name}: rows={len(sdf)} "
                    f"({time.perf_counter() - t_q:.1f}s)",
                    file=sys.stderr,
                )
        con.close()
        result["oracle_parity"] = {
            "corpus": (
                f"derived x{m} single-file sf-dir layout "
                f"(build {result['build_s']}s)"
            ),
            "queries_green": greens,
            "failures": len(fails),
            "failed": fails,
            "wall_s": round(time.perf_counter() - t_par, 1),
        }
        print(json.dumps(result))
        if rnd is not None:
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                f"SCALEUP_r{rnd}.json",
            )
            with open(path, "w") as f:
                json.dump(result, f, indent=1)
            print(f"wrote {path}", file=sys.stderr)
        if fails:
            raise SystemExit(1)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
