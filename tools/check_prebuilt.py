"""Verify every PRE-BUILT (not yet registered) operator against its
oracle constant — the same Spark-vs-DuckDB compare the driver runs,
for the catalog of operators held back to protect the correctness
window's proof-backlog rotation (SURVEY §8 registration budget).

    python tools/check_prebuilt.py            # all prebuilts
    python tools/check_prebuilt.py some_new_op

Round 6 drained the catalog (everything moved into the registered
queries()/oracle_sql() contract). Future prebuilds stage here first:
green at the default sf0.01, then a 2-line move of the (query,
oracle) pair into the module's QUERIES/ORACLES dicts.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import TABLES, compare_frames  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _catalog():
    """name -> (query_fn, oracle_sql) for operators built but NOT yet
    registered in a module's QUERIES/ORACLES dicts.

    Round 6 drained the 29-operator backlog; round 8 registered the
    six operators round 7 had staged here; round 9 registered round
    8's six; round 10 registered round 9's eleven; round 11 registered
    round 10's ten; round 12 registered round 11's nine; round 13
    registered round 12's nine and staged five for r14; round 14
    registered round 13's five (the ingestion-source attest trio
    ingestion_codec_attest / ingestion_text_attest /
    ingestion_stream_attest plus dedup_minhash_perm_sweep and
    mixture_temperature_sweep); round 15 registered round 14's three
    (corpus_funnel_stream_attest, corpus_perplexity_buckets,
    dedup_simhash_wide_pairs) and staged two for r16; round 16
    registered round 15's two (dedup_simhash_wide_radius_sweep,
    dedup_minhash_lsh_r8) — the catalog is currently EMPTY. Future
    prebuilds stage here first: green at the default sf0.01, then a
    2-line move of the (query, oracle) pair into the module dicts."""
    return {}


def main() -> int:
    from thrivefinancedatapipeline_spark.session import get_spark

    cat = _catalog()
    only = set(sys.argv[1:])
    unknown = only - set(cat)
    if unknown:
        # a typo'd name must NOT report green-by-vacuity
        print(f"ERROR: not in the prebuilt catalog: {sorted(unknown)}")
        return 1
    # private warehouse: hermetic against concurrent pytest/sweep runs
    import atexit
    import shutil
    import tempfile

    wh = tempfile.mkdtemp(prefix="tfdp-wh-")
    atexit.register(shutil.rmtree, wh, ignore_errors=True)
    spark = get_spark("prebuilt-check", warehouse_dir=wh)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    failures = 0
    t0 = time.perf_counter()
    for name, (fn, sql) in cat.items():
        if only and name not in only:
            continue
        tq = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            failures += 1
            continue
        problems = compare_frames(sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(sdf)} "
                  f"({time.perf_counter() - tq:.1f}s)")
    print(f"\n{failures} failures (total {time.perf_counter() - t0:.0f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
