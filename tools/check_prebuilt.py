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

from check_correctness import TABLES, frame_hash  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _catalog():
    """name -> (query_fn, oracle_sql) for operators built but NOT yet
    registered in a module's QUERIES/ORACLES dicts.

    Round 6 drained the 29-operator backlog; round 8 registered the
    six operators round 7 had staged here; round 9 registered round
    8's six; round 10 registered round 9's eleven (token cost
    curve/drift, severity histogram, token yield, quality split
    drift, balance volatility, bucket migration, chunk near-dup
    rate, filtered ANN, hybrid RRF, curation funnel). Future
    prebuilds stage here first: green at the default sf0.01, then a
    2-line move of the (query, oracle) pair into the module dicts.
    Round 10 stages prebuilds for the r11 window."""
    from thrivefinancedatapipeline_spark.multimodal.binary_ops import (
        CODEC_ATTEST2_ORACLE,
        q_multimodal_codec_attest2,
    )
    from thrivefinancedatapipeline_spark.operators.dedup import (
        CLUSTER_KEEP_PRIORITY_ORACLE,
        KEEP_PRIORITY_ORACLE,
        dedup_cluster_keep_priority,
        dedup_keep_priority,
    )
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        VELOCITY_ORACLE,
        txn_velocity_flags,
    )
    from thrivefinancedatapipeline_spark.operators.sampling import (
        QUOTA_SAMPLER_ORACLE,
        source_quota_sampler,
    )
    from thrivefinancedatapipeline_spark.operators.similarity import (
        CONTRASTIVE_NEGATIVES_ORACLE,
        HYBRID_COVERAGE_ORACLE,
        HYBRID_RRF_INDEXED_ORACLE,
        MMR_COST_ORACLE,
        MMR_ORACLE,
        contrastive_negatives,
        hybrid_fusion_coverage,
        hybrid_search_rrf_indexed,
        knn_mmr_diversified,
        mmr_diversity_cost,
    )

    return {
        "hybrid_search_rrf_indexed": (
            hybrid_search_rrf_indexed, HYBRID_RRF_INDEXED_ORACLE,
        ),
        "source_quota_sampler": (
            source_quota_sampler, QUOTA_SAMPLER_ORACLE,
        ),
        "contrastive_negatives": (
            contrastive_negatives, CONTRASTIVE_NEGATIVES_ORACLE,
        ),
        "multimodal_codec_attest2": (
            q_multimodal_codec_attest2, CODEC_ATTEST2_ORACLE,
        ),
        "knn_mmr_diversified": (
            knn_mmr_diversified, MMR_ORACLE,
        ),
        "dedup_keep_priority": (
            dedup_keep_priority, KEEP_PRIORITY_ORACLE,
        ),
        "txn_velocity_flags": (
            txn_velocity_flags, VELOCITY_ORACLE,
        ),
        "dedup_cluster_keep_priority": (
            dedup_cluster_keep_priority, CLUSTER_KEEP_PRIORITY_ORACLE,
        ),
        "mmr_diversity_cost": (
            mmr_diversity_cost, MMR_COST_ORACLE,
        ),
        "hybrid_fusion_coverage": (
            hybrid_fusion_coverage, HYBRID_COVERAGE_ORACLE,
        ),
    }


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
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
        elif frame_hash(sdf) != frame_hash(odf):
            problems.append("value-hash mismatch")
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
