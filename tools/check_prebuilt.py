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
    six operators round 7 had staged here; round 9 registered the six
    operators round 8 had staged (source_jaccard_drift,
    source_dup_matrix, split_leakage_audit, balance_drawdown,
    doc_length_outliers, balance_concentration_by_segment). Round 9
    stages prebuilds for the r10 window: green here first, then a
    2-line move of the (query, oracle) pair into the module dicts."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        NEAR_DUP_SEVERITY_ORACLE,
        SOURCE_TOKEN_YIELD_ORACLE,
        near_dup_severity_histogram,
        source_token_yield,
    )
    from thrivefinancedatapipeline_spark.operators.packing import (
        SOURCE_TOKEN_COST_CURVE_ORACLE,
        TOKEN_COST_DRIFT_ORACLE,
        source_token_cost_curve,
        source_token_cost_drift,
    )
    from thrivefinancedatapipeline_spark.operators.quality import (
        CURATION_FUNNEL_ORACLE,
        source_curation_funnel,
    )
    from thrivefinancedatapipeline_spark.operators.sampling import (
        _quality_split_drift_oracle,
        quality_split_drift,
    )
    from thrivefinancedatapipeline_spark.operators.similarity import (
        HYBRID_RRF_ORACLE,
        _ivfpq_filtered_oracle,
        hybrid_search_rrf,
        ivfpq_knn_filtered,
    )
    from thrivefinancedatapipeline_spark.operators.textops import (
        CHUNK_NEAR_DUP_ORACLE,
        chunk_near_dup_rate,
    )
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        BALANCE_VOLATILITY_ORACLE,
        BUCKET_MIGRATION_ORACLE,
        balance_bucket_migration,
        balance_volatility,
    )

    return {
        "source_token_cost_curve": (
            source_token_cost_curve, SOURCE_TOKEN_COST_CURVE_ORACLE,
        ),
        "near_dup_severity_histogram": (
            near_dup_severity_histogram, NEAR_DUP_SEVERITY_ORACLE,
        ),
        "source_token_yield": (
            source_token_yield, SOURCE_TOKEN_YIELD_ORACLE,
        ),
        "quality_split_drift": (
            quality_split_drift, _quality_split_drift_oracle(),
        ),
        "balance_volatility": (
            balance_volatility, BALANCE_VOLATILITY_ORACLE,
        ),
        "balance_bucket_migration": (
            balance_bucket_migration, BUCKET_MIGRATION_ORACLE,
        ),
        "chunk_near_dup_rate": (
            chunk_near_dup_rate, CHUNK_NEAR_DUP_ORACLE,
        ),
        "knn_ivfpq_filtered": (
            ivfpq_knn_filtered, _ivfpq_filtered_oracle(),
        ),
        "hybrid_search_rrf": (
            hybrid_search_rrf, HYBRID_RRF_ORACLE,
        ),
        "source_token_cost_drift": (
            source_token_cost_drift, TOKEN_COST_DRIFT_ORACLE,
        ),
        "source_curation_funnel": (
            source_curation_funnel, CURATION_FUNNEL_ORACLE,
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
    spark = get_spark("prebuilt-check")
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
