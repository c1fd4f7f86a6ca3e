"""Verify every PRE-BUILT (not yet registered) operator against its
oracle constant — the same Spark-vs-DuckDB compare the driver runs,
for the catalog of operators held back to protect the correctness
window's proof-backlog rotation (SURVEY §8 registration budget).

    python tools/check_prebuilt.py            # all prebuilts
    python tools/check_prebuilt.py benford_audit pii_scan_redact

Before registering one in round 6+, this MUST be green at the default
sf0.01 — registration is then a 2-line move of the (query, oracle)
pair into the module's QUERIES/ORACLES dicts.
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
    """name -> (query_fn, oracle_sql). Oracles live as module
    constants until registration."""
    from thrivefinancedatapipeline_spark.operators import (
        dedup,
        quality,
        similarity,
        textops,
    )
    from thrivefinancedatapipeline_spark.plans import (
        advanced,
        events_queries,
        finance_queries,
    )

    return {
        "knn_pq_adc": (similarity.pq_adc_knn, similarity._pq_oracle_sql()),
        "knn_ivfpq": (similarity.ivfpq_knn, similarity._ivfpq_oracle_sql()),
        "label_noise_audit": (
            similarity.label_noise_audit, similarity.LABEL_NOISE_ORACLE,
        ),
        "coreset_representatives": (
            similarity.coreset_representatives, similarity.CORESET_ORACLE,
        ),
        "events_seasonal_decompose": (
            events_queries.events_seasonal_decompose,
            events_queries.SEASONAL_ORACLE,
        ),
        "events_robust_anomalies": (
            events_queries.events_robust_anomalies,
            events_queries.ROBUST_ANOMALY_ORACLE,
        ),
        "event_transition_matrix": (
            events_queries.event_transition_matrix,
            events_queries.TRANSITION_ORACLE,
        ),
        "funnel_latency_quantiles": (
            events_queries.funnel_latency_quantiles,
            events_queries.FUNNEL_LATENCY_ORACLE,
        ),
        "session_top_paths": (
            events_queries.session_top_paths,
            events_queries.TOP_PATHS_ORACLE,
        ),
        "events_burstiness": (
            events_queries.events_burstiness,
            events_queries.BURSTINESS_ORACLE,
        ),
        "events_hour_lift": (
            events_queries.events_hour_lift,
            events_queries.HOUR_LIFT_ORACLE,
        ),
        "events_type_correlation": (
            events_queries.events_type_correlation,
            events_queries.TYPE_CORRELATION_ORACLE,
        ),
        "interpurchase_quantiles": (
            events_queries.interpurchase_quantiles,
            events_queries.INTERPURCHASE_ORACLE,
        ),
        "corpus_bigram_coverage": (
            textops.corpus_bigram_coverage,
            textops.BIGRAM_COVERAGE_ORACLE,
        ),
        "pii_scan_redact": (textops.pii_scan_redact, textops.PII_ORACLE),
        "corpus_source_drift": (
            textops.corpus_source_drift, textops.SOURCE_DRIFT_ORACLE,
        ),
        "corpus_lexical_diversity": (
            textops.corpus_lexical_diversity,
            textops.LEXICAL_DIVERSITY_ORACLE,
        ),
        "corpus_dup_rate_by_source": (
            textops.corpus_dup_rate_by_source, textops.DUP_RATE_ORACLE,
        ),
        "benford_audit": (quality.benford_audit, quality.BENFORD_ORACLE),
        "weighted_median_price": (
            advanced.weighted_median_price, advanced.WEIGHTED_MEDIAN_ORACLE,
        ),
        "overdraft_flags": (
            finance_queries.overdraft_flags, finance_queries.OVERDRAFT_ORACLE,
        ),
        "balance_snapshot_diff": (
            finance_queries.balance_snapshot_diff,
            finance_queries.SNAPSHOT_DIFF_ORACLE,
        ),
        "customer_rfm": (
            finance_queries.customer_rfm, finance_queries.RFM_ORACLE,
        ),
        "cohort_ltv": (
            finance_queries.cohort_ltv, finance_queries.COHORT_LTV_ORACLE,
        ),
        "part_abc_classification": (
            advanced.part_abc_classification, advanced.ABC_ORACLE,
        ),
        "order_fulfillment_latency": (
            advanced.order_fulfillment_latency,
            advanced.FULFILLMENT_ORACLE,
        ),
        "basket_part_pairs": (
            advanced.basket_part_pairs, advanced.BASKET_ORACLE,
        ),
        "dedup_containment": (
            dedup.dedup_containment, dedup.CONTAINMENT_ORACLE,
        ),
        "lsh_recall_audit": (
            dedup.lsh_recall_audit, dedup.LSH_RECALL_ORACLE,
        ),
    }


def main() -> int:
    from thrivefinancedatapipeline_spark.session import get_spark

    spark = get_spark("prebuilt-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cat = _catalog()
    only = set(sys.argv[1:])
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
