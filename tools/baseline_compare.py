"""Throughput crossover: reference-style pandas vs the Spark engine.

At sf0.1 (100k rows) any single-node tool wins on wall-clock because
Spark pays fixed JVM/scheduling overhead per job. The honest comparison
for "matches-or-beats the reference's single-node throughput at the
same data scale" is the crossover curve: replicate the sf0.1 events
table N x (customers shifted so per-customer history stays realistic)
and run BOTH engines' ingest -> FIFO -> balance pipeline on the same
parquet. Prints one JSON line per scale with both timings.

    python tools/baseline_compare.py [--scales 1,8,64]

Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from baseline_pandas import (  # noqa: E402
    balance_history_pandas,
    current_balances_pandas,
    fifo_match_pandas,
    load_transactions,
)

WORK = "/tmp/spark_graft_baseline_compare"
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_scaled(n: int) -> str:
    """Replicate sf0.1 events n times with disjoint event/user id
    ranges — scales the customer population, keeping per-customer
    history depth constant (the realistic growth axis)."""
    out_dir = os.path.join(WORK, f"x{n}")
    path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ev = pd.read_parquet(os.path.join(SRC, "events.parquet"))
    copies = []
    for i in range(n):
        c = ev.copy()
        c["event_id"] = c["event_id"] + i * 10_000_000
        c["user_id"] = c["user_id"] + i * 1_000_000
        copies.append(c)
    pd.concat(copies, ignore_index=True).to_parquet(path, index=False)
    return out_dir


def run_pandas(sf_dir: str) -> float:
    t = time.perf_counter()
    cur = current_balances_pandas(
        balance_history_pandas(fifo_match_pandas(load_transactions(sf_dir)))
    )
    assert len(cur) > 0
    return time.perf_counter() - t


def run_spark(spark, sf_dir: str) -> float:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.fifo import fifo_match
    from thrivefinancedatapipeline_spark.sources.ingest import (
        transactions_from_events,
    )

    t = time.perf_counter()
    txns = transactions_from_events(load_table(spark, sf_dir, "events"))
    matched = fifo_match(txns)
    w = (
        Window.partitionBy("customerid")
        .orderBy("createdat", "trans_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    history = matched.withColumn("balance", F.sum("amount").over(w))
    history.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,8,64")
    ap.add_argument("--keep", action="store_true", help="keep scaled parquet")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.session import get_spark

    spark = get_spark("baseline-compare")
    # one warmup job so JVM startup isn't billed to the first scale
    spark.range(1000).groupBy(F.col("id") % 7).count().collect()

    rows = []
    for n in scales:
        sf_dir = build_scaled(n)
        pd_sec = run_pandas(sf_dir)
        sp_sec = run_spark(spark, sf_dir)
        row = {
            "scale_vs_sf0_1": n,
            "rows": 100_000 * n,
            "pandas_sec": round(pd_sec, 2),
            "spark_sec": round(sp_sec, 2),
            "spark_over_pandas": round(sp_sec / pd_sec, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
