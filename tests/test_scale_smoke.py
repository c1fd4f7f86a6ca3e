"""Scale smoke: core operators on an 8x-replicated event stream
(~800k rows at sf0.1, deeper per-customer histories). Catches the
failure class small-SF tests can't: per-key state blowup, quadratic
pair growth, lineage depth."""

import time

import pytest
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.operators.balance import (
    balance_history,
    current_balances,
)
from thrivefinancedatapipeline_spark.operators.fifo import fifo_match
from thrivefinancedatapipeline_spark.sources.ingest import transactions_from_events

REPLICAS = 8
SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def big_txns(spark):
    """sf0.1 events replicated with shifted ids/timestamps: ~5k
    transactions per customer (vs ~650), same customer count."""
    ev = load_table(spark, SF01, "events")
    n = ev.count()
    parts = [
        ev.select(
            (F.col("event_id") + i * n).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {31 * i} DAYS")).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        for i in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return transactions_from_events(out)


def test_fifo_at_8x_scale(spark, big_txns):
    t0 = time.perf_counter()
    matched = fifo_match(big_txns)
    total = matched.count()
    elapsed = time.perf_counter() - t0
    assert total == big_txns.count()
    # every redeemer matched or unmatched-consistently: redeemids unique
    redeems = matched.filter(F.col("redeemid").isNotNull())
    assert redeems.count() == redeems.select("redeemid").distinct().count()
    assert elapsed < 120, f"fifo at 8x took {elapsed:.0f}s"


def test_balance_at_8x_scale(spark, big_txns):
    balances = current_balances(balance_history(big_txns))
    rows = balances.collect()
    assert len(rows) == big_txns.select("customerid").distinct().count()
    # balance equation holds per customer at scale
    agg = big_txns.groupBy("customerid").agg(
        F.round(
            F.sum(F.when(F.col("tctype") == "earned", F.col("amount")).otherwise(0.0))
            + F.sum(F.when(F.col("tctype") != "earned", F.col("amount")).otherwise(0.0)),
            2,
        ).alias("expected")
    )
    got = {r.customerid: r.expected for r in agg.collect()}
    for r in rows:
        assert abs(r.current_balance - got[r.customer_id]) < 0.05
