"""Incremental month-fold must equal the full recompute, and
approximate aggregates must stay within sketch tolerance of exact."""

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.operators.balance import (
    balance_history,
    current_balances,
    incremental_balance_update,
)
from thrivefinancedatapipeline_spark.sources.ingest import transactions_from_events

CUTOFF = "2024-01-20 00:00:00"


def _balances(txns):
    return current_balances(balance_history(txns))


def test_incremental_equals_full_recompute(spark, sf_dir):
    txns = transactions_from_events(load_table(spark, sf_dir, "events"))
    old = txns.filter(F.col("createdat") < F.lit(CUTOFF).cast("timestamp"))
    new = txns.filter(F.col("createdat") >= F.lit(CUTOFF).cast("timestamp"))

    snapshot = _balances(old)
    updated = incremental_balance_update(snapshot, new)
    full = _balances(txns)

    got = {
        r.customer_id: tuple(
            round(v, 6)
            for v in (
                r.current_balance, r.cumulative_earned,
                r.cumulative_spent, r.cumulative_expired,
            )
        )
        for r in updated.collect()
    }
    want = {
        r.customer_id: tuple(
            round(v, 6)
            for v in (
                r.current_balance, r.cumulative_earned,
                r.cumulative_spent, r.cumulative_expired,
            )
        )
        for r in full.collect()
    }
    assert got == want


def test_incremental_handles_brand_new_customers(spark):
    prev = spark.createDataFrame(
        [(1, 10.0, 10.0, 0.0, 0.0)],
        "customer_id long, current_balance double, cumulative_earned double, "
        "cumulative_spent double, cumulative_expired double",
    )
    new = spark.createDataFrame(
        [(100, "earned", "2024-02-01", 2, 5.0)],
        "trans_id long, tctype string, createdat string, customerid long, amount double",
    ).withColumn("createdat", F.col("createdat").cast("timestamp"))
    rows = {r.customer_id: r.current_balance
            for r in incremental_balance_update(prev, new).collect()}
    assert rows == {1: 10.0, 2: 5.0}


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.expr("percentile(value, 0.5D)").alias("m")).collect()[0].m
    approx = ev.agg(
        F.percentile_approx("value", 0.5, 1000).alias("m")
    ).collect()[0].m
    assert abs(approx - exact) <= 0.05 * abs(exact) + 0.5


def test_approx_distinct_attest_in_band(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.sketches import (
        q_approx_distinct_attest,
    )

    rows = q_approx_distinct_attest(spark, sf_dir).collect()
    assert rows and all(r.in_band == 1 for r in rows)
    assert all(r.exact_distinct > 0 for r in rows)


def test_approx_percentile_attest_in_band(spark, sf_dir):
    from thrivefinancedatapipeline_spark.plans.advanced import (
        PCTS,
        q_approx_percentile_attest,
    )

    rows = q_approx_percentile_attest(spark, sf_dir).collect()
    # one row per (event_type, percentile), every one inside the band
    assert len(rows) % len(PCTS) == 0 and rows
    assert all(r.in_band == 1 for r in rows)


def test_scd2_increment_equals_full_rebuild(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.balance import (
        balance_scd2,
        scd2_apply_increment,
    )

    txns = transactions_from_events(load_table(spark, sf_dir, "events"))
    cutoff = F.lit(CUTOFF).cast("timestamp")
    prev = balance_scd2(txns.filter(F.col("createdat") < cutoff))
    merged = scd2_apply_increment(
        prev, txns.filter(F.col("createdat") >= cutoff)
    )
    key = lambda r: (r.customer_id, r.transaction_id)  # noqa: E731
    got = {
        key(r): (round(r.balance, 2), r.effective_from, r.effective_to,
                 r.is_current)
        for r in merged.collect()
    }
    want = {
        key(r): (round(r.balance, 2), r.effective_from, r.effective_to,
                 r.is_current)
        for r in balance_scd2(txns).collect()
    }
    assert got == want


def test_scd2_increment_handles_brand_new_customer(spark):
    from thrivefinancedatapipeline_spark.operators.balance import (
        scd2_apply_increment,
    )

    prev = spark.createDataFrame(
        [(1, 10.0, "2024-01-01", 100, None, 1)],
        "customer_id long, balance double, effective_from string, "
        "transaction_id long, effective_to string, is_current int",
    ).withColumn(
        "effective_from", F.col("effective_from").cast("timestamp")
    ).withColumn("effective_to", F.col("effective_to").cast("timestamp"))
    new = spark.createDataFrame(
        [(200, "earned", "2024-02-01", 2, 5.0),
         (201, "spent", "2024-02-02", 2, -3.0)],
        "trans_id long, tctype string, createdat string, "
        "customerid long, amount double",
    ).withColumn("createdat", F.col("createdat").cast("timestamp"))
    rows = {
        (r.customer_id, r.transaction_id): (r.balance, r.is_current)
        for r in scd2_apply_increment(prev, new).collect()
    }
    # untouched customer keeps its open row; new customer chains 5 -> 2
    assert rows[(1, 100)] == (10.0, 1)
    assert rows[(2, 200)] == (5.0, 0)
    assert rows[(2, 201)] == (2.0, 1)
