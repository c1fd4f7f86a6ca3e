"""Property-based FIFO check: the distributed rank-pairing must equal
a direct in-memory simulation of the documented semantics (each
redeemer, in time order, consumes the oldest still-available earned —
availability not time-gated; reference src/fifo_matching.py:23) on
arbitrary generated scenarios, including timestamp ties, customers
with no earned rows, and earned surpluses/deficits."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators.fifo import (
    fifo_match,
    fifo_match_rank_join,
)

BASE = datetime.datetime(2024, 1, 1)

txn = st.tuples(
    st.integers(0, 2),                      # customer
    st.sampled_from(["earned", "spent", "expired"]),
    st.integers(0, 5),                      # hour offset → deliberate ties
    st.integers(1, 500),                    # amount cents
)
scenario = st.lists(txn, min_size=0, max_size=14)


def simulate(rows):
    """Reference semantics, directly: per customer, earned sorted by
    (time, id); redeemers in (time, id) order each pop the first
    unconsumed earned."""
    out = {}
    for cust in {r[3] for r in rows}:
        mine = sorted(
            (r for r in rows if r[3] == cust), key=lambda r: (r[2], r[0])
        )
        earned = [r for r in mine if r[1] == "earned"]
        consumed = 0
        for r in mine:
            if r[1] != "earned":
                if consumed < len(earned):
                    out[earned[consumed][0]] = r[0]  # earned_id -> redeemer_id
                    consumed += 1
    return out


def to_rows(scn):
    rows = []
    for i, (cust, ttype, hour, cents) in enumerate(scn):
        amount = cents / 100.0
        if ttype != "earned":
            amount = -amount
        rows.append(
            (i, ttype, BASE + datetime.timedelta(hours=hour), cust, amount)
        )
    return rows


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario)
def test_fifo_matches_simulation(spark, scn):
    rows = to_rows(scn)
    if not rows:
        return
    df = spark.createDataFrame(
        rows,
        "trans_id long, tctype string, createdat timestamp, "
        "customerid long, amount double",
    )
    got = {
        r.trans_id: r.redeemid
        for r in fifo_match(df).filter(F.col("redeemid").isNotNull()).collect()
    }
    assert got == simulate(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario)
def test_rank_join_form_is_identical(spark, scn):
    rows = to_rows(scn)
    if not rows:
        return
    df = spark.createDataFrame(
        rows,
        "trans_id long, tctype string, createdat timestamp, "
        "customerid long, amount double",
    )
    a = sorted(map(tuple, fifo_match(df).collect()))
    b = sorted(map(tuple, fifo_match_rank_join(df).collect()))
    assert a == b
