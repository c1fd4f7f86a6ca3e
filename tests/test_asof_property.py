"""Property tests: as-of join vs a direct simulation, incremental
balance fold vs full recompute, on arbitrary generated scenarios."""

import datetime

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators.asof import asof_join
from thrivefinancedatapipeline_spark.operators.balance import (
    balance_history,
    current_balances,
    incremental_balance_update,
)

BASE = datetime.datetime(2024, 1, 1)

quote = st.tuples(st.integers(0, 1), st.integers(0, 8), st.integers(1, 99))
trade = st.tuples(st.integers(0, 1), st.integers(0, 8))
scenario = st.tuples(
    st.lists(trade, min_size=1, max_size=6),
    st.lists(quote, min_size=0, max_size=8),
)


def sim_asof(trades, quotes, forward):
    out = {}
    for i, (k, t) in enumerate(trades):
        cands = [
            (qt, j, px)
            for j, (qk, qt, px) in enumerate(quotes)
            if qk == k and (qt >= t if forward else qt <= t)
        ]
        if not cands:
            out[i] = None
            continue
        if forward:
            best_t = min(c[0] for c in cands)
            pool = [c for c in cands if c[0] == best_t]
            out[i] = min(pool, key=lambda c: c[1])[2]  # min tiebreak id
        else:
            best_t = max(c[0] for c in cands)
            pool = [c for c in cands if c[0] == best_t]
            out[i] = max(pool, key=lambda c: c[1])[2]  # max tiebreak id
    return out


def _frames(spark, trades, quotes):
    tdf = spark.createDataFrame(
        [
            (i, k, BASE + datetime.timedelta(hours=t))
            for i, (k, t) in enumerate(trades)
        ],
        "trade_id long, k long, trade_ts timestamp",
    )
    qdf = spark.createDataFrame(
        [
            (j, k, BASE + datetime.timedelta(hours=t), float(px))
            for j, (k, t, px) in enumerate(quotes)
        ],
        "quote_id long, k long, quote_ts timestamp, px double",
    )
    return tdf, qdf


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario, st.booleans())
def test_asof_matches_simulation(spark, scn, forward):
    trades, quotes = scn
    tdf, qdf = _frames(spark, trades, quotes)
    # tiebreak id must win among equal timestamps: use quote px keyed
    # to quote_id ordering by feeding quote_id as the tiebreak
    got = {
        r.trade_id: r.px
        for r in asof_join(
            tdf, qdf, on=["k"], left_ts="trade_ts", right_ts="quote_ts",
            right_tiebreak="quote_id",
            direction="forward" if forward else "backward",
        ).collect()
    }
    want = sim_asof(trades, quotes, forward)
    assert got == want


txn = st.tuples(
    st.integers(0, 2),
    st.sampled_from(["earned", "spent", "expired"]),
    st.integers(0, 9),
    st.integers(1, 300),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(txn, min_size=1, max_size=12), st.integers(0, 9))
def test_incremental_fold_equals_recompute(spark, scn, cutoff_hour):
    rows = [
        (
            i,
            t,
            BASE + datetime.timedelta(hours=h),
            c,
            float(cents) / 100 * (1 if t == "earned" else -1),
        )
        for i, (c, t, h, cents) in enumerate(scn)
    ]
    df = spark.createDataFrame(
        rows,
        "trans_id long, tctype string, createdat timestamp, "
        "customerid long, amount double",
    )
    cutoff = BASE + datetime.timedelta(hours=cutoff_hour)
    old = df.filter(F.col("createdat") < F.lit(cutoff))
    new = df.filter(F.col("createdat") >= F.lit(cutoff))
    updated = incremental_balance_update(
        current_balances(balance_history(old)), new
    )
    full = current_balances(balance_history(df))
    got = {
        r.customer_id: round(r.current_balance, 6) for r in updated.collect()
    }
    want = {
        r.customer_id: round(r.current_balance, 6) for r in full.collect()
    }
    assert got == want


edge = st.tuples(st.integers(0, 9), st.integers(0, 9))


def _cc_engine(name):
    from thrivefinancedatapipeline_spark.operators import dedup

    return {
        "minlabel": dedup.connected_components,
        "star": dedup.connected_components_star,
        # force the pure-distributed star fixpoint (no union-find tail)
        "star_distributed": lambda n, p: dedup.connected_components_star(
            n, p, driver_finish_max_edges=0
        ),
    }[name]


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(edge, min_size=0, max_size=14))
@pytest.mark.parametrize("engine", ["minlabel", "star", "star_distributed"])
def test_connected_components_match_union_find(spark, engine, edges):
    connected_components = _cc_engine(engine)

    nodes = list(range(10))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}

    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    edf = spark.createDataFrame(
        edges or [], "doc_id_1 long, doc_id_2 long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(ndf, edf).collect()
    }
    assert got == want


def test_cli_list_contains_all_queries(capsys):
    from thrivefinancedatapipeline_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    import __spark_entry__ as e

    assert set(out) == set(e.queries())
