"""Scenario tests for as-of join, range join, connected components,
and the advanced analytics plans — literal DataFrames, hand-computed
oracles (SURVEY §5 style)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators.asof import asof_join
from thrivefinancedatapipeline_spark.operators.dedup import connected_components
from thrivefinancedatapipeline_spark.plans import advanced


def ts(s):
    return f"2024-01-01 {s}"


def test_asof_picks_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [(1, "k", ts("10:00:00")), (2, "k", ts("10:05:00"))],
        "trade_id long, sym string, trade_ts string",
    ).withColumn("trade_ts", F.col("trade_ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [("k", ts("09:59:00"), 1.0), ("k", ts("10:00:00"), 2.0),
         ("k", ts("10:04:00"), 3.0), ("k", ts("10:06:00"), 4.0)],
        "sym string, quote_ts string, px double",
    ).withColumn("quote_ts", F.col("quote_ts").cast("timestamp"))
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="trade_ts", right_ts="quote_ts"
        ).collect()
    }
    # equal timestamp matches (ASOF <=); later quotes never leak back
    assert out == {1: 2.0, 2: 3.0}


def test_asof_no_prior_row_is_null(spark):
    trades = spark.createDataFrame(
        [(1, "k", ts("08:00:00"))], "trade_id long, sym string, trade_ts string"
    ).withColumn("trade_ts", F.col("trade_ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [("k", ts("09:00:00"), 1.0)], "sym string, quote_ts string, px double"
    ).withColumn("quote_ts", F.col("quote_ts").cast("timestamp"))
    row = asof_join(
        trades, quotes, on=["sym"], left_ts="trade_ts", right_ts="quote_ts"
    ).collect()[0]
    assert row.px is None and row.quote_ts is None


def test_asof_keys_are_independent(spark):
    trades = spark.createDataFrame(
        [(1, "a", ts("10:00:00")), (2, "b", ts("10:00:00"))],
        "trade_id long, sym string, trade_ts string",
    ).withColumn("trade_ts", F.col("trade_ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [("a", ts("09:00:00"), 1.0), ("b", ts("09:30:00"), 9.0)],
        "sym string, quote_ts string, px double",
    ).withColumn("quote_ts", F.col("quote_ts").cast("timestamp"))
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="trade_ts", right_ts="quote_ts"
        ).collect()
    }
    assert out == {1: 1.0, 2: 9.0}


def test_asof_forward_picks_earliest_at_or_after(spark):
    trades = spark.createDataFrame(
        [(1, "k", ts("10:00:00")), (2, "k", ts("10:07:00"))],
        "trade_id long, sym string, trade_ts string",
    ).withColumn("trade_ts", F.col("trade_ts").cast("timestamp"))
    quotes = spark.createDataFrame(
        [("k", ts("09:59:00"), 1.0), ("k", ts("10:00:00"), 2.0),
         ("k", ts("10:05:00"), 3.0)],
        "sym string, quote_ts string, px double",
    ).withColumn("quote_ts", F.col("quote_ts").cast("timestamp"))
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="trade_ts",
            right_ts="quote_ts", direction="forward",
        ).collect()
    }
    # equal timestamp matches (>=); trade 2 has nothing after → null
    assert out == {1: 2.0, 2: None}


def test_asof_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1, "k")], "x long, sym string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on=["sym"], left_ts="x", right_ts="x",
                  direction="sideways")


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, "k")], "x long, sym string")
    with pytest.raises(ValueError, match="collision"):
        asof_join(df, df, on=["sym"], left_ts="x", right_ts="x")


def test_connected_components_chain_and_isolate(spark):
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    # chain 0-1-2-3, pair 4-5 ... but written so min propagates multi-hop
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (0, 1), (4, 5)], "doc_id_1 long, doc_id_2 long"
    )
    out = {r.doc_id: r.cluster_id for r in connected_components(nodes, pairs).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_connected_components_no_edges(spark):
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(3)])
    pairs = spark.createDataFrame([], "doc_id_1 long, doc_id_2 long")
    out = {r.doc_id: r.cluster_id for r in connected_components(nodes, pairs).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_star_cc_chain_isolate_and_empty(spark):
    from thrivefinancedatapipeline_spark.operators.dedup import (
        connected_components_star,
    )

    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (0, 1), (4, 5)], "doc_id_1 long, doc_id_2 long"
    )
    out = {
        r.doc_id: r.cluster_id
        for r in connected_components_star(nodes, pairs).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}

    empty = spark.createDataFrame([], "doc_id_1 long, doc_id_2 long")
    out = {
        r.doc_id: r.cluster_id
        for r in connected_components_star(nodes, empty).collect()
    }
    assert out == {i: i for i in range(6)}


def test_star_cc_long_chain_beyond_minlabel_cap(spark):
    """An 80-node chain (diameter 79 > MAX_CC_ITERS=30) — min-label
    alone would need 79 rounds; the star algorithm needs O(log n)."""
    from thrivefinancedatapipeline_spark.operators import dedup

    n = 80
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_id_1 long, doc_id_2 long"
    )
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_star(nodes, pairs).collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_minlabel_cc_falls_back_to_star_on_deep_graph(spark, monkeypatch):
    """When min-label hits its iteration cap, the contracted graph is
    finished by the star algorithm — full convergence, no error."""
    from thrivefinancedatapipeline_spark.operators import dedup

    monkeypatch.setattr(dedup, "MAX_CC_ITERS", 3)
    n = 30  # diameter 29 >> 3
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_id_1 long, doc_id_2 long"
    )
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(nodes, pairs).collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_range_join_counts_touches_in_window(spark, sf_dir):
    out = advanced.q_range_join_touch_counts(spark, sf_dir)
    rows = out.collect()
    # one row per purchase, never negative
    assert len(rows) == len({r.purchase_id for r in rows})
    assert all(r.touches_1h >= 0 for r in rows)


def test_rollup_grand_total_consistent(spark, sf_dir):
    rows = advanced.q_revenue_rollup(spark, sf_dir).collect()
    total = [r for r in rows if r.grp == 3]
    leaves = [r for r in rows if r.grp == 0]
    assert len(total) == 1
    assert total[0].order_count == sum(r.order_count for r in leaves)


def test_pivot_row_sums_match_event_count(spark, sf_dir):
    from thrivefinancedatapipeline_spark.datamodel import load_table

    piv = advanced.q_daily_event_pivot(spark, sf_dir).collect()
    n = sum(
        r.n_click + r.n_error + r.n_purchase + r.n_signup + r.n_view for r in piv
    )
    assert n == load_table(spark, sf_dir, "events").count()


def test_star_cc_midloop_driver_finish(spark):
    # chain 0-1-2-...-9: 9 initial edges exceed a threshold of 5, so
    # the loop runs distributed rounds until the contracted edge set
    # fits, then the union-find tail finishes — exercising the
    # mid-loop driver-finish branch specifically
    from thrivefinancedatapipeline_spark.operators import dedup

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_id_1 long, doc_id_2 long"
    )
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_star(
            nodes, pairs, driver_finish_max_edges=5
        ).collect()
    }
    assert out == {i: 0 for i in range(10)}


def test_events_type_correlation_python_twin(spark, sf_dir):
    """Exact-integer Pearson frame equals a driver-side recompute, at
    every SF-safe scale: components exact, r2_signed_ppm via the same
    floor division, symmetric pair coverage."""
    from collections import defaultdict
    from itertools import combinations

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        events_type_correlation,
    )

    got = {
        (r.type_1, r.type_2): r
        for r in events_type_correlation(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    daily = defaultdict(int)
    for r in ev.collect():
        daily[(r.day, r.event_type)] += r.c
    daily = {k: v // 100 for k, v in daily.items()}
    days = sorted({d for d, _ in daily})
    types = sorted({t for _, t in daily})
    assert set(got) == set(combinations(types, 2))
    for t1, t2 in got:
        xs = [daily.get((d, t1), 0) for d in days]
        ys = [daily.get((d, t2), 0) for d in days]
        n = len(days)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num = n * sxy - sx * sy
        varx, vary = n * sxx - sx * sx, n * syy - sy * sy
        if varx == 0 or vary == 0:
            want_ppm = 0
        else:
            sign = 1 if num > 0 else (-1 if num < 0 else 0)
            want_ppm = sign * (num * num * 1_000_000 // (varx * vary))
        r = got[(t1, t2)]
        assert (r.n_days, r.sum_1, r.sum_2, r.sum_cross) == (n, sx, sy, sxy)
        assert r.r2_signed_ppm == want_ppm, (t1, t2)


def test_events_seasonal_decompose_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the STL-lite decomposition: Spark ==
    the DuckDB oracle (the round-6 driver check), plus the algebraic
    invariant sum(detr) == sum over dows of s_sum and per-(type,dow)
    residual sum == 0 (the defining property of a fitted seasonal
    mean in the common-denominator integer space)."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        SEASONAL_ORACLE,
        events_seasonal_decompose,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = events_seasonal_decompose(spark, d).collect()
        got = sorted(
            (r.day, r.event_type, r.c, r.trend_sum, r.detr, r.dow,
             r.s_sum, r.s_n, r.resid_num)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (day, et, int(c), int(ts_), int(dt), int(dw), int(ss),
             int(sn), int(rn))
            for day, et, c, ts_, dt, dw, ss, sn, rn in con.execute(
                SEASONAL_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"seasonal decompose mismatch at {d}"
        # residuals of a fitted group mean sum to zero per group
        by_group = {}
        for r in rows:
            by_group.setdefault((r.event_type, r.dow), []).append(
                r.resid_num
            )
        assert by_group
        for k, v in by_group.items():
            assert sum(v) == 0, f"nonzero residual sum for {k}"


def test_events_robust_anomalies_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the median/MAD robust anomaly query:
    Spark == DuckDB oracle, plus the robustness property that at most
    half the days per type can be flagged (a MAD-based flag's
    breakdown guarantee) and that med/mad are actual data values."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        ROBUST_ANOMALY_ORACLE,
        events_robust_anomalies,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = events_robust_anomalies(spark, d).collect()
        got = sorted(
            (r.day, r.event_type, r.c, r.med, r.dev, r.mad,
             r.is_anomaly)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (day, et, int(c), int(md), int(dv), int(ma), int(fl))
            for day, et, c, md, dv, ma, fl in con.execute(
                ROBUST_ANOMALY_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"robust anomalies mismatch at {d}"
        by_type = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        for et, rs in by_type.items():
            flagged = sum(r.is_anomaly for r in rs)
            assert flagged <= len(rs) / 2, (et, flagged, len(rs))
            cs = {r.c for r in rs}
            assert rs[0].med in cs


def test_weighted_median_price_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the weighted median: Spark == DuckDB
    oracle at two SFs, plus the defining property — the median price
    is a real data price, weight at-or-below it is >= half the
    total, and weight strictly below it is < half."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.advanced import (
        WEIGHTED_MEDIAN_ORACLE,
        weighted_median_price,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = weighted_median_price(spark, d).collect()
        got = sorted(
            (r.l_returnflag, r.median_price_cents, r.w_cum_at_median,
             r.w_total)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{d}/lineitem.parquet')"
        )
        want = sorted(
            (fl, int(mp), int(wc), int(wt))
            for fl, mp, wc, wt in con.execute(
                WEIGHTED_MEDIAN_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"weighted median mismatch at {d}"
        for r in rows:
            assert 2 * r.w_cum_at_median >= r.w_total
            w_at = r.w_cum_at_median
            # weight strictly below the median price must be < half
            # (otherwise a smaller price would satisfy the condition)
            from pyspark.sql import functions as F

            from thrivefinancedatapipeline_spark.datamodel import (
                load_table,
            )

            li = load_table(spark, d, "lineitem")
            below = (
                li.filter(F.col("l_returnflag") == r.l_returnflag)
                .filter(
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("long") < r.median_price_cents
                )
                .agg(F.coalesce(
                    F.sum(F.col("l_quantity").cast("long")), F.lit(0)
                ))
                .first()[0]
            )
            assert 2 * below < r.w_total
            assert below < w_at


def test_event_transition_matrix_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the Markov transition matrix: Spark
    == DuckDB oracle at two SFs, plus stochastic-matrix invariants
    (row ppm sums ~1e6; total transitions = total events - active
    users)."""
    import os

    import duckdb

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        TRANSITION_ORACLE,
        event_transition_matrix,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = event_transition_matrix(spark, d).collect()
        got = sorted(
            (r.from_type, r.to_type, r.n, r.n_from, r.p_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (ft, tt, int(n), int(nf), int(p))
            for ft, tt, n, nf, p in con.execute(
                TRANSITION_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"transition matrix mismatch at {d}"
        by_from = {}
        for r in rows:
            by_from.setdefault(r.from_type, []).append(r)
        for ft, rs in by_from.items():
            s = sum(r.p_ppm for r in rs)
            assert 1_000_000 - len(rs) < s <= 1_000_000, (ft, s)
            assert sum(r.n for r in rs) == rs[0].n_from
        ev = load_table(spark, d, "events")
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        assert sum(r.n for r in rows) == n_events - n_users


def test_funnel_latency_quantiles_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for time-to-convert quantiles: Spark ==
    DuckDB oracle at two SFs; quantiles are nondecreasing in q and
    nonnegative; n_converted matches the funnel's purchase stage."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        FUNNEL_LATENCY_ORACLE,
        funnel_latency_quantiles,
        q_events_funnel,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = funnel_latency_quantiles(spark, d).collect()
        got = sorted(
            (r.q, r.target_rank, r.n_converted, r.latency_us)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (int(q), int(t), int(n), int(l))
            for q, t, n, l in con.execute(
                FUNNEL_LATENCY_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"funnel latency mismatch at {d}"
        lats = [l for _, _, _, l in got]
        assert lats == sorted(lats)
        assert all(l >= 0 for l in lats)
        funnel = q_events_funnel(spark, d).collect()[0]
        assert got and got[0][2] == funnel.n_purchase_after_click


def test_session_top_paths_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for session path mining: Spark == DuckDB
    oracle at two SFs; counts nonincreasing with rank; paths are
    3-step strings over real event types."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        TOP_PATHS_K,
        TOP_PATHS_ORACLE,
        session_top_paths,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = session_top_paths(spark, d).collect()
        got = sorted((r.rank, r.path, r.n) for r in rows)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (int(rk), p, int(n))
            for rk, p, n in con.execute(TOP_PATHS_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"top paths mismatch at {d}"
        assert 1 <= len(got) <= TOP_PATHS_K
        ns = [n for _, _, n in sorted(got)]
        assert ns == sorted(ns, reverse=True)
        assert all(p.count(">") == 2 for _, p, _ in got)


def test_session_top_paths_single_user_exchange(spark, sf_dir):
    """The finer (user, session) window must reuse the user_id
    exchange (subset-clustering satisfaction) — one data shuffle
    before the tiny path groupBy."""
    from tests.test_plans import explain  # noqa: F401

    import contextlib
    import io

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        session_top_paths,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        session_top_paths(spark, sf_dir).explain(mode="simple")
    p = buf.getvalue()
    assert p.count("Exchange hashpartitioning(user_id") == 1, p


def test_events_burstiness_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; VMR
    components satisfy the Cauchy-Schwarz bound n*ss >= s^2."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        BURSTINESS_ORACLE,
        events_burstiness,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = events_burstiness(spark, d).collect()
        got = sorted(
            (r.event_type, r.n_days, r.total_events, r.sum_sq,
             r.vmr_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (et, int(a), int(b), int(c), int(e))
            for et, a, b, c, e in con.execute(
                BURSTINESS_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"burstiness mismatch at {d}"
        for _, n, s, ss, vmr in got:
            assert n * ss >= s * s  # Cauchy-Schwarz
            assert vmr >= 0


def test_events_hour_lift_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; per-type
    observed-weighted mean lift ~1e6 (the independence identity:
    sum_h o*lift = 1e6 * sum_h o up to truncation)."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        HOUR_LIFT_ORACLE,
        events_hour_lift,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = events_hour_lift(spark, d).collect()
        got = sorted(
            (r.event_type, r.hour, r.n_events, r.type_total,
             r.hour_total, r.lift_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (et, int(h), int(o), int(r_), int(c), int(l))
            for et, h, o, r_, c, l in con.execute(
                HOUR_LIFT_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"hour lift mismatch at {d}"
        # independence identity: EXPECTATION-weighted mean lift is 1
        # (sum_h (r*c/N)*lift = 1e6*r, i.e. sum_h c*lift ~ 1e6*N per
        # type); observed-weighted mean is NOT 1 — that inflated form
        # was tried first and the identity corrected.
        grand = {}
        for et, h, o, r_, c, l in got:
            grand.setdefault(et, []).append((c, l))
        n = sum(o for _, _, o, _, _, _ in got)
        for et, cells in grand.items():
            weighted = sum(c * l for c, l in cells)
            # each cell's truncation loses < 1 ppm, weighted by c
            assert abs(weighted - 1_000_000 * n) < 2 * n, (et, weighted)


def test_part_abc_classification_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for ABC: Spark == DuckDB at two SFs;
    classes partition the rank order A..B..C, cum_ppm is
    nondecreasing in rank and ends at ~1e6, and class-A revenue
    share really is <= 80%."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.advanced import (
        ABC_ORACLE,
        part_abc_classification,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = part_abc_classification(spark, d).collect()
        got = sorted(
            (r.rank, r.l_partkey, r.revenue_units, r.cum_ppm,
             r.abc_class)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{d}/lineitem.parquet')"
        )
        want = sorted(
            (int(rk), int(pk), rv, int(cp), cl)
            for pk, rk, rv, cp, cl in con.execute(ABC_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"abc mismatch at {d}"
        classes = [cl for _, _, _, _, cl in got]
        assert classes == sorted(classes)  # A block, then B, then C
        ppms = [cp for _, _, _, cp, _ in got]
        assert ppms == sorted(ppms)
        assert ppms[-1] in (999_999, 1_000_000)
        a_max = max(
            (cp for _, _, _, cp, cl in got if cl == "A"), default=0
        )
        assert a_max <= 800_000
        assert {"A", "C"} <= set(classes)


def test_events_type_correlation_vs_duckdb(spark, sf_dir):
    """r5 upgrade of the r4 prebuilt: the correlation frame now has a
    full DuckDB oracle (previously Python-twin only) — Spark ==
    oracle at two SFs."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.events_queries import (
        TYPE_CORRELATION_ORACLE,
        events_type_correlation,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = events_type_correlation(spark, d).collect()
        got = sorted(
            (r.type_1, r.type_2, r.n_days, r.sum_1, r.sum_2,
             r.sum_cross, r.r2_signed_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (t1, t2, int(n), int(a), int(b), int(c), int(r2))
            for t1, t2, n, a, b, c, r2 in con.execute(
                TYPE_CORRELATION_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"type correlation mismatch at {d}"
        for *_x, r2 in got:
            assert -1_000_000 <= r2 <= 1_000_000


def test_order_fulfillment_latency_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; per
    priority, quantile lags nondecreasing in q; 3 quantiles per
    priority class."""
    import os
    from collections import Counter

    import duckdb

    from thrivefinancedatapipeline_spark.plans.advanced import (
        FULFILLMENT_ORACLE,
        order_fulfillment_latency,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = order_fulfillment_latency(spark, d).collect()
        got = sorted(
            (r.o_orderpriority, r.q, r.target_rank, r.lag_days)
            for r in rows
        )
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        want = sorted(
            (p, int(q), int(t), int(l))
            for p, q, t, l in con.execute(FULFILLMENT_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"fulfillment mismatch at {d}"
        per = Counter(p for p, _, _, _ in got)
        assert all(v == 3 for v in per.values())
        by_p = {}
        for p, q, _, l in got:
            by_p.setdefault(p, []).append((q, l))
        for p, cells in by_p.items():
            cells.sort()
            lags = [l for _, l in cells]
            assert lags == sorted(lags)


def test_interpurchase_quantiles_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; quantile
    gaps nondecreasing in q; total gap count = purchases - active
    purchasers."""
    import os

    import duckdb

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        INTERPURCHASE_ORACLE,
        interpurchase_quantiles,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = interpurchase_quantiles(spark, d).collect()
        got = sorted(
            (r.q, r.target_rank, r.n_gaps, r.gap_days) for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(INTERPURCHASE_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"interpurchase mismatch at {d}"
        gaps = [g for _, _, _, g in got]
        assert gaps == sorted(gaps)
        ev = load_table(spark, d, "events").filter(
            F.col("event_type") == "purchase"
        )
        n_purch = ev.count()
        n_users = ev.select("user_id").distinct().count()
        assert got[0][2] == n_purch - n_users


def test_basket_part_pairs_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; supports
    nonincreasing with rank; pairs canonical (part_1 < part_2)."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.advanced import (
        BASKET_TOP_K,
        basket_part_pairs,
    )
    from thrivefinancedatapipeline_spark.plans.advanced import (
        BASKET_ORACLE,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = basket_part_pairs(spark, d).collect()
        got = sorted(
            (r.rank, r.part_1, r.part_2, r.support) for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{d}/lineitem.parquet')"
        )
        want = sorted(
            (int(rk), int(p1), int(p2), int(s))
            for rk, p1, p2, s in con.execute(BASKET_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"basket mismatch at {d}"
        assert 1 <= len(got) <= BASKET_TOP_K
        sups = [s for _, _, _, s in got]
        assert sups == sorted(sups, reverse=True)
        assert all(p1 < p2 for _, p1, p2, _ in got)
