"""Balance history / current balance analytics tests.

Mirrors the reference's build_analytics semantics
(reference src/thrive_cash_processing_dag.py:426): cumulative abs
amounts per type and running balance per customer.
"""

from datetime import datetime

from pyspark.sql import Row

from thrivefinancedatapipeline_spark.operators.balance import (
    balance_asof,
    balance_history,
    current_balances,
)

SCHEMA = "trans_id string, tctype string, createdat timestamp, customerid string, amount double"


def txn(tid, tctype, ts, cust, amount):
    return Row(trans_id=tid, tctype=tctype,
               createdat=datetime.fromisoformat(ts),
               customerid=cust, amount=float(amount))


ROWS = [
    txn("E1", "earned", "2024-01-01", "C1", 100.0),
    txn("E2", "earned", "2024-01-03", "C1", 50.0),
    txn("S1", "spent", "2024-01-05", "C1", -60.0),
    txn("X1", "expired", "2024-01-07", "C1", -20.0),
    txn("E3", "earned", "2024-01-02", "C2", 10.0),
]


def test_balance_history_cumulative(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    hist = {
        (r.customer_id, r.transaction_id): r
        for r in balance_history(df).collect()
    }
    assert hist[("C1", "E1")].current_balance == 100.0
    assert hist[("C1", "E2")].current_balance == 150.0
    assert hist[("C1", "S1")].current_balance == 90.0
    assert hist[("C1", "S1")].cumulative_spent == 60.0
    assert hist[("C1", "X1")].current_balance == 70.0
    assert hist[("C1", "X1")].cumulative_expired == 20.0
    assert hist[("C2", "E3")].current_balance == 10.0


def test_current_balances_picks_last(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    cur = {r.customer_id: r for r in current_balances(balance_history(df)).collect()}
    assert cur["C1"].current_balance == 70.0
    assert cur["C1"].cumulative_earned == 150.0
    assert cur["C2"].current_balance == 10.0


def test_balance_asof(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    asof = {
        r.customer_id: r
        for r in balance_asof(balance_history(df), "2024-01-05 12:00:00").collect()
    }
    assert asof["C1"].thrive_cash_balance == 90.0  # after S1, before X1
    assert asof["C2"].thrive_cash_balance == 10.0


def test_scd2_intervals_tile_each_customer(spark, sf_dir):
    """Validity intervals must chain: sorted per customer, each row's
    effective_to equals the next row's effective_from, exactly one
    is_current row per customer, and the current balance equals
    current_balances."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.balance import (
        balance_history,
        balance_scd2,
        current_balances,
    )
    from thrivefinancedatapipeline_spark.sources.ingest import (
        transactions_from_events,
    )

    txns = transactions_from_events(load_table(spark, sf_dir, "events"))
    rows = balance_scd2(txns).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.customer_id, []).append(r)
    cur = {
        r.customer_id: round(r.current_balance, 2)
        for r in current_balances(balance_history(txns)).collect()
    }
    assert set(by_cust) == set(cur)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: (r.effective_from, r.transaction_id))
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].is_current == 1 and rs[-1].effective_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.effective_to == b.effective_from
        assert round(rs[-1].balance, 2) == cur[cust]


def test_overdraft_flags_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the overdraft screen: Spark == DuckDB
    oracle at two SFs, plus ledger invariants (post = prev + amount
    to the cent; crossed_zero implies is_overdraft; at most one
    crossing per run of negative balance)."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        OVERDRAFT_ORACLE,
        overdraft_flags,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = overdraft_flags(spark, d).collect()
        got = sorted(
            (r.transaction_id, r.customer_id, r.transaction_date,
             r.amount, r.prev_balance, r.post_balance, r.is_overdraft,
             r.crossed_zero)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (int(t), int(c), td, float(a), float(pb), float(po),
             int(io_), int(cz))
            for t, c, td, a, pb, po, io_, cz in con.execute(
                OVERDRAFT_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"overdraft mismatch at {d}"
        for r in rows:
            assert r.crossed_zero <= r.is_overdraft
            # spent amounts are negative; ledger adds to the cent
            assert r.amount < 0
            assert (
                abs(round(r.prev_balance + r.amount, 2)
                    - r.post_balance) < 0.011
            )
        assert any(r.is_overdraft for r in rows)


def test_balance_snapshot_diff_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the snapshot diff: Spark == DuckDB
    oracle at two SFs, plus reconciliation invariants: t2 snapshot
    equals balance_asof at T2; 'inserted' rows have no T1 balance;
    every class is present at sf0.01-scale data."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        SNAPSHOT_DIFF_ORACLE,
        balance_snapshot_diff,
        q_balance_asof,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = balance_snapshot_diff(spark, d).collect()
        got = sorted(
            (r.customer_id, r.balance_t1, r.balance_t2, r.change_type)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            (int(c), None if b1 is None else float(b1), float(b2), ct)
            for c, b1, b2, ct in con.execute(
                SNAPSHOT_DIFF_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"snapshot diff mismatch at {d}"
        asof = {
            r.customer_id: r.thrive_cash_balance
            for r in q_balance_asof(spark, d).collect()
        }
        for r in rows:
            assert abs(r.balance_t2 - asof[r.customer_id]) < 0.005
            if r.change_type == "inserted":
                assert r.balance_t1 is None
            else:
                assert r.balance_t1 is not None
        kinds = {r.change_type for r in rows}
        assert "changed" in kinds


def test_customer_rfm_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for RFM: Spark == DuckDB at two SFs;
    quartiles near-balanced (ntile contract) and rfm code composes
    the three digits."""
    import os
    from collections import Counter

    import duckdb

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        RFM_ORACLE,
        customer_rfm,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = customer_rfm(spark, d).collect()
        got = sorted(
            (r.customer_id, r.recency_days, r.frequency,
             r.monetary_cents, r.r_quartile, r.f_quartile,
             r.m_quartile, r.rfm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(RFM_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"rfm mismatch at {d}"
        for q in (4, 5, 6):  # the three quartile columns
            c = Counter(row[q] for row in got)
            assert set(c) <= {1, 2, 3, 4}
            assert max(c.values()) - min(c.values()) <= 1
        for row in got:
            assert row[7] == row[4] * 100 + row[5] * 10 + row[6]


def test_cohort_ltv_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the LTV triangle: Spark == DuckDB at
    two SFs; cumulative spend nondecreasing per cohort; age-0 cell
    present for every cohort with active <= cohort_size."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        COHORT_LTV_ORACLE,
        cohort_ltv,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = cohort_ltv(spark, d).collect()
        got = sorted(
            (r.cohort_week, r.age_weeks, r.cohort_size,
             r.active_customers, r.spend_cents, r.cum_spend_cents)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(COHORT_LTV_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"cohort ltv mismatch at {d}"
        by_cohort = {}
        for row in got:
            by_cohort.setdefault(row[0], []).append(row)
        for cw, cells in by_cohort.items():
            cells.sort(key=lambda r: r[1])
            assert cells[0][1] == 0  # first-spend week is age 0
            cums = [r[5] for r in cells]
            assert cums == sorted(cums)
            assert all(r[3] <= r[2] for r in cells)
