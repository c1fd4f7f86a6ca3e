"""Monthly-grain balance_bucket_migration on a synthetic multi-month
corpus — the production cadence exercised for real, not just
parameterized (r9 VERDICT item 5; the test_drift_weekly.py pattern).

The corpus spans six months with customers engineered to cross the
fixed bucket thresholds, skip months (active-period semantics), and —
crucially — cross a bucket INSIDE a month and come back, so the daily
and monthly matrices genuinely differ: a vacuous grain swap (same
output at both grains) could not detect a format-string bug.
Spark == DuckDB is pinned at BOTH grains via the same oracle builder
the registered daily query uses, and the monthly matrix is also
recomputed independently in exact-integer Python from the raw rows."""

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

#: (customer, month 1-6, day-of-month, event_type, value dollars)
#: 'click' -> earned (+), 'purchase' -> spent (-), 'error' -> expired (-)
ROWS = [
    # cust 1: steady +50/month, all six months: low,low,mid,mid,mid,mid
    *[(1, m, 5, "click", 50.0) for m in range(1, 7)],
    # cust 2: mid -> high -> deep spend to negative -> partial recovery
    (2, 1, 3, "click", 600.0),
    (2, 2, 9, "click", 600.0),
    (2, 3, 14, "purchase", 1500.0),
    (2, 4, 2, "click", 100.0),
    # cust 3: active months 1, 3, 6 ONLY (transitions skip the gaps)
    (3, 1, 7, "click", 80.0),
    (3, 3, 21, "click", 40.0),
    (3, 6, 28, "error", 200.0),
    # cust 4: intra-month excursion — month 2 spikes to $520 (mid) and
    # falls back inside the month; monthly sees low->low, daily sees
    # low->mid->low. THE non-vacuous-grain customer.
    (4, 1, 10, "click", 30.0),
    (4, 2, 4, "click", 490.0),
    (4, 2, 25, "purchase", 480.0),
    (4, 3, 15, "click", 10.0),
]


def _corpus(tmp_path):
    ev_ids, tss, uids, types, vals = [], [], [], [], []
    for i, (cust, mon, day, etype, val) in enumerate(ROWS):
        ev_ids.append(i + 1)
        tss.append(datetime.datetime(1970, mon, day, 12, 0))
        uids.append(cust)
        types.append(etype)
        vals.append(val)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ev_ids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def _duck(d, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return sorted(tuple(r) for r in rows)


def _python_matrix(grain_of_row):
    """Exact-integer recompute: fold ROWS into per-(cust, period) net
    cents, then walk active periods in order with bucket_of_cents."""
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        bucket_of_cents,
    )

    net = {}
    for cust, mon, day, etype, val in ROWS:
        cents = round(val * 100)
        if etype in ("purchase", "error"):
            cents = -cents
        key = (cust, grain_of_row(mon, day))
        net[key] = net.get(key, 0) + cents
    matrix = {}
    for cust in {c for c, _ in net}:
        periods = sorted(p for c, p in net if c == cust)
        bal, prev = 0, None
        for p in periods:
            bal += net[(cust, p)]
            b = bucket_of_cents(bal)
            if prev is not None:
                matrix[(prev, b)] = matrix.get((prev, b), 0) + 1
            prev = b
    return sorted((f, t, n) for (f, t), n in matrix.items())


def test_monthly_bucket_migration_parity_and_grain(spark, tmp_path):
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        balance_bucket_migration,
        bucket_migration_oracle,
    )

    d = _corpus(tmp_path)
    monthly = sorted(
        tuple(r)
        for r in balance_bucket_migration(
            spark, d, period_fmt="yyyy-MM"
        ).collect()
    )
    daily = sorted(
        tuple(r) for r in balance_bucket_migration(spark, d).collect()
    )

    # Spark == DuckDB at BOTH grains, same oracle builder
    assert monthly == _duck(d, bucket_migration_oracle("%Y-%m"))
    assert daily == _duck(d, bucket_migration_oracle())

    # Spark == independent exact-integer Python recompute
    assert monthly == _python_matrix(lambda m, _d: m)
    assert daily == _python_matrix(lambda m, d_: (m, d_))

    # the grain is REAL on this corpus: customer 4's intra-month
    # excursion gives daily a low->mid and mid->low edge that the
    # monthly matrix must not contain
    monthly_edges = {(f, t) for f, t, _ in monthly}
    daily_edges = {(f, t) for f, t, _ in daily}
    assert ("low", "mid") in daily_edges and ("mid", "low") in daily_edges
    assert ("mid", "low") not in monthly_edges

    # transition conservation: one edge per consecutive active period
    def active_periods(grain_of_row):
        seen = set()
        for cust, mon, day, _e, _v in ROWS:
            seen.add((cust, grain_of_row(mon, day)))
        per_cust = {}
        for cust, _p in seen:
            per_cust[cust] = per_cust.get(cust, 0) + 1
        return sum(n - 1 for n in per_cust.values())

    assert sum(n for _f, _t, n in monthly) == active_periods(
        lambda m, _d: m
    )
    assert sum(n for _f, _t, n in daily) == active_periods(
        lambda m, d_: (m, d_)
    )
