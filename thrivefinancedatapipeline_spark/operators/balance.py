"""Balance analytics: cumulative per-customer balance history.

Parity with reference src/thrive_cash_processing_dag.py:426
(``build_analytics``): for every transaction, the cumulative earned /
spent / expired (absolute values) up to and including it, and the
running balance. The reference loops customers on the driver and
iterates rows; here it is three window sums over one shuffle by
customerid — identical output, distributed.

Ordering parity: the reference sorts by CREATEDAT (stable); we order by
(createdat, trans_id) for determinism. Output column names follow the
reference's balance-history CSV header
(customer_id, transaction_date, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def balance_history(matched: DataFrame) -> DataFrame:
    """Per-transaction cumulative balance ledger.

    Input: fifo_match() output (redeemid unused here — kept lazy so
    Catalyst prunes it; callers may pass the raw transaction table).

    r19: columns are renamed to the output header BEFORE the window,
    so the window's hash partitioning is carried by `customer_id`
    itself. With the rename below the window (the old shape), every
    downstream per-customer aggregate re-shuffled: the alias was
    created under the exchange, and above the window only the renamed
    attribute survives — Spark can no longer prove
    hashpartitioning(customerid) covers customer_id (the
    balance_scd2 aliasing lesson applied one level down). Measured:
    current_balances / balance_asof drop from 2 exchanges to 1;
    window sums are bit-identical (same partition, same order, same
    values, same fold order).
    """
    t = matched.select(
        F.col("customerid").alias("customer_id"),
        F.col("createdat").alias("transaction_date"),
        F.col("trans_id").alias("transaction_id"),
        F.col("tctype").alias("transaction_type"),
        F.col("amount").alias("transaction_amount"),
    )
    w = (
        Window.partitionBy("customer_id")
        .orderBy("transaction_date", "transaction_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = lambda ty: F.sum(  # noqa: E731
        F.when(F.col("transaction_type") == ty,
               F.abs(F.col("transaction_amount"))).otherwise(0.0)
    ).over(w)

    return t.select(
        "customer_id",
        "transaction_date",
        "transaction_id",
        "transaction_type",
        "transaction_amount",
        cum("earned").alias("cumulative_earned"),
        cum("spent").alias("cumulative_spent"),
        cum("expired").alias("cumulative_expired"),
        (cum("earned") - cum("spent") - cum("expired")).alias("current_balance"),
    )


def balance_scd2(matched: DataFrame) -> DataFrame:
    """Type-2 slowly-changing dimension from the transaction stream:
    each balance state becomes a validity row [effective_from,
    effective_to) with an is_current flag — queryable as-of any time.

    Computed in ONE pass over the original columns (not on top of
    `balance_history`'s aliased output): the cumulative sums and the
    lead() share the same (customerid, createdat, trans_id) window
    spec, so the whole dimension build is one exchange + one sort
    (asserted in tests/test_plans.py). Stacking a lead() window on the
    renamed history frame instead costs a second full shuffle — alias
    projection loses partitioning provenance once the original
    attribute leaves the plan."""
    w = Window.partitionBy("customerid").orderBy("createdat", "trans_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = lambda t: F.sum(  # noqa: E731
        F.when(F.col("tctype") == t, F.abs(F.col("amount"))).otherwise(0.0)
    ).over(wc)
    nxt = F.lead("createdat").over(w)
    return matched.select(
        F.col("customerid").alias("customer_id"),
        F.round(cum("earned") - cum("spent") - cum("expired"), 2).alias(
            "balance"
        ),
        F.col("createdat").alias("effective_from"),
        F.col("trans_id").alias("transaction_id"),
        nxt.alias("effective_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


def current_balances(history: DataFrame) -> DataFrame:
    """Latest balance per customer (reference: groupby().last()).

    max_by over the deterministic (transaction_date, transaction_id)
    order key — a single partial-aggregable groupBy, no window needed.
    """
    key = F.struct("transaction_date", "transaction_id")
    pick = lambda c: F.max_by(F.col(c), key).alias(c)  # noqa: E731
    return history.groupBy(F.col("customer_id")).agg(
        pick("current_balance"),
        pick("cumulative_earned"),
        pick("cumulative_spent"),
        pick("cumulative_expired"),
    )


def scd2_apply_increment(
    prev_dim: DataFrame, new_txns: DataFrame
) -> DataFrame:
    """MERGE-INTO upsert for the SCD2 dimension: close each affected
    customer's current row at the first new transaction and append the
    new validity rows, balances continuing from the closed row.

    The monthly-run pattern at 100 TB: the dimension is touched only
    where deltas exist — prior history is never re-read or re-sorted;
    the only window runs over the (small) new batch. Contract: every
    row of `new_txns` is at-or-after every transaction already in
    `prev_dim` (the reference's monthly-export reality — the same
    split `incremental_balance_update` assumes). Output equals a full
    `balance_scd2` recompute over (old ∪ new), proven by the
    cross-formulation oracle of `balance_scd2_incremental` and
    tests/test_incremental.py."""
    w = Window.partitionBy("customerid").orderBy("createdat", "trans_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    signed = F.when(
        F.col("tctype") == "earned", F.abs(F.col("amount"))
    ).otherwise(-F.abs(F.col("amount")))
    nxt = F.lead("createdat").over(w)
    incr = new_txns.select(
        F.col("customerid").alias("customer_id"),
        F.sum(signed).over(wc).alias("cum_delta"),
        F.col("createdat").alias("effective_from"),
        F.col("trans_id").alias("transaction_id"),
        nxt.alias("effective_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )
    base = prev_dim.filter(F.col("is_current") == 1).select(
        "customer_id", F.col("balance").alias("prev_balance")
    )
    firsts = incr.groupBy("customer_id").agg(
        F.min("effective_from").alias("first_new")
    )
    new_rows = incr.join(base, "customer_id", "left").select(
        "customer_id",
        F.round(
            F.coalesce(F.col("prev_balance"), F.lit(0.0))
            + F.col("cum_delta"),
            2,
        ).alias("balance"),
        "effective_from",
        "transaction_id",
        "effective_to",
        "is_current",
    )
    closing = F.col("is_current") == 1
    closed = prev_dim.join(firsts, "customer_id", "left").select(
        "customer_id",
        "balance",
        "effective_from",
        "transaction_id",
        F.when(closing, F.coalesce(F.col("first_new"), F.col("effective_to")))
        .otherwise(F.col("effective_to"))
        .alias("effective_to"),
        F.when(closing & F.col("first_new").isNotNull(), F.lit(0))
        .otherwise(F.col("is_current"))
        .cast("int")
        .alias("is_current"),
    )
    return closed.unionByName(new_rows)


def incremental_balance_update(
    prev_balances: DataFrame, new_txns: DataFrame
) -> DataFrame:
    """Fold a new batch of transactions into a prior balance snapshot
    WITHOUT touching history — the monthly-run pattern at 100 TB: the
    snapshot is orders of magnitude smaller than the ledger, and the
    new month is the only data read. One aggregation over the new
    batch + one key join (broadcast-able when the delta's customer set
    is small); output schema == current_balances, and equals a full
    recompute over (old ∪ new) — proven in tests/test_incremental.py.
    """
    delta_sum = lambda t: F.sum(  # noqa: E731
        F.when(F.col("tctype") == t, F.abs(F.col("amount"))).otherwise(0.0)
    )
    deltas = new_txns.groupBy(
        F.col("customerid").alias("customer_id")
    ).agg(
        delta_sum("earned").alias("d_earned"),
        delta_sum("spent").alias("d_spent"),
        delta_sum("expired").alias("d_expired"),
    )
    z = F.lit(0.0)
    merged = prev_balances.join(deltas, "customer_id", "full_outer")
    add = lambda cum, d: (  # noqa: E731
        F.coalesce(F.col(cum), z) + F.coalesce(F.col(d), z)
    ).alias(cum)
    e = add("cumulative_earned", "d_earned")
    s = add("cumulative_spent", "d_spent")
    x = add("cumulative_expired", "d_expired")
    return merged.select(
        "customer_id",
        (
            F.coalesce(F.col("cumulative_earned"), z)
            + F.coalesce(F.col("d_earned"), z)
            - F.coalesce(F.col("cumulative_spent"), z)
            - F.coalesce(F.col("d_spent"), z)
            - F.coalesce(F.col("cumulative_expired"), z)
            - F.coalesce(F.col("d_expired"), z)
        ).alias("current_balance"),
        e,
        s,
        x,
    )


def balance_asof(history: DataFrame, asof: str) -> DataFrame:
    """Balance as of a date (sample_queries.sql Q1): last history row
    with transaction_date <= asof, per customer."""
    key = F.struct("transaction_date", "transaction_id")
    return (
        history.filter(F.col("transaction_date") <= F.lit(asof).cast("timestamp"))
        .groupBy("customer_id")
        .agg(
            F.max("transaction_date").alias("balance_as_of_date"),
            F.max_by(F.col("current_balance"), key).alias("thrive_cash_balance"),
        )
    )
