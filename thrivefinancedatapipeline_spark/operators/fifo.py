"""FIFO matching: distributed REDEEMID assignment.

Semantics parity with reference src/fifo_matching.py:23
(``perform_fifo_matching_logic``):

- Matching is independent per customer.
- Spent/expired transactions are processed in CREATEDAT order; each one
  consumes the OLDEST still-available earned transaction (1:1, no
  splitting). Availability is NOT time-gated: the reference pops from
  the full per-customer earned list, so an earned row dated after the
  redeemer can be consumed (its validate_results step only warns).
- REDEEMID is populated ONLY on earned rows and points at the
  spent/expired TRANS_ID that consumed them; spent/expired rows always
  carry NULL REDEEMID.

Distributed formulation
-----------------------
Because earned rows are consumed strictly in per-customer CREATEDAT
order and redeemers fire strictly in per-customer CREATEDAT order, the
sequential loop is exactly the rank-equality join::

    earned   rank r  (row_number over customer ORDER BY createdat)
    redeemer rank r  (row_number over customer ORDER BY createdat)
    earned.redeemid = redeemer.trans_id  where ranks are equal

Tie-break: the reference relies on pandas' stable sort (input order) for
equal timestamps; we order by (createdat, trans_id) to make the result
deterministic under any partitioning. Both windows shuffle once by
CUSTOMERID; the join keys are (customerid, rn). At 100 TB this is two
hash shuffles on uniform keys — no driver-side loop, no skew hot-spot
beyond what AQE skew-join splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REDEEMER_TYPES = ("spent", "expired")


def fifo_match(transactions: DataFrame) -> DataFrame:
    """Assign REDEEMID to earned transactions (reference parity).

    Input columns: trans_id, tctype, createdat, customerid, amount.
    Output: same + redeemid (NULL for spent/expired and for unmatched
    earned).

    Single-shuffle formulation: collect each customer's transactions
    into a sorted array, split earned/redeemers, and pair them by
    index with array expressions (whole-stage codegen, no second
    shuffle, no join). 2x faster than the rank-join at sf0.1 and
    strictly fewer exchanges at cluster scale. Assumes one customer's
    transaction history fits in executor memory — true by orders of
    magnitude for rewards data; for pathological keys use
    fifo_match_rank_join (same semantics, bounded memory).
    """
    row = F.struct("createdat", "trans_id", "tctype", "amount")
    per = transactions.groupBy("customerid").agg(
        F.sort_array(F.collect_list(row)).alias("rows")
    )
    earned = F.filter(F.col("rows"), lambda r: r["tctype"] == "earned")
    redeem = F.filter(F.col("rows"), lambda r: r["tctype"] != "earned")
    per = per.select("customerid", earned.alias("e"), redeem.alias("r"))

    id_type = transactions.schema["trans_id"].dataType

    def out_struct(x, redeemid):
        return F.struct(
            x["trans_id"].alias("trans_id"),
            x["tctype"].alias("tctype"),
            x["createdat"].alias("createdat"),
            x["amount"].alias("amount"),
            redeemid.alias("redeemid"),
        )

    matched_earned = F.transform(
        F.col("e"), lambda x, i: out_struct(x, F.get(F.col("r"), i)["trans_id"])
    )
    redeemer_rows = F.transform(
        F.col("r"), lambda x: out_struct(x, F.lit(None).cast(id_type))
    )
    return (
        per.select(
            "customerid",
            F.explode(F.concat(matched_earned, redeemer_rows)).alias("t"),
        )
        .select(
            "t.trans_id", "t.tctype", "t.createdat", "customerid",
            "t.amount", "t.redeemid",
        )
    )


def fifo_match_arrow(transactions: DataFrame) -> DataFrame:
    """fifo_match with the per-customer pairing in a vectorized numpy
    kernel behind ONE mapInArrow (guide §4.2) instead of interpreted
    array HOFs: same single groupBy(customerid) shuffle, then the
    sort/split/pair runs as flat whole-batch numpy (lexsort +
    segmented cumsum ranks) rather than per-element interpreted
    sort_array/filter/transform. Output rows identical to fifo_match
    (both implement the rank-equality pairing over the
    (createdat, trans_id) total order; trans_id is unique so the
    struct sort and the lexsort agree; pinned in tests/test_fifo.py).

    Measured r20 (interleaved steal-gated A/B, tools/ab_r20.py):
    0.96x at sf0.1 but 1.04x at a x32 derived transaction relation —
    the Arrow round trip of the full payload grows with data while
    the interpreted-HOF saving does not. NOT adopted for
    fifo_matching (no scale win for an extra Python boundary on the
    flagship finance path); kept as the measured alternative the A/B
    harness exercises.
    """
    from pyspark.sql.types import StructField, StructType

    sch = transactions.schema
    out_schema = StructType(
        [
            StructField("trans_id", sch["trans_id"].dataType),
            StructField("tctype", sch["tctype"].dataType),
            StructField("createdat", sch["createdat"].dataType),
            StructField("customerid", sch["customerid"].dataType),
            StructField("amount", sch["amount"].dataType),
            StructField("redeemid", sch["trans_id"].dataType),
        ]
    )

    row = F.struct("createdat", "trans_id", "tctype", "amount")
    per = transactions.groupBy("customerid").agg(
        F.collect_list(row).alias("rows")
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            lst = b.column("rows")
            counts = lst.value_lengths().to_numpy(zero_copy_only=False)
            vals = lst.flatten()
            n = len(vals)
            if n == 0:
                continue
            parent = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                               counts)
            created = vals.field("createdat")
            tid = vals.field("trans_id").to_numpy(zero_copy_only=False)
            created_i8 = created.cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ise = pa.compute.equal(
                vals.field("tctype"), "earned"
            ).to_numpy(zero_copy_only=False)

            # one customer's rows are contiguous (one list per row);
            # lexsort with parent primary keeps groups contiguous and
            # orders (createdat, trans_id) within — the struct-sort
            # total order of fifo_match.
            order = np.lexsort((tid, created_i8, parent))
            p_s = parent[order]
            ise_s = ise[order]

            grp_start = np.empty(n, dtype=bool)
            grp_start[0] = True
            np.not_equal(p_s[1:], p_s[:-1], out=grp_start[1:])
            gid = np.cumsum(grp_start) - 1
            ngroups = int(gid[-1]) + 1
            starts = np.flatnonzero(grp_start)
            glens = np.diff(np.append(starts, n))

            red_mask = ~ise_s
            # sorted-coordinate positions of redeemers: groupwise
            # contiguous, already in (createdat, trans_id) rank order
            red_pos = np.flatnonzero(red_mask)
            r_total = np.bincount(gid[red_mask], minlength=ngroups)
            r_off = np.concatenate(([0], np.cumsum(r_total)))

            e_cum = np.cumsum(ise_s)
            prev_e = np.concatenate(([0], e_cum[starts[1:] - 1]))
            e_rank = e_cum - np.repeat(prev_e, glens)  # 1-based

            valid = ise_s & (e_rank <= r_total[gid])
            # original-coordinate index of each earned row's matching
            # redeemer; type-agnostic: redeemid is materialized by an
            # Arrow take (null index -> null), never through numpy
            match_orig = np.zeros(n, dtype=np.int64)
            match_orig[valid] = order[
                red_pos[r_off[gid[valid]] + e_rank[valid] - 1]
            ]
            take_idx = pa.array(match_orig, mask=~valid)

            oidx = pa.array(order)
            yield pa.RecordBatch.from_arrays(
                [
                    vals.field("trans_id").take(oidx),
                    vals.field("tctype").take(oidx),
                    created.take(oidx),
                    b.column("customerid").take(pa.array(p_s)),
                    vals.field("amount").take(oidx),
                    vals.field("trans_id").take(take_idx),
                ],
                names=[
                    "trans_id", "tctype", "createdat", "customerid",
                    "amount", "redeemid",
                ],
            )

    return per.mapInArrow(kernel, out_schema)


def fifo_match_rank_join(transactions: DataFrame) -> DataFrame:
    """Rank-equality-join formulation of fifo_match: identical output,
    two window shuffles + one join, but per-row (not per-customer)
    memory — the fallback when a single key's history is huge.
    """
    w = Window.partitionBy("customerid").orderBy("createdat", "trans_id")

    earned = (
        transactions.filter(F.col("tctype") == "earned")
        .withColumn("rn", F.row_number().over(w))
    )
    redeemers = (
        transactions.filter(F.col("tctype").isin(*REDEEMER_TYPES))
        .withColumn("rn", F.row_number().over(w))
    )

    matched_earned = earned.join(
        redeemers.select(
            "customerid", "rn", F.col("trans_id").alias("redeemid")
        ),
        on=["customerid", "rn"],
        how="left",
    ).select(
        "trans_id", "tctype", "createdat", "customerid", "amount", "redeemid"
    )

    redeemer_rows = redeemers.select(
        "trans_id",
        "tctype",
        "createdat",
        "customerid",
        "amount",
        F.lit(None).cast(transactions.schema["trans_id"].dataType).alias("redeemid"),
    )

    return matched_earned.unionByName(redeemer_rows)


def validate_results(matched: DataFrame) -> DataFrame:
    """Distributed re-expression of reference
    src/thrive_cash_processing_dag.py:289 (``validate_results``).

    Returns a violations table (check STRING, customerid BIGINT,
    detail STRING) — empty when the output is consistent. Each check is
    a declarative aggregate/join; none iterate on the driver.

    Checks (reference parity):
      1. redeemid values must reference earned TRANS_IDs (ref: 325).
      2. a redeemer TRANS_ID may be used at most once (1:1 matching).
      3. per-customer balance equation: earned == spent + expired +
         unmatched-earned, in absolute value (ref: 335).
      4. redeemid must never be populated on spent/expired rows.
    """
    earned_ids = matched.filter(F.col("tctype") == "earned").select(
        F.col("trans_id").alias("earned_tid")
    )
    redeems = matched.filter(F.col("redeemid").isNotNull())

    bad_rows = (
        redeems.join(
            matched.filter(F.col("tctype").isin(*REDEEMER_TYPES))
            .select(F.col("trans_id").alias("rid")),
            redeems["redeemid"] == F.col("rid"),
            "left_anti",
        )
        .select(
            F.lit("redeemid_not_a_redeemer").alias("check"),
            F.col("customerid"),
            F.col("redeemid").cast("string").alias("detail"),
        )
    )

    dup_use = (
        redeems.groupBy("redeemid")
        .agg(F.count("*").alias("uses"), F.first("customerid").alias("customerid"))
        .filter(F.col("uses") > 1)
        .select(
            F.lit("redeemer_used_more_than_once").alias("check"),
            F.col("customerid"),
            F.col("redeemid").cast("string").alias("detail"),
        )
    )

    misplaced = (
        matched.filter(
            F.col("tctype").isin(*REDEEMER_TYPES)
            & F.col("redeemid").isNotNull()
        )
        .select(
            F.lit("redeemid_on_redeemer_row").alias("check"),
            F.col("customerid"),
            F.col("trans_id").cast("string").alias("detail"),
        )
    )

    balance = (
        matched.groupBy("customerid")
        .agg(
            F.sum(F.when(F.col("tctype") == "earned", F.col("amount")).otherwise(0.0)).alias("earned"),
            F.sum(F.when(F.col("tctype") == "spent", F.abs(F.col("amount"))).otherwise(0.0)).alias("spent"),
            F.sum(F.when(F.col("tctype") == "expired", F.abs(F.col("amount"))).otherwise(0.0)).alias("expired"),
            F.sum(
                F.when(
                    (F.col("tctype") == "earned") & F.col("redeemid").isNull(),
                    F.col("amount"),
                ).otherwise(0.0)
            ).alias("remaining"),
        )
        .filter(
            F.abs(F.col("earned") - (F.col("spent") + F.col("expired") + F.col("remaining")))
            > 0.01
        )
        .select(
            F.lit("balance_mismatch").alias("check"),
            F.col("customerid"),
            F.concat_ws(
                "/",
                F.round("earned", 2).cast("string"),
                F.round("spent", 2).cast("string"),
                F.round("expired", 2).cast("string"),
                F.round("remaining", 2).cast("string"),
            ).alias("detail"),
        )
    )

    # NOTE: the reference's balance equation only holds when every
    # redeemer found an earned match (its test data guarantees a
    # surplus of earned). With 1:1 value-ignoring matching, unmatched
    # REDEEMERS leave the equation short — mirror the reference by
    # flagging, not failing, via the violations table.
    return bad_rows.unionByName(dup_use).unionByName(misplaced).unionByName(balance)
