"""General analytics plans (TPC-H-style) — the batch-ETL workload class
the reference's finance pipeline represents, re-expressed over the
engine's star schema.

Scale notes (100 TB posture):
- region/nation/supplier/part are dimension tables → broadcast joins
  (explicit F.broadcast so the plan survives stats drift).
- Aggregations are partial-aggregable (map-side combine for free).
- Date filters sit directly on the parquet scan (pushed filters).
- Money math is FIXED-POINT: 2-decimal inputs are scaled to integer
  cents before multiplying/summing, accumulated in decimal(38,0)
  (exact, overflow-safe at 100 TB row counts), and only divided back
  to dollars at the very end. This makes results bit-identical across
  engines and partitionings — float summation order can otherwise flip
  a ROUND(x, 2) at a .xx50 boundary.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _cents(col: str) -> Column:
    """2-decimal double → exact integer hundredths."""
    return F.round(F.col(col) * 100, 0).cast("long")


def _exact_sum(c: Column) -> Column:
    """Overflow-safe exact integer sum (decimal 38,0 accumulator).

    Stays DECIMAL — no double cast — so `_money` can round to cents in
    exact integer space. Downstream ratio sites promote to double at
    their division."""
    return F.sum(c.cast("decimal(38,0)"))


def _money(scaled_sum: Column, scale: int) -> Column:
    """Scaled exact-integer sum → dollars rounded to cents.

    The cents rounding happens HALF-UP IN INTEGER SPACE
    (floor((s + d/2) / d), d = scale/100) before the only double
    division (/100, whose result is an exact 2-decimal value — both
    engines render it identically). round(double_division, 2) is NOT
    engine-stable: a sum landing on a .xx5 boundary (e.g. revenue
    3078435950/10^4 = 307843.595) rounds up under Spark's decimal
    HALF_UP but down under DuckDB's binary-double rounding — the
    exact 1-cent mismatch the stricter local hash caught on
    tpch_q10. The quotient's fractional part has <= 4 decimal digits,
    within Spark's decimal-division scale of 6, so the floor is exact.
    """
    d = scale // 100
    if d > 1:
        cents = F.floor((scaled_sum + F.lit(d // 2)) / F.lit(d))
    else:
        cents = scaled_sum
    return F.round(cents.cast("double") / 100, 2)


#: SQL twins of the helpers above (DuckDB sums integers as HUGEINT —
#: exact — then we cast to double and descale, same as Spark).
def _sql_cents(col: str) -> str:
    return f"CAST(ROUND({col} * 100, 0) AS BIGINT)"


def _sql_money(sum_expr: str, scale: int) -> str:
    """SQL twin of _money: half-up to cents in exact integer space
    (DuckDB sums BIGINT as HUGEINT-exact), then one /100 whose result
    is an exact 2-decimal value. Avoids the Spark-vs-DuckDB
    .xx5-boundary split of ROUND(double_division, 2).

    DuckDB ``//`` truncates toward zero while the Spark twin's F.floor
    rounds toward -inf, so a bare ``x // d`` diverges by one cent on
    negative sums. The numerator is therefore snapped down to an exact
    multiple of d first (``x - ((x % d) + d) % d`` is the floor-mod
    remainder for either sign convention), after which ``//`` is exact
    floor division for any sign.
    """
    d = scale // 100
    if d == 1:
        return f"ROUND(CAST(SUM({sum_expr}) AS DOUBLE) / 100, 2)"
    x = f"(SUM({sum_expr}) + {d // 2})"
    return (f"ROUND(CAST(({x} - (({x} % {d}) + {d}) % {d}) // {d} "
            "AS DOUBLE) / 100, 2)")


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = _cents("l_quantity")
    price_c = _cents("l_extendedprice")
    disc_pct = _cents("l_discount")  # 0.05 → 5
    tax_pct = _cents("l_tax")
    disc_price_s = price_c * (100 - disc_pct)          # scale 1e4
    charge_s = disc_price_s * (100 + tax_pct)          # scale 1e6
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(_exact_sum(qty_c), 100).alias("sum_qty"),
            _money(_exact_sum(price_c), 100).alias("sum_base_price"),
            _money(_exact_sum(disc_price_s), 10000).alias("sum_disc_price"),
            _money(_exact_sum(charge_s), 1000000).alias("sum_charge"),
            F.round(_exact_sum(qty_c) / 100.0 / F.count("*"), 2).alias("avg_qty"),
            F.round(_exact_sum(price_c) / 100.0 / F.count("*"), 2).alias("avg_price"),
            F.round(_exact_sum(disc_pct) / 100.0 / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _revenue_s() -> Column:
    """Scaled revenue term: extendedprice * (1 - discount), scale 1e4."""
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


REVENUE_S_SQL = (f"{_sql_cents('l_extendedprice')} * "
                 f"(100 - {_sql_cents('l_discount')})")


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 variant (schema lacks o_shippriority → o_orderpriority):
    top-10 unshipped orders by revenue for one market segment."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(_exact_sum(_revenue_s()), 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where customer and supplier share the
    nation, one region, one year. Dims broadcast; fact-fact join on keys."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(_money(_exact_sum(_revenue_s()), 10000).alias("revenue"))
    )


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective scan-aggregate; filters push to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    rev_s = _cents("l_extendedprice") * _cents("l_discount")  # scale 1e4
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money(_exact_sum(rev_s), 10000).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q8_NATION, Q8_REGION = "NATION_5", "ASIA"


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier-nation's share of revenue delivered to a
    region's customers, per year — conditional aggregation over the
    joined fact, share as an exact-cents ratio."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n_cust), cust["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region["r_regionkey"])
        .join(F.broadcast(n_supp), supp["s_nationkey"] == F.col("sn_key"))
    )
    rev = _revenue_s()
    target = F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(F.lit(0))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _exact_sum(target).alias("nation_s"),
            _exact_sum(rev).alias("total_s"),
        )
        .select(
            "o_year",
            F.round(
                F.col("nation_s").cast("double") / F.col("total_s"), 6
            ).alias("mkt_share"),
            _money(F.col("total_s"), 10000).alias("total_revenue"),
        )
    )


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-flavored: order counts per priority in a quarter."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count"),
        _money(_exact_sum(_cents("o_totalprice")), 100).alias("total_price"),
    )


def q_part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension rollup: revenue and volume per brand (broadcast
    the part dim into the lineitem fact)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            _money(_exact_sum(_revenue_s()), 10000).alias("revenue"),
            _money(_exact_sum(_cents("l_quantity")), 100).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


def q_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order rollup joined back to customer attributes —
    the reference's 'Sales x Customers' join re-expressed."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("order_count"),
        _money(_exact_sum(_cents("o_totalprice")), 100).alias("total_spent"),
        F.max("o_orderdate").alias("last_order_date"),
    )
    return (
        cust.join(per_cust, cust["c_custkey"] == per_cust["o_custkey"])
        .select(
            "c_custkey", "c_name", "c_mktsegment", "order_count",
            "total_spent", "last_order_date",
        )
    )


def q_tpch_q4_late_ship_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 proper: per-priority count of orders in a quarter with
    at least one lineitem shipped 60+ days after the order date — the
    EXISTS shape planned as a LEFT SEMI join (no fan-out, the probe
    stops at first match)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


def q_tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted to the synthetic schema (no l_shipmode /
    l_commitdate / l_receiptdate): l_returnflag stands in for the
    shipmode dimension and 'late delivery' is shipping 60+ days after
    the order date — the same lateness predicate Q4 uses here. Per
    flag: late lines on critical-priority orders vs the rest — Q12's
    fact-fact join + conditional-aggregation shape, one shuffle."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return j.groupBy("l_returnflag").agg(
        F.sum(high).alias("high_line_count"),
        F.sum(F.lit(1) - high).alias("low_line_count"),
    )


def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (lateness = shipped 60+ days after order
    date, as in Q4/Q12): per supplier, count late lineitems on
    completed ('F') multi-supplier orders where NO other supplier was
    late — the marquee EXISTS / NOT EXISTS pair, planned as a LEFT
    SEMI + LEFT ANTI self-join of the fact. Both probes stop at the
    first match (no fan-out); top-20 by wait count."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    l1 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sem = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        sem.join(F.broadcast(sup), sem["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


#: Runtime bloom-filter pruning demo (fact-fact join). At 100 TB these
#: are cluster confs: Spark injects a bloom filter built from the
#: selective (filtered) side's join keys into the big side's SCAN, so
#: rows that can't join are dropped before the shuffle — the runtime
#: analogue of static partition pruning, and the difference between
#: shuffling 100 TB and shuffling the ~4% that survives. Locally the
#: injection thresholds (creation side < 10 MB is fine, but the
#: application side must scan > 10 GB by default) never fire at sf0.1,
#: so the demo lowers them; broadcast is disabled because a broadcast
#: join needs no runtime filter (at 100 TB orders doesn't broadcast).
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def bloom_runtime_confs(spark):
    """Scope the bloom-injection confs: set, yield, restore — keeps the
    shared driver session clean for every other query."""
    prev = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def bloom_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-fact shape the bloom filter prunes: full lineitem
    joined to the ~1-in-5 selective slice of orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _money(_exact_sum(_revenue_s()), 10000).alias("revenue"),
        )
    )


def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag over urgent orders, executed WITH runtime
    bloom-filter join pruning (plan audit: tests/test_plans.py asserts
    `might_contain` lands in the lineitem scan filter). The result is
    computed eagerly inside the conf scope (localCheckpoint) so the
    confs never leak into the driver's other queries; the DuckDB oracle
    is the plain unpruned join — bloom pruning must be invisible in the
    values."""
    with bloom_runtime_confs(spark):
        return bloom_join_frame(spark, sf_dir).localCheckpoint(eager=True)


NATION_A, NATION_B = "NATION_3", "NATION_7"


def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year (supplier
    nation × customer nation, both directions). Both nation joins are
    broadcasts; the only shuffles are lineitem⋈orders and the agg."""
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("s_nkey"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == NATION_A)
                & (F.col("cust_nation") == NATION_B)
            )
            | (
                (F.col("supp_nation") == NATION_B)
                & (F.col("cust_nation") == NATION_A)
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_money(_exact_sum(_revenue_s()), 10000).alias("revenue"))


def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of customers by order count (left join so
    zero-order customers land in the c_count=0 bucket)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in a quarter; ties
    kept, as in the spec.

    Plan: the supplier rollup is MATERIALIZED once (localCheckpoint)
    and both consumers — the grand-max 1-row aggregate (broadcast
    back) and the tie filter — read it, so lineitem is scanned
    exactly once. Neither the old all-rows MAX window (single-task
    sort of the whole supplier rollup) nor the bare
    two-consumer plan (measured: AQE did NOT reuse the canonically
    identical rollup stages here, re-scanning lineitem) is the plan
    you'd want at scale."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        _money(_exact_sum(_revenue_s()), 10000).alias("total_revenue")
    ).localCheckpoint(eager=True)
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return top.join(F.broadcast(supp), top["l_suppkey"] == supp["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


Q17_BRAND = "Brand#1"


def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: yearly revenue lost to small orders — lineitems of a
    brand below 20% of the part's average quantity. The per-part avg
    is a broadcast-joined aggregate, not a correlated subquery."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    li = _t(spark, sf_dir, "lineitem")
    li_brand = li.join(
        F.broadcast(part.select("p_partkey")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    avg_qty = li_brand.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li_brand.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(_exact_sum(_cents("l_extendedprice")) / 100.0 / 7.0, 2)
            .alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicates — the
    OR-of-ANDs shape that exercises filter pushdown through a join."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 20))
            & (F.col("l_quantity").between(10, 25))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(20, 35))
        )
    )
    return j.filter(cond).agg(
        _money(_exact_sum(_revenue_s()), 10000).alias("revenue"),
        F.count("*").alias("n_items"),
    )


Q22_SINCE = "1999-01-01"


def q_tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: per market segment, customers with
    above-average positive balance and no RECENT orders (anti-join
    against the filtered fact — the filter pushes below the join)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(
        orders, rich["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        _money(_exact_sum(_cents("c_acctbal")), 100).alias("totacctbal"),
    )


Q2_TYPE, Q2_SIZE_LO, Q2_SIZE_HI, Q2_REGION = "LARGE", 10, 20, "EUROPE"


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (schema has no partsupp → lineitem is the
    part↔supplier supply relation; unit cost = extendedprice/quantity).
    For each part of one type/size band, the cheapest EUROPE supplier.

    The group-wise min is a row_number window partitioned by p_partkey
    (ties broken by s_suppkey for determinism), not a correlated
    subquery — one shuffle on the part key. Unit cost is computed as
    exact integer milli-dollars via `div` (both engines floor positive
    integer division identically); no double rounding anywhere.
    Reference parity: the Q2 "min supply cost in region" shape from
    TPC-H; cost source adapted to this star schema."""
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE)
        & (F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI))
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .withColumn("price_c", _cents("l_extendedprice"))
        .withColumn("qty_c", _cents("l_quantity"))
        .withColumn("unit_cost_mil", F.expr("(price_c * 1000) div qty_c"))
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost_mil", "s_suppkey")
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            "s_acctbal", "unit_cost_mil",
        )
    )


Q9_NAME_PREFIX = "red"


def q_tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (no partsupp.ps_supplycost → p_retailprice is the
    per-unit cost): profit by supplier nation and order year over parts
    matching a name prefix. profit = extprice*(1-disc) - retail*qty,
    both terms at exact integer scale 1e4, decimal(38,0) accumulated —
    sums can be negative; _money/_sql_money floor identically for
    either sign. Dims broadcast; lineitem⋈orders is the one fact-fact
    shuffle."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q9_NAME_PREFIX)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    profit_s = _revenue_s() - _cents("p_retailprice") * _cents("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_money(_exact_sum(profit_s), 10000).alias("sum_profit"))
    )


Q11_NATION = "NATION_3"
Q11_FRACTION_PPM = 1000  # part is "important" above 0.1% of total value


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (no partsupp.ps_availqty → shipped extendedprice
    of one nation's suppliers is the per-part inventory value): parts
    whose value exceeds a fixed fraction of the grand total.

    The threshold compare stays in exact integer space
    (value_c * 1e6 > total_c * PPM — decimal(38,0) both sides, no
    float fraction). The grand total re-aggregates the per-part
    relation and broadcasts as a 1-row crossJoin — the scalar-subquery
    shape. The static plan prints lineitem twice, but both references
    share one canonicalized per-part exchange, so AQE's ReuseExchange
    makes the runtime plan scan lineitem ONCE (asserted on the final
    adaptive plan in tests/test_plans.py)."""
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_exact_sum(_cents("l_extendedprice")).alias("value_c"))
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_c") * F.lit(1000000)
            > F.col("total_c") * F.lit(Q11_FRACTION_PPM)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _money(F.col("value_c"), 100).alias("part_value"),
        )
    )


Q16_BRAND_NOT, Q16_TYPE_NOT = "Brand#5", "PROMO"
Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)


def q_tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (lineitem supplies the part↔supplier pairs):
    distinct-supplier count per (brand, type, size) excluding one brand
    and one type. countDistinct is exact — Spark plans it as a two-phase
    expand+agg, partial-aggregable; the part dim broadcasts."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_BRAND_NOT)
        & (F.col("p_type") != Q16_TYPE_NOT)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q20_NAME_PREFIX, Q20_YEAR, Q20_REGION = "red", 1997, "EUROPE"
Q20_SHARE_PCT = 30  # supplier "dominates" a part above this share


def q_tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (no partsupp.ps_availqty → a supplier qualifies
    by shipping > 30% of a part's total year volume instead of holding
    > 50% excess stock): EUROPE suppliers that dominate supply of any
    name-prefixed part in one year.

    Shape parity with Q20's nested semi-joins: per-(part,supplier)
    volume, per-part total via a window over the already-reduced pair
    relation (tiny vs lineitem), dominance filter in exact integer
    space, then a semi-ish distinct over qualifying suppliers."""
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == Q20_YEAR
    )
    pair = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(_exact_sum(_cents("l_quantity")).alias("pair_qty_c"))
    )
    tot = Window.partitionBy("l_partkey")
    dominant = (
        pair.withColumn("part_qty_c", F.sum("pair_qty_c").over(tot))
        .filter(
            F.col("pair_qty_c") * F.lit(100)
            > F.col("part_qty_c") * F.lit(Q20_SHARE_PCT)
        )
        .select("l_suppkey")
        .distinct()
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return dominant.join(
        F.broadcast(supp), dominant["l_suppkey"] == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "n_name")


QUERIES = {
    "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
    "tpch_q9_product_type_profit": q_tpch_q9_product_type_profit,
    "tpch_q11_important_stock": q_tpch_q11_important_stock,
    "tpch_q16_supplier_part_counts": q_tpch_q16_supplier_part_counts,
    "tpch_q20_dominant_suppliers": q_tpch_q20_dominant_suppliers,
    "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
    "tpch_q5_local_supplier_volume": q_tpch_q5_local_supplier_volume,
    "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
    "tpch_q4_late_ship_exists": q_tpch_q4_late_ship_exists,
    "tpch_q7_nation_volume": q_tpch_q7_nation_volume,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q13_customer_distribution": q_tpch_q13_customer_distribution,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q17_small_quantity_revenue": q_tpch_q17_small_quantity_revenue,
    "tpch_q19_discounted_revenue": q_tpch_q19_discounted_revenue,
    "tpch_q22_global_sales_opportunity": q_tpch_q22_global_sales_opportunity,
    "tpch_q12_shipmode_priority": q_tpch_q12_shipmode_priority,
    "tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
    "bloom_pruned_revenue": q_bloom_pruned_revenue,
    "order_priority_counts": q_order_priority_counts,
    "part_brand_revenue": q_part_brand_revenue,
    "customer_order_stats": q_customer_order_stats,
}

_Q = _sql_cents("l_quantity")
_P = _sql_cents("l_extendedprice")
_D = _sql_cents("l_discount")
_T = _sql_cents("l_tax")
_OP = _sql_cents("o_totalprice")

_REV_MONEY = _sql_money(REVENUE_S_SQL, 10000)

ORACLES = {
    "tpch_q2_min_cost_supplier": f"""
WITH euro_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
), offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal,
         ({_P} * 1000) // {_Q} AS unit_cost_mil
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN euro_supp ON l_suppkey = s_suppkey
  WHERE p_type = '{Q2_TYPE}'
    AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal,
       unit_cost_mil
FROM offers
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY p_partkey ORDER BY unit_cost_mil, s_suppkey) = 1""",
    "tpch_q9_product_type_profit": f"""
SELECT n_name AS nation,
       EXTRACT(YEAR FROM o_orderdate) AS o_year,
       {_sql_money(f"{REVENUE_S_SQL} - {_sql_cents('p_retailprice')} * {_Q}",
                   10000)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '{Q9_NAME_PREFIX}%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)""",
    "tpch_q11_important_stock": f"""
WITH per_part AS (
  SELECT l_partkey, SUM({_P}) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       ROUND(CAST(value_c AS DOUBLE) / 100, 2) AS part_value
FROM per_part
WHERE value_c * 1000000 >
      (SELECT SUM(value_c) FROM per_part) * {Q11_FRACTION_PPM}""",
    "tpch_q16_supplier_part_counts": f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND_NOT}'
  AND p_type <> '{Q16_TYPE_NOT}'
  AND p_size IN {Q16_SIZES}
GROUP BY p_brand, p_type, p_size""",
    "tpch_q20_dominant_suppliers": f"""
WITH pair AS (
  SELECT l_partkey, l_suppkey, SUM({_Q}) AS pair_qty_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    AND EXTRACT(YEAR FROM l_shipdate) = {Q20_YEAR}
  GROUP BY l_partkey, l_suppkey
), dominant AS (
  SELECT DISTINCT l_suppkey
  FROM (
    SELECT l_suppkey, pair_qty_c,
           SUM(pair_qty_c) OVER (PARTITION BY l_partkey) AS part_qty_c
    FROM pair
  )
  WHERE pair_qty_c * 100 > part_qty_c * {Q20_SHARE_PCT}
)
SELECT s_suppkey, s_name, n_name
FROM dominant
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'""",
    "tpch_q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM({_Q}) AS DOUBLE) / 100, 2) AS sum_qty,
       ROUND(CAST(SUM({_P}) AS DOUBLE) / 100, 2) AS sum_base_price,
       {_sql_money(f"{_P} * (100 - {_D})", 10000)} AS sum_disc_price,
       {_sql_money(f"{_P} * (100 - {_D}) * (100 + {_T})", 1000000)} AS sum_charge,
       ROUND(CAST(SUM({_Q}) AS DOUBLE) / 100 / COUNT(*), 2) AS avg_qty,
       ROUND(CAST(SUM({_P}) AS DOUBLE) / 100 / COUNT(*), 2) AS avg_price,
       ROUND(CAST(SUM({_D}) AS DOUBLE) / 100 / COUNT(*), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    "tpch_q3_shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_REV_MONEY} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
    "tpch_q5_local_supplier_volume": f"""
SELECT n_name,
       {_REV_MONEY} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name""",
    "tpch_q6_forecast_revenue": f"""
SELECT {_sql_money(f"{_P} * {_D}", 10000)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
    "order_priority_counts": f"""
SELECT o_orderpriority,
       COUNT(*) AS order_count,
       ROUND(CAST(SUM({_OP}) AS DOUBLE) / 100, 2) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
GROUP BY o_orderpriority""",
    "part_brand_revenue": f"""
SELECT p_brand,
       {_REV_MONEY} AS revenue,
       ROUND(CAST(SUM({_Q}) AS DOUBLE) / 100, 2) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand""",
    "customer_order_stats": f"""
SELECT c_custkey, c_name, c_mktsegment,
       COUNT(*) AS order_count,
       ROUND(CAST(SUM({_OP}) AS DOUBLE) / 100, 2) AS total_spent,
       MAX(o_orderdate) AS last_order_date
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name, c_mktsegment""",
    "tpch_q4_late_ship_exists": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",
    "tpch_q7_nation_volume": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {_REV_MONEY} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{NATION_A}' AND n2.n_name = '{NATION_B}')
   OR (n1.n_name = '{NATION_B}' AND n2.n_name = '{NATION_A}')
GROUP BY supp_nation, cust_nation, l_year""",
    "tpch_q8_market_share": f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = '{Q8_NATION}'
                           THEN {REVENUE_S_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({REVENUE_S_SQL}) AS DOUBLE), 6) AS mkt_share,
       {_REV_MONEY}
         AS total_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = '{Q8_REGION}'
GROUP BY o_year""",
    "tpch_q13_customer_distribution": """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count""",
    "tpch_q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey,
         {_REV_MONEY} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
    "tpch_q17_small_quantity_revenue": f"""
WITH li_brand AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'),
cut AS (SELECT l_partkey, AVG(l_quantity) * 0.2 AS qty_cut
        FROM li_brand GROUP BY l_partkey)
SELECT ROUND(CAST(SUM({_P}) AS DOUBLE) / 100 / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_items
FROM li_brand JOIN cut USING (l_partkey)
WHERE l_quantity < qty_cut""",
    "tpch_q19_discounted_revenue": f"""
SELECT {_REV_MONEY} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 35)""",
    "tpch_q22_global_sales_opportunity": f"""
WITH rich AS (
  SELECT c_custkey, c_mktsegment, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)),
no_orders AS (
  SELECT * FROM rich
  WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q22_SINCE} 00:00:00'))
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(CAST(SUM({_sql_cents('c_acctbal')}) AS DOUBLE) / 100, 2)
         AS totacctbal
FROM no_orders GROUP BY c_mktsegment""",
    "tpch_q12_shipmode_priority": """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag""",
    "bloom_pruned_revenue": f"""
SELECT l_returnflag, COUNT(*) AS n_items, {_REV_MONEY} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag""",
    "tpch_q21_waiting_suppliers": """
WITH l1 AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
sem AS (
  SELECT * FROM l1
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM l1 l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey))
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM sem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20""",
}
