"""Bucketed-join plan audit: joining two tables bucketed on the join
key must not shuffle — the write-once/join-many contract SURVEY §6
relies on for repeated fact-fact joins at scale."""

import contextlib
import io

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.sources.bucketing import (
    read_table,
    write_bucketed,
)


def simple_plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    # force the sort-merge path: at test SF the sides are broadcast-able,
    # which would hide the bucketing (a broadcast has its own Exchange)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], 8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_b",
        ["l_orderkey"],
        8,
    )
    joined = read_table(spark, "li_b").join(
        read_table(spark, "ord_b"), "l_orderkey"
    )
    plan = simple_plan(joined)
    assert "Exchange" not in plan

    # aggregation on the bucket key is exchange-free too
    agg = read_table(spark, "li_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert "Exchange" not in simple_plan(agg)

    # and the result is still correct
    n = joined.count()
    assert n == li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).count()
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
