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


def test_minhash_band_index_probe_parity_and_plan(spark, sf_dir):
    """The materialized corpus band index: (1) probing it returns
    row-for-row what the in-query incremental probe returns, (2) the
    probe's band join leaves the index scan exchange-free (only the
    small new-batch side shuffles), (3) appending a delivery keeps
    both properties — the corpus is never re-banded."""
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.dedup import (
        INCR_MOD,
        INCR_NEW_REM,
        build_minhash_band_index,
        append_minhash_band_index,
        minhash_bands_for,
        probe_minhash_band_index,
        q_dedup_incremental_minhash,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % INCR_MOD) == INCR_NEW_REM
    corpus = docs.filter(~is_new)
    table = "minhash_band_index_t"

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = rows(q_dedup_incremental_minhash(spark, sf_dir))

    # full build → probe parity
    build_minhash_band_index(spark, corpus, table=table)
    assert rows(probe_minhash_band_index(spark, sf_dir, table=table)) == want

    def assert_index_side_exchange_free():
        # candidate join against the index must scan it with NO
        # Exchange on the index side (force sort-merge so broadcast
        # can't hide the bucketing)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bn = minhash_bands_for(docs.filter(is_new)).select(
                F.col("doc_id").alias("doc_id_1"), "band", "key"
            )
            idx = spark.table(table).select(
                F.col("doc_id").alias("doc_id_2"), "band", "key"
            )
            plan = simple_plan(bn.join(idx, ["band", "key"]))
            # both Exchanges belong to the probe side (its signature
            # groupBy + its join repartition); a third would mean the
            # index got reshuffled
            assert plan.count("Exchange") == 2
            assert "Bucketed: true" in plan
            # the index branch prints last (second join child): from
            # its final Sort down to the bucketed FileScan there is
            # no Exchange
            index_branch = plan[plan.rfind("Sort [band") :]
            assert "Bucketed: true" in index_branch
            assert "Exchange" not in index_branch
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert_index_side_exchange_free()

    # append maintenance: build from half the corpus, append the rest
    # — identical probe result AND the post-append probe must still
    # plan exchange-free on the index side (the real contract; a
    # metadata-only 'table is bucketed' check would pass even if the
    # appended files broke the layout)
    half_a = corpus.filter((F.col("doc_id") % 4) < 2)
    half_b = corpus.filter((F.col("doc_id") % 4) >= 2)
    build_minhash_band_index(spark, half_a, table=table)
    append_minhash_band_index(spark, half_b, table=table)
    assert rows(probe_minhash_band_index(spark, sf_dir, table=table)) == want
    assert_index_side_exchange_free()

    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_chunk_band_index_probe_parity_and_plan(spark, sf_dir):
    """The maintained CHUNK band index (doc-level index shape lifted
    to chunk ids): (1) probing it equals the in-query chunk band
    join over the same corpus, (2) the probe's band join leaves the
    bucketed index scan exchange-free, (3) append maintenance keeps
    both properties."""
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.dedup import (
        INCR_MOD,
        INCR_NEW_REM,
        _verified_pairs,
    )
    from thrivefinancedatapipeline_spark.operators.textops import (
        CHUNK_ID_SHIFT,
        append_chunk_band_index,
        build_chunk_band_index,
        chunk_bands_for,
        chunk_shingles,
        probe_chunk_band_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % INCR_MOD) == INCR_NEW_REM
    corpus = docs.filter(~is_new)
    table = "chunk_band_index_t"

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # in-query twin: new chunks' bands join corpus chunks' bands
    sh_all = chunk_shingles(docs).localCheckpoint(eager=True)
    bn = chunk_bands_for(docs.filter(is_new)).select(
        F.col("doc_id").alias("doc_id_1"), "band", "key"
    )
    bc = chunk_bands_for(corpus).select(
        F.col("doc_id").alias("doc_id_2"), "band", "key"
    )
    cand = (
        bn.join(bc, ["band", "key"])
        .select("doc_id_1", "doc_id_2")
        .distinct()
    )
    want = rows(
        _verified_pairs(cand, sh_all).select(
            F.expr(f"doc_id_1 div {CHUNK_ID_SHIFT}"),
            F.expr(f"doc_id_1 % {CHUNK_ID_SHIFT}"),
            F.expr(f"doc_id_2 div {CHUNK_ID_SHIFT}"),
            F.expr(f"doc_id_2 % {CHUNK_ID_SHIFT}"),
            "common_shingles",
            "shingles_1",
            "shingles_2",
        )
    )
    assert len(want) >= 1  # non-vacuous: replayed docs share chunks

    build_chunk_band_index(spark, corpus, table=table)
    assert rows(probe_chunk_band_index(spark, sf_dir, table=table)) == want

    def assert_index_side_exchange_free():
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe_bands = chunk_bands_for(docs.filter(is_new)).select(
                F.col("doc_id").alias("doc_id_1"), "band", "key"
            )
            idx = spark.table(table).select(
                F.col("doc_id").alias("doc_id_2"), "band", "key"
            )
            plan = simple_plan(probe_bands.join(idx, ["band", "key"]))
            assert plan.count("Exchange") == 2  # both on probe side
            assert "Bucketed: true" in plan
            index_branch = plan[plan.rfind("Sort [band") :]
            assert "Bucketed: true" in index_branch
            assert "Exchange" not in index_branch
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert_index_side_exchange_free()

    # append maintenance: half build + half append == full build
    half_a = corpus.filter((F.col("doc_id") % 4) < 2)
    half_b = corpus.filter((F.col("doc_id") % 4) >= 2)
    build_chunk_band_index(spark, half_a, table=table)
    append_chunk_band_index(spark, half_b, table=table)
    assert rows(probe_chunk_band_index(spark, sf_dir, table=table)) == want
    assert_index_side_exchange_free()

    spark.sql(f"DROP TABLE IF EXISTS {table}")
