"""Planner-driven conf wiring (SURVEY §8 autotuning): the shuffle
conf is a function of measured input bytes + the skew audit, applied
set-execute-restore, and never changes query results."""

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark import autotune, registry
from thrivefinancedatapipeline_spark.sources.bucketing import (
    plan_shuffle_partitions,
)


def test_plan_floors_at_cores_and_scales_with_bytes(spark, sf_dir):
    # tiny test tables: the floor (core count) wins
    n = autotune.plan_for_query(sf_dir, "dedup_minhash_lsh", spark=spark)
    assert n == autotune._cpus()
    # the same arithmetic at 100 TB: bytes dominate the floor
    assert plan_shuffle_partitions(100 * 1024**4, cpus=32) == 819_200
    # unknown query: static default, never degraded
    assert autotune.plan_for_query(sf_dir, "nope", spark=spark) == (
        autotune._cpus()
    )


def test_plan_derives_tables_from_the_plan_itself(spark, sf_dir):
    # r6 watch item closed: no QUERY_TABLES dict — any registered
    # query is sized from the files its OWN plan scans
    assert not hasattr(autotune, "QUERY_TABLES")
    b = autotune.query_input_bytes(spark, sf_dir, "events_sessionize")
    assert b > 0
    # and the bytes agree with the on-disk footprint of its one table
    assert b == autotune.table_bytes(sf_dir, ["events"])
    # when bytes demand it (what-if at 1e6x the input), a query nobody
    # listed anywhere still gets a non-default plan
    big = autotune.plan_for_query(
        sf_dir, "events_sessionize", spark=spark, scale=1e6
    )
    assert big > autotune._cpus()
    # larger target partitions never plan more partitions
    coarse = autotune.plan_for_query(
        sf_dir,
        "events_sessionize",
        spark=spark,
        scale=1e6,
        target_partition_mb=1024,
    )
    assert coarse <= big


def test_table_bytes_reads_real_files(sf_dir):
    b = autotune.table_bytes(sf_dir, ["documents", "embeddings"])
    assert b > 0
    assert b == autotune.table_bytes(sf_dir, ["documents"]) + (
        autotune.table_bytes(sf_dir, ["embeddings"])
    )


def test_conf_scope_sets_and_restores(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with autotune.shuffle_conf_scope(spark, 7):
        assert spark.conf.get(key) == "7"
    assert spark.conf.get(key) == before
    # restore survives an exception inside the scope
    try:
        with autotune.shuffle_conf_scope(spark, 9):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


def test_skew_plan_for_events_uniform_corpus(spark, sf_dir):
    plan = autotune.skew_plan_for_events(spark, sf_dir)
    # synthetic events are uniform on user_id: the honest plan is "no
    # salting" with the floor partition count (the hot-key branch is
    # covered by the planner unit tests with synthetic skew)
    assert not plan.needs_salting
    assert plan.n_partitions == autotune._cpus()


def test_run_tuned_output_identical(spark, sf_dir):
    tuned = autotune.run_tuned(spark, sf_dir, "dedup_exact")
    plain = registry.all_queries()["dedup_exact"](spark, sf_dir)
    assert sorted(map(tuple, tuned.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # conf restored after the tuned run
    assert spark.conf.get("spark.sql.shuffle.partitions") != ""


def test_checkpointed_query_gets_conservative_bytes(spark, sf_dir):
    # dedup queries localCheckpoint their shingle relation — the final
    # plan reads a checkpoint RDD and reports NO input files; the
    # planner must fall back to the whole-directory footprint (upper
    # bound), not silently plan the floor at what-if scale
    from thrivefinancedatapipeline_spark.datamodel import TABLES

    b = autotune.query_input_bytes(spark, sf_dir, "dedup_minhash_lsh")
    assert b == autotune.table_bytes(sf_dir, list(TABLES))
    big = autotune.plan_for_query(
        sf_dir, "dedup_minhash_lsh", spark=spark, scale=1e6
    )
    assert big > autotune._cpus()
