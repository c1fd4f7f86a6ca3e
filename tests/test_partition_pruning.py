"""Partitioned-sink audit: a date filter on a partitioned dataset must
prune partitions at planning time (PartitionFilters on the scan), not
read-then-filter — the difference between touching 1 day and 100 TB."""

import contextlib
import io
import shutil
import tempfile

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.sources.io import write_partitioned_parquet


def formatted_plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_date_partitioned_scan_prunes(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="part_")
    try:
        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.date_format("ts", "yyyy-MM-dd")
        )
        write_partitioned_parquet(ev, tmp, partition_by=["event_date"])

        back = spark.read.parquet(tmp)
        one_day = back.filter(F.col("event_date") == "2024-01-05")

        plan = formatted_plan(one_day)
        assert "PartitionFilters: [" in plan
        pruned = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "event_date" in pruned

        # pruning must not change results
        n_filtered = one_day.count()
        n_expected = ev.filter(F.col("event_date") == "2024-01-05").count()
        assert n_filtered == n_expected and n_expected > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_partition_columns_round_trip(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="part_")
    try:
        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.date_format("ts", "yyyy-MM-dd")
        )
        write_partitioned_parquet(ev, tmp, partition_by=["event_date"])
        back = spark.read.parquet(tmp)
        assert back.count() == ev.count()
        assert set(back.columns) == set(ev.columns)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
