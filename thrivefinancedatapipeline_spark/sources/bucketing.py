"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB the dominant cost of `fact JOIN fact` is the shuffle of both
sides on the join key — paid again on EVERY query. Bucketing pays it
once at write time: `bucketBy(n, key)` hash-partitions rows into a
fixed number of buckets inside each output file set, and Spark's scan
exposes that as `HashPartitioning(key, n)` — joins and aggregations on
the key then plan WITHOUT an Exchange (verified in
tests/test_bucketing.py by asserting the join plan is exchange-free).

Rules that make it work (and that this module enforces):
- both sides must use the SAME bucket count, or Spark re-shuffles one
  side anyway (`spark.sql.bucketing.coalesceBucketsInJoin` can bridge
  multiples of 2 — don't rely on it for the base design),
- sortBy within buckets lets sort-merge join skip its sort too,
- bucket pruning applies to equality filters on the bucket key.

Bucketed tables go through the catalog (`saveAsTable`) because bucket
metadata lives in the metastore, not the parquet footers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table."""
    keys = list(bucket_by)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed earlier write can leave an orphan location with no
    # catalog entry; managed-table creation refuses to reuse it
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        import shutil
        from urllib.parse import urlparse

        shutil.rmtree(
            f"{urlparse(wh).path}/{table.lower()}", ignore_errors=True
        )
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
