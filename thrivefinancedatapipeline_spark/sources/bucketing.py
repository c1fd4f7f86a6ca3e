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


def plan_bucket_count(
    table_bytes: int, target_bucket_mb: int = 256
) -> int:
    """Bucket-count planning: the POWER OF TWO whose bucket size lands
    nearest the target. Power-of-2 counts are the interoperability
    contract — `spark.sql.bucketing.coalesceBucketsInJoin` can bridge
    two bucketed tables only when one count divides the other, and
    sticking to powers of two makes every pair of tables bridgeable.
    Sizing by bytes (not rows) keeps each bucket near the scan split
    size so a bucket is one well-sized task."""
    target = max(1, target_bucket_mb) * 1024 * 1024
    n = 1
    while n * target < table_bytes and n < (1 << 20):
        n <<= 1
    return n


def plan_shuffle_partitions(
    input_bytes: int, target_partition_mb: int = 128, cpus: int = 32
) -> int:
    """spark.sql.shuffle.partitions sizing from actual input volume:
    enough partitions that each holds ~target MB (fits executor
    memory, spills never), floored at the core count so the cluster
    is never under-parallelized on small inputs. The static-conf
    companion to AQE's runtime coalescing — set the ceiling here, let
    AQE shrink per-stage."""
    target = max(1, target_partition_mb) * 1024 * 1024
    return max(cpus, -(-input_bytes // target))
