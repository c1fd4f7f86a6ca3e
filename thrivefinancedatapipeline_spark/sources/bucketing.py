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

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) catalog table.

    mode='append' adds rows into an existing table's bucket layout
    (Spark hashes appends into the same buckets, so exchange-free
    joins survive maintenance) — the one writer chain serves both the
    build and the incremental-append paths so the bucket contract
    lives in one place."""
    keys = list(bucket_by)
    spark = df.sparkSession
    if mode == "overwrite":
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
        df.write.mode(mode)
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


@dataclass(frozen=True)
class SkewPlan:
    """What to do before shuffling a skewed key: the partition count
    sized for the NON-hot remainder, plus a salt factor per hot key
    (how many partitions that one key's rows must be spread over —
    feed it to `operators.skew.salted_join`'s salt_buckets)."""

    n_partitions: int
    salt_factors: dict = field(default_factory=dict)

    @property
    def needs_salting(self) -> bool:
        return bool(self.salt_factors)


def plan_skewed_shuffle(
    total_units: int,
    key_units: Mapping,
    target_units: int,
    cpus: int = 32,
) -> SkewPlan:
    """Partition planning that a partition COUNT alone cannot express:
    a key holding `u` units hashes into ONE partition no matter how
    many partitions exist, so raising `spark.sql.shuffle.partitions`
    never fixes a hot key. The plan therefore splits into (a) hot keys
    — any key whose units exceed one target partition — each assigned
    the salt factor ceil(u / target) that spreads it back to
    target-sized tasks, and (b) the remainder, sized by the plain
    bytes-per-partition rule. Pure integer arithmetic so the companion
    engine query (`operators.sketches.q_shuffle_plan_events`) computes
    the identical plan under the correctness oracle.

    `units` are deliberately abstract: feed bytes when planning confs
    (`plan_shuffle_partitions_from_skew`), rows when deriving the plan
    inside an engine query where only counts are observable."""
    hot: dict = {}
    hot_total = 0
    for k, u in key_units.items():
        if u > target_units:
            hot[k] = -(-u // target_units)
            hot_total += u
    rest = total_units - hot_total
    n = max(cpus, -(-rest // target_units)) if rest > 0 else cpus
    return SkewPlan(n_partitions=n, salt_factors=hot)


def plan_shuffle_partitions_from_skew(
    input_bytes: int,
    share_ppm: Mapping,
    target_partition_mb: int = 128,
    cpus: int = 32,
) -> SkewPlan:
    """Conf-level autotuning from the skew audit's output: take
    `q_join_key_skew`'s (key -> integer ppm share) table, convert each
    share to bytes, and emit the SkewPlan — n_partitions to set, and
    the keys a plain shuffle join cannot survive (route those through
    AQE skew splitting or `salted_join`)."""
    target = max(1, target_partition_mb) * 1024 * 1024
    key_bytes = {
        k: (input_bytes * ppm) // 1_000_000 for k, ppm in share_ppm.items()
    }
    return plan_skewed_shuffle(input_bytes, key_bytes, target, cpus)
