"""Skew mitigation for joins whose hot keys overwhelm a partition.

First line of defense at scale is AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in `session.get_spark`),
which needs no code change. This helper covers the cases AQE can't
fix: a sort-merge join where one key's rows exceed a single executor's
memory even after splitting, or a deliberately pre-partitioned
pipeline where a runtime re-plan is unwanted.

`salted_join` spreads each hot left key over `salt_buckets` shuffle
partitions by joining on (key, salt): the left side gets a
deterministic per-row salt, the right side is replicated once per salt
value. Right-side cost is a `salt_buckets`× fan-out, so keep the right
side the smaller input (if it fits in memory outright, just
`F.broadcast` it instead — salting is for the in-between regime).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join `left` (large, skewed) with `right` (small-ish) on
    `on`, de-hotspotting left keys across `salt_buckets` partitions.

    Result equals ``left.join(right, on, how)`` for how in
    ('inner', 'left'). The left salt is a deterministic hash of the
    whole row, so reruns shuffle identically.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    salted_left = left.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)),
    )
    salted_right = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(salted_right, [*on, SALT], how).drop(SALT)


from contextlib import contextmanager  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402

#: synthetic hot-key shape for the AQE demo: one key carrying
#: HOT_ROWS rows next to 50 keys of 100 rows each
HOT_ROWS = 2_000_000


@contextmanager
def aqe_skew_confs(spark: SparkSession):
    """Scope the confs that let AQE's OptimizeSkewedJoin fire at
    LOCAL data sizes (production sizes trip the defaults on their
    own): per-partition thresholds shrunk to ~100KB, broadcast
    disabled so the join stays sort-merge, and
    forceOptimizeSkewedJoin on because the demo aggregates ON the
    join key — the split introduces an extra shuffle for that
    groupBy, which the optimizer would otherwise veto (measured: no
    skew=true without force when a downstream distribution
    requirement exists). Restore-on-exit, and callers must EXECUTE
    inside the scope (the optimizer-conf rule from the bloom demo)."""
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def skewed_join_frame(spark: SparkSession, l_path: str, r_path: str):
    """The demo plan: per-key counts over a hot-keyed fact joined to
    a small dim, written/read through parquet so AQE sees real
    shuffle statistics. Under `aqe_skew_confs` the FINAL adaptive
    plan shows SortMergeJoin(skew=true) — the hot partition split
    into advisory-sized subpartitions at runtime with the dim side
    replicated per split, no salting code anywhere (salted_join
    remains the explicit fallback for keys AQE cannot split)."""
    left = spark.read.parquet(l_path)
    right = spark.read.parquet(r_path)
    return left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("w_sum")
    )


def write_skew_demo_inputs(spark: SparkSession, l_path: str,
                           r_path: str) -> None:
    left = spark.range(0, HOT_ROWS).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    ).union(
        spark.range(0, 5000).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
        )
    )
    right = spark.range(0, 51).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    left.write.mode("overwrite").parquet(l_path)
    right.write.mode("overwrite").parquet(r_path)
