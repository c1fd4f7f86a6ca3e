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
