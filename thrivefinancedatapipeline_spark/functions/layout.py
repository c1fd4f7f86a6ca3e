"""Input-layout repair: minimum parallelism for compute-heavy stages.

A single-file, single-row-group parquet input (the sf-dir layout —
and, in production, any unsplittable input: one giant gzip, a
one-row-group table written by a non-Spark writer) caps the scan at
1-2 tasks no matter the cluster size (guide §2.5 "input skew" / §6
split-size notes — `maxPartitionBytes` cannot split inside one row
group). Any stage whose per-row work dwarfs a shuffle of its input —
Python codec kernels, all-pairs interpreted vector folds — then runs
effectively single-threaded.

`ensure_min_parallelism` is the conditional fix: repartition to the
session's default parallelism ONLY when the current plan has fewer
partitions. On any real multi-file layout the condition never fires
and the plan is untouched, so this is scale-adaptive, not a local
tuning knob. Keyless round-robin repartition is retry-safe (Spark
sorts before repartition by default — SPARK-23207).

Measured r20 at sf0.1 (32 cores, identical outputs):
multimodal_frame_sample 18 s → 2.1 s; dedup_embedding_cosine
11-21 s → 1.15 s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition `df` to the session default parallelism iff its
    current plan has fewer partitions (see module docstring). Use on
    the input of a stage whose per-row compute dominates a shuffle of
    that input; never on cheap projections (the shuffle would cost
    more than it spreads)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
