"""Planner-driven session tuning (SURVEY §8): derive
``spark.sql.shuffle.partitions`` — and salt decisions — from MEASURED
input stats instead of the static core-count default.

The static default (cores) is right for a laptop and wrong for 100 TB:
shuffle partitions must scale with the bytes actually moving, or each
task spills. ``sources.bucketing`` owns the arithmetic
(`plan_shuffle_partitions`, `plan_shuffle_partitions_from_skew`); this
module wires it to real queries:

- ``plan_for_query`` measures the parquet footprint of the files the
  registered query's PLAN actually scans (``DataFrame.inputFiles()``
  on the constructed query — no hand-maintained table list, so a new
  heavy query is automatically sized) and sizes the conf;
- ``skew_plan_for_events`` feeds the ``q_join_key_skew`` audit's ppm
  table into the skew-aware planner, returning the SkewPlan whose
  ``salt_factors`` route hot keys to ``operators.skew.salted_join``
  (this corpus is uniform, so the honest plan is "no salting" — the
  hot path is exercised by the planner unit tests with synthetic
  skew);
- ``shuffle_conf_scope`` applies a planned value set-execute-restore
  style: per the repo's conf-scope rule, the query MUST be forced
  inside the scope (``run_tuned`` does), because a lazily-returned
  DataFrame would execute after restore and silently lose the conf.

At bench SF the planner's floor (never under-parallelize below the
core count) makes the planned value coincide with the static default —
``tools/autotune_ab.py`` shows exactly that, and shows where the two
diverge as input bytes grow. The value of the wiring is the POSTURE:
the conf is now a function of the data, not a constant.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from .sources.bucketing import (
    SkewPlan,
    plan_shuffle_partitions,
    plan_shuffle_partitions_from_skew,
)

#: memo of measured plan-input bytes per (sf_dir, query) — constructing
#: a query to read its inputFiles() can itself run bounded driver work
#: (sampling/training), so measure once per process
_BYTES_CACHE: dict[tuple[str, str], int] = {}


def query_input_bytes(
    spark: SparkSession, sf_dir: str, name: str
) -> int:
    """On-disk bytes of the files the registered query's plan scans,
    derived from the CONSTRUCTED query via ``DataFrame.inputFiles()``
    (closing the r6 watch item: no hand-maintained query→tables dict —
    a new heavy query is sized automatically). Local ``file:`` URIs
    only.

    Queries that sever lineage during construction (the iterative
    dedup family localCheckpoints its shingle relation, so the final
    plan reads a checkpoint RDD, not files) report NO input files;
    for those the DELIBERATELY CONSERVATIVE fallback is the whole
    sf_dir parquet footprint — an upper bound that over-partitions
    slightly at what-if scale instead of silently planning the floor."""
    key = (sf_dir, name)
    if key not in _BYTES_CACHE:
        from . import registry
        from urllib.parse import urlparse

        df = registry.all_queries()[name](spark, sf_dir)
        total = 0
        for uri in df.inputFiles():
            p = urlparse(uri)
            if p.scheme in ("file", ""):
                path = p.path or uri
                if os.path.exists(path):
                    total += os.path.getsize(path)
        if total == 0:
            from .datamodel import TABLES

            total = table_bytes(sf_dir, list(TABLES))
        _BYTES_CACHE[key] = total
    return _BYTES_CACHE[key]


def table_bytes(sf_dir: str, tables: list[str]) -> int:
    """Total on-disk bytes of the given parquet tables (file or
    directory layout)."""
    total = 0
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
        elif os.path.exists(path):
            total += os.path.getsize(path)
    return total


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def plan_for_query(
    sf_dir: str,
    name: str,
    target_partition_mb: int = 128,
    spark: SparkSession | None = None,
    scale: float = 1.0,
) -> int:
    """Planned ``spark.sql.shuffle.partitions`` for a registered
    query: sized from the bytes its plan actually scans
    (``query_input_bytes``), floored at the core count. ``scale``
    multiplies the measured bytes for what-if sizing (the A/B tool's
    "plan at 1e6× the input" column — the 100 TB posture). Unknown
    queries, or queries whose construction needs state this process
    lacks (e.g. an unbuilt index), fall back to the core count (the
    static default — tuning never degrades below it)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return _cpus()
    try:
        b = query_input_bytes(spark, sf_dir, name)
    except Exception:
        return _cpus()
    return plan_shuffle_partitions(
        int(b * scale),
        target_partition_mb=target_partition_mb,
        cpus=_cpus(),
    )


def skew_plan_for_events(
    spark: SparkSession, sf_dir: str, target_partition_mb: int = 128
) -> SkewPlan:
    """The audit-to-conf pipeline: run ``q_join_key_skew`` (top keys
    with exact ppm shares of events rows), convert shares to bytes
    against the table's real footprint, and emit the SkewPlan —
    ``n_partitions`` to set plus per-key salt factors for any key one
    partition cannot hold."""
    from .operators.sketches import q_join_key_skew

    shares = {
        r.user_id: int(r.share_ppm)
        for r in q_join_key_skew(spark, sf_dir).collect()
    }
    return plan_shuffle_partitions_from_skew(
        table_bytes(sf_dir, ["events"]),
        shares,
        target_partition_mb=target_partition_mb,
        cpus=_cpus(),
    )


@contextmanager
def shuffle_conf_scope(spark: SparkSession, n_partitions: int):
    """Set ``spark.sql.shuffle.partitions`` for the scope and restore
    the previous value after. Execution MUST be forced inside the
    scope (conf-scope rule: lazy DataFrames returned out of the scope
    run after restore)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n_partitions))
    try:
        yield n_partitions
    finally:
        spark.conf.set(key, old)


def run_tuned(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    target_partition_mb: int = 128,
) -> DataFrame:
    """Execute a registered query under its planner-derived shuffle
    conf, forcing execution inside the scope, and return the
    (materialized) result. The conf is restored before returning."""
    from . import registry

    fn = registry.all_queries()[name]
    n = plan_for_query(sf_dir, name, target_partition_mb, spark=spark)
    with shuffle_conf_scope(spark, n):
        df = fn(spark, sf_dir).localCheckpoint(eager=True)
    return df
