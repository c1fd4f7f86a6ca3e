"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries and oracles live next to the operators they exercise, in
``thrivefinancedatapipeline_spark/plans`` and
``thrivefinancedatapipeline_spark/operators``; this module only
aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: FIFO matching + balance history on sf0.001."""
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        q_balance_history,
    )

    return q_balance_history(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from thrivefinancedatapipeline_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from thrivefinancedatapipeline_spark.registry import all_oracles

    return all_oracles()
