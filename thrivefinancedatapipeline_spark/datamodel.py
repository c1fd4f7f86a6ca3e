"""Table catalog: load the engine's input tables from a parquet dir.

Tables follow the driver's TPC-H-ish layout (TESTDATA.md): region,
nation, customer, supplier, part, orders, lineitem, events, documents,
embeddings — one parquet file/dir each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_confs(spark: SparkSession) -> None:
    """Session confs the engine depends on, set defensively at runtime
    because the driver owns the SparkSession in verify runs.

    - nanosAsLong: events.ts may be parquet TIMESTAMP(NANOS) — Spark's
      max precision is micros, so read the raw int64 and truncate
      ourselves (identically to the DuckDB oracle's epoch_ns(ts)//1000)
      — or timestamp[us] with isAdjustedToUTC=false, which loads as
      TIMESTAMP_NTZ; `load_table` normalizes BOTH variants to UTC
      micros (see its per-dtype branches).
    - UTC session tz: keeps timestamp wall-clock identical between
      Spark (tz-aware micros) and DuckDB (naive) outputs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Parquet scans carry pushed filters/pruned columns
    from whatever plan consumes them — do not cache here."""
    _ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # TIMESTAMP(NANOS) read raw: nanos → micros, floor division
            # (matches oracle epoch_ns(ts)//1000)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif dt == "timestamp_ntz":
            # parquet timestamp[us] isAdjustedToUTC=false loads as NTZ;
            # with the UTC session tz this cast keeps the wall clock —
            # identical micros to the DuckDB oracle's naive timestamps
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table into a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() plans."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
