"""SparkSession factory tuned for the engine's workload.

Local testing runs on ``local[N]``; the same conf block is what we'd
ship to a 1000-executor cluster (AQE, skew-join handling, Arrow for the
few Pandas-UDF paths). Nothing here is testdata-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "thrivefinance-spark",
              shuffle_partitions: int | None = None,
              warehouse_dir: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join
      splitting — the 100 TB safety net for skewed CUSTOMERID keys.
    - Arrow on: multimodal/decode paths use Pandas UDFs.
    - shuffle partitions default to local core count for tests; on a
      real cluster this is overridden to ~2-3x total cores.
    - `warehouse_dir` (or $SPARK_GRAFT_WAREHOUSE) gives the process a
      PRIVATE `spark.sql.warehouse.dir`, so concurrent runs on one
      checkout (pytest alongside the correctness sweep) cannot race on
      the persisted index tables under the shared ./spark-warehouse.
      Static conf: it only takes effect for the session that CREATES
      the JVM — pass it before any other get_spark call in the
      process.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    wh = warehouse_dir or os.environ.get("SPARK_GRAFT_WAREHOUSE")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # scan-split sizing: 128 MiB input splits keep a 100 TB scan at
        # ~800k tasks and each task's columnar batch in executor memory
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # bridge mismatched bucket counts (multiples) without a shuffle
        .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
        # answer bare MIN/MAX/COUNT from parquet footers (off by
        # default): a full-table COUNT at 100 TB becomes a metadata read
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if wh:
        builder = builder.config(
            "spark.sql.warehouse.dir", os.path.abspath(wh)
        )
    return builder.getOrCreate()
