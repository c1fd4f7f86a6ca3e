"""Source/sink surface (reference I/O parity, Spark-native).

Reference I/O (src/thrive_cash_processing_dag.py:60 download_data /
:252 outputs): Excel workbook in (TC_Data / Sales / Customers sheets),
parquet staging, CSV deliverable, JSON report.

Spark-native mapping:
- parquet: primary format (columnar scan, predicate pushdown).
- csv / json: read + write with explicit schema (never infer on a
  100 TB path — schema inference is a full extra pass).
- excel: driver-side pandas read (gated import; an .xlsx is by nature
  a single small file — it is the *entry* of the pipeline, never a
  distributed dataset) then parallelized to a DataFrame.
- partitioned parquet sink: writer-side repartition control so file
  counts track data volume, not shuffle-partition config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_excel_sheet(
    spark: SparkSession, path: str, sheet_name: str
) -> DataFrame:
    """Excel ingestion (the reference's tc_raw_data.xlsx entry point).

    Reads on the driver with pandas (xlsx is a small single file by
    construction) and parallelizes. Raises a clear error when no
    excel engine is installed in the environment.
    """
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as exc:  # pragma: no cover - env without pandas/openpyxl
        raise NotImplementedError(
            "excel support requires pandas + an excel engine (openpyxl)"
        ) from exc
    return spark.createDataFrame(pdf)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV deliverable (reference tc_data_with_redemptions.csv).
    single_file coalesces to one part — only for report-sized output."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (Hive-ecosystem interchange). Spark's native ORC writer
    keeps columnar stats for predicate pushdown like parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_range_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    n_files: int | None = None,
) -> None:
    """Range-partition + sort-within-files on `sort_by` before
    writing. Parquet stores per-row-group min/max for every column;
    sorted files make those stats TIGHT, so later range predicates on
    the sort key skip whole row groups without any index structure —
    the cheap version of Z-ordering for single-key access patterns
    (time-series scans on ts, key lookups on id)."""
    cols = [df[c] for c in sort_by]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*sort_by).write.mode("overwrite").parquet(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose files have EVOLVED schemas
    (columns added over time): mergeSchema unions the footers; older
    files surface the new columns as nulls. Off by default because the
    footer merge is an extra pass — turn it on only at known evolution
    boundaries, then rewrite (compact_parquet) to a single schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files
    sized for scan efficiency. Streaming sinks and incremental loads
    accrete tiny files; at 100 TB that means millions of scan tasks
    and footer reads. Sizing from the actual input bytes (not row
    counts) keeps output files near the scan split size. Returns the
    output file count."""
    import glob
    import os

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
    )
    n_files = max(1, total_bytes // (target_file_mb * 1024 * 1024))
    df.repartition(int(n_files)).write.mode("overwrite").parquet(out_path)
    return int(n_files)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Parquet sink with explicit output-file control.

    target_partitions sizes output files to data volume (e.g.
    rows/`maxRecordsPerFile`) instead of inheriting
    spark.sql.shuffle.partitions — the classic small-files fix.
    """
    out = df.repartition(target_partitions, *partition_by) if (
        target_partitions and partition_by
    ) else (df.repartition(target_partitions) if target_partitions else df)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Z-order (Morton) clustering: sort files by the bit-interleaved
    key of SEVERAL columns so parquet row-group min/max stats stay
    tight on EVERY clustered column at once — the multi-key upgrade of
    `write_range_sorted_parquet` (which optimizes exactly one key).
    Each output file then covers a small bounding box in the key
    space, so predicates on ANY clustered column skip most files via
    footer stats alone — no index structure, no table format.

    Columns are min-max scaled into `bits`-bit integers with one tiny
    bounds aggregate (driver literals — clustering quality only, never
    semantics), then interleaved with pure shift/or expressions
    (whole-stage codegen; bits * n_cols terms)."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    * F.lit(float(top))
                    / F.lit(span)
                ).cast("long"),
            )
        )
    k = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + i
                ).cast("long")
            )
    zdf = df.withColumn("__z", z)
    out = (
        zdf.repartitionByRange(n_files, "__z")
        if n_files
        else zdf.repartitionByRange("__z")
    )
    (
        out.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingestion for the multimodal stack: Spark's built-in
    `binaryFile` source over a directory tree — (path,
    modificationTime, length, content) per file — normalized to the
    (doc_id, path, length, payload) shape the decode kernels consume.
    doc_id is the FULL 128-bit md5 of the CONTENT (32-char hex), not
    the path: path-tail ids collide on the ubiquitous shard-name
    layout (a/part-0000, b/part-0000) and full-path ids break when
    the corpus moves mounts; a content id is stable everywhere and
    two equal ids mean byte-identical files — exactly the collapse a
    corpus keyed for dedup wants. The id keeps all 128 bits because
    the corpus design point is ~1.5B documents at 100 TB, where a
    60-bit prefix is already birthday-likely to collide (two DISTINCT
    files silently collapsing to one id, one dropped as a duplicate
    downstream); truncated md5 longs stay fine for CHECKSUMS, never
    for keys. This is how image/audio/video bytes enter at 100 TB:
    the source lists files in parallel, never reads payloads for
    pruned files, and `max_bytes` pushes a LENGTH predicate into the
    listing (pathGlobFilter prunes by name) so a stray multi-GB file
    cannot OOM an executor batch.

    No decode happens here — feed the payload column to the
    multimodal kernels (decode gates stay armed)."""
    from pyspark.sql import functions as F

    # corpus drops arrive as directory TREES (by crawl date/shard);
    # recursive lookup lists them all — and deliberately disables
    # partition-column inference, which raw drops don't carry
    r = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    )
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        F.md5(F.col("content")).alias("doc_id"),
        F.col("path"),
        F.col("length").cast("long").alias("length"),
        F.col("content").alias("payload"),
    )


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw-text corpus ingestion: one document per FILE via the
    built-in text source's `wholetext` mode — (doc_id, path, text),
    doc_id the same CONTENT-hash convention as read_binary_files —
    the full 128-bit md5 hex of the text (path-tail ids collide
    across shard directories; content ids are mount-stable and
    collapse byte-identical drops; a truncated-long id is
    birthday-likely to collide near the ~1.5B-doc design point). For
    line-delimited corpora use stream_jsonl_corpus / spark.read.json
    with explicit ids instead; wholetext is the right unit when
    documents ARE files (the common raw-crawl drop layout). An EMPTY
    file yields no record (the text source emits rows from content,
    not listings)."""
    from pyspark.sql import functions as F

    df = (
        spark.read.option("recursiveFileLookup", "true")
        .text(path, wholetext=True)
        .withColumn("path", F.input_file_name())
    )
    return df.select(
        F.md5(F.col("value")).alias("doc_id"),
        "path",
        F.col("value").alias("text"),
    )
