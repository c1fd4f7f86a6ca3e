"""Structured Streaming twins of the batch finance/event operators.

The reference runs a monthly Airflow batch
(reference src/thrive_cash_processing_dag.py:50 schedule_interval);
the Spark-native upgrade is continuous processing of the same
semantics. Each streaming operator here has a batch twin whose output
it must converge to (tests assert that lambda-parity).

- stream_transactions: readStream + the SAME projection as
  sources/ingest.transactions_from_events (one code path for both).
- stream_current_balances: per-customer running totals — streaming
  aggregation in update mode, the twin of balance.current_balances.
- stream_windowed_event_agg: watermarked tumbling windows, twin of
  events_queries.q_events_windowed_agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sources.ingest import transactions_from_events

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source event stream (new parquet files appear in
    source_dir). Schema is pinned — streaming reads can't infer."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_transactions(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming twin of ingest: same projection, streaming source."""
    return transactions_from_events(
        stream_events(spark, source_dir, max_files_per_trigger)
    )


def stream_current_balances(spark: SparkSession, source_dir: str) -> DataFrame:
    """Running earned/spent/expired totals + balance per customer.

    Streaming aggregation keyed by customerid (state store holds one
    row per customer — bounded by customer cardinality, the same
    shuffle key as the batch twin)."""
    txns = stream_transactions(spark, source_dir)
    cum = lambda t: F.sum(  # noqa: E731
        F.when(F.col("tctype") == t, F.abs(F.col("amount"))).otherwise(0.0)
    )
    return txns.groupBy("customerid").agg(
        cum("earned").alias("cumulative_earned"),
        cum("spent").alias("cumulative_spent"),
        cum("expired").alias("cumulative_expired"),
        (cum("earned") - cum("spent") - cum("expired")).alias("current_balance"),
    )


def stream_windowed_event_agg(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling 1-hour windows per event_type: the
    streaming twin of q_events_windowed_agg. Late data beyond the
    watermark is dropped; in append mode windows finalize once the
    watermark passes."""
    ev = stream_events(spark, source_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100, 2
            ).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
) -> None:
    """Drain all available input into a (optionally partitioned)
    parquet sink with exactly-once file commit via the checkpoint —
    the production sink shape; availableNow makes it batch-invocable
    (the reference's monthly cron becomes `trigger(availableNow)` on
    a schedule, no always-on cluster)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.start().awaitTermination()


def run_to_completion(stream_df: DataFrame, checkpoint: str, name: str) -> DataFrame:
    """Drain all available input (availableNow) into a memory sink and
    return the result table. Test/dev helper — production would
    writeStream to a real sink with the same trigger."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


#: pinned schema for streaming corpus drops — streaming reads can't
#: infer, and a corpus stream without explicit ids can't dedup
CORPUS_JSONL_SCHEMA = (
    "doc_id long, lang string, source string, text string"
)


def stream_jsonl_corpus(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Continuous corpus ingestion: JSONL drop files (one document
    per line, explicit doc_id — the standard crawl-delivery format)
    land in source_dir and stream through with a PINNED schema.
    Whole-file text ingestion stays batch-only
    (sources.io.read_text_corpus): the streaming text source
    silently IGNORES the wholetext option and line-splits
    (measured — a 2-line file became 2 rows), so a wholetext
    streaming twin would corrupt documents; JSONL carries document
    boundaries in-band instead. FileStreamSource orders files by
    modification time (same-mtime ties can reorder across
    micro-batches — order-insensitive consumers only).
    maxFilesPerTrigger bounds per-batch FILE count, not bytes."""
    return (
        spark.readStream.schema(CORPUS_JSONL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )


def corpus_funnel_stream(
    spark: SparkSession,
    source_dir: str,
    blocklist: DataFrame,
    bench_doc_mod: int = 97,
    dedup_within: str | None = None,
) -> DataFrame:
    """Streaming head of the corpus curation funnel: JSONL drops
    stream in (stream_jsonl_corpus), each document is decontaminated
    against a STATIC benchmark shingle blocklist (the eval set is
    known before collection starts — the production posture; passed
    as a 1-column 'sh' DataFrame and collapsed to one broadcast array
    row, since stream-static cross joins are rejected but a dummy-key
    equi join is not), and survivors are exact-deduped on the FULL
    128-bit md5 content hex (the q_dedup_exact key convention —
    truncated md5 longs stay fine for CHECKSUMS, never for keys: a
    60-bit key is birthday-likely to collide near the ~1.5B-doc
    design point and a colliding distinct document would be silently
    dropped) with CROSS-DROP state: dropDuplicates keeps its seen
    set in the checkpoint, so a byte-identical document arriving in a
    LATER drop is suppressed exactly like an in-batch duplicate. The
    emitted content_hash column stays the 60-bit md5_long CHECKSUM
    (downstream join/telemetry convention).

    Same clean rule as the batch q_corpus_clean: non-benchmark id AND
    zero distinct-shingle overlap with the blocklist (arrays_overlap
    on an empty shingle array is false, matching the batch treatment
    of sub-3-token documents). State note: plain dropDuplicates state
    grows with the corpus; `dedup_within` (a watermark delay string,
    e.g. '10 minutes') switches to dropDuplicatesWithinWatermark over
    an ingest-time column — the production posture when duplicate
    arrivals are lateness-bounded: the seen-set is EVICTED past the
    watermark, so state is bounded by arrival rate x delay instead of
    corpus size, and a duplicate arriving later than the bound is the
    accepted (documented) re-emission trade.

    Returns the streaming DataFrame of funnel survivors
    (doc_id, lang, source, content_hash); drive it with an
    append-mode file sink + availableNow drains (the memory sink
    cannot recover checkpoints across drains)."""
    from ..functions.text import md5_long, shingles_from_tokens, tokens

    bl = (
        blocklist.agg(
            F.collect_set("sh").alias("bl_shingles")
        ).withColumn("_k", F.lit(1))
    )
    stream = stream_jsonl_corpus(spark, source_dir)
    shingled = stream.select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.col("text")).alias("content_key"),
        md5_long(F.col("text")).alias("content_hash"),
        tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "lang",
        "source",
        "content_key",
        "content_hash",
        shingles_from_tokens(F.col("toks")).alias("shs"),
        F.lit(1).alias("_k"),
    )
    clean = (
        shingled.join(F.broadcast(bl), "_k")
        .filter(
            (F.col("doc_id") % bench_doc_mod != 0)
            & ~F.arrays_overlap(F.col("shs"), F.col("bl_shingles"))
        )
        .select("doc_id", "lang", "source", "content_key", "content_hash")
    )
    if dedup_within is None:
        return clean.dropDuplicates(["content_key"]).drop("content_key")
    # ingest time, not event time: corpus drops carry no timestamp,
    # and the dedup window is about ARRIVAL lateness by definition
    return (
        clean.withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", dedup_within)
        .dropDuplicatesWithinWatermark(["content_key"])
        .drop("ingest_ts", "content_key")
    )
