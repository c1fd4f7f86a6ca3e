"""Ingest: turn raw event streams into the typed transaction table.

The reference pipeline (reference src/thrive_cash_processing_dag.py:60,
``download_data``) pulls an Excel workbook from S3 and splits the
TC_Data sheet into earned/spent/expired frames by ``transaction_type``.
Our Spark analogue derives the same five-column transaction schema from the
``events`` table declaratively — one projection, no collect, and the
split into earned/spent/expired is a filter (predicate-pushdown
friendly), not three materialized copies.

Transaction schema (reference src/fifo_matching.py:54 column_mapping):
  trans_id BIGINT, tctype STRING, createdat TIMESTAMP,
  customerid BIGINT, amount DOUBLE

Domain mapping (deterministic, documented in SURVEY.md §3):
  event_type 'purchase' → 'spent', 'error' → 'expired',
  anything else → 'earned'. Spent/expired amounts are negated to match
  the reference's sign convention (spent rows carry negative amounts;
  validations take abs()).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import load_table

logger = logging.getLogger(__name__)

#: ANSI-SQL fragment of the same mapping, shared by oracle_sql().
TCTYPE_SQL = ("CASE event_type WHEN 'purchase' THEN 'spent' "
              "WHEN 'error' THEN 'expired' ELSE 'earned' END")
AMOUNT_SQL = ("CASE WHEN event_type IN ('purchase','error') "
              "THEN -value ELSE value END")

#: SQL snippet producing the full transactions relation from `events`.
#: make_timestamp(epoch_ns//1000) truncates the nanosecond source to
#: microseconds exactly like the Spark read path (datamodel.load_table).
TRANSACTIONS_SQL = f"""
SELECT event_id AS trans_id,
       {TCTYPE_SQL} AS tctype,
       make_timestamp(epoch_ns(ts) // 1000) AS createdat,
       user_id AS customerid,
       {AMOUNT_SQL} AS amount
FROM events
"""


def transactions_from_events(events: DataFrame) -> DataFrame:
    """Project the events table into the transaction schema.

    Pure column expressions → stays inside whole-stage codegen; the
    projection prunes the parquet scan down to 4 columns.
    """
    tctype = (
        F.when(F.col("event_type") == "purchase", F.lit("spent"))
        .when(F.col("event_type") == "error", F.lit("expired"))
        .otherwise(F.lit("earned"))
    )
    amount = F.when(
        F.col("event_type").isin("purchase", "error"), -F.col("value")
    ).otherwise(F.col("value"))
    return events.select(
        F.col("event_id").alias("trans_id"),
        tctype.alias("tctype"),
        F.col("ts").alias("createdat"),
        F.col("user_id").alias("customerid"),
        amount.alias("amount"),
    )


#: staging layout: dataset name -> subdirectory (reference writes
#: earned/spent/expired + sales + customers parquet under one
#: date-stamped staging path, thrive_cash_processing_dag.py:118-125).
_SPLIT_TYPES = ("earned", "spent", "expired")


def stage_inputs(
    spark: SparkSession,
    sf_dir: str,
    staging_dir: str,
    correlation_id: str = "manual-run",
) -> dict:
    """Materialize the staging area the reference's ``download_data``
    task produces (src/thrive_cash_processing_dag.py:60-150): the
    TC_Data sheet split into earned/spent/expired parquet PLUS the
    Sales and Customers sheets, and the same
    ``{status, staging_path, counts}`` return contract.

    Spark-native shape: the three type splits are filters over ONE
    transactions projection — each write pushes its own
    ``tctype = ...`` predicate into the scan instead of building three
    driver-side copies; Sales/Customers map to the orders/customer
    tables (the reference only row-counts them downstream). Counts are
    read back from the written parquet footers — a metadata-only job,
    no second pass over the data."""
    txns = transactions_from_events(load_table(spark, sf_dir, "events"))
    out: dict[str, str] = {}
    for t in _SPLIT_TYPES:
        out[t] = f"{staging_dir}/{t}"
        txns.filter(F.col("tctype") == t).write.mode("overwrite").parquet(out[t])
    for name, table in (("sales", "orders"), ("customers", "customer")):
        out[name] = f"{staging_dir}/{name}"
        load_table(spark, sf_dir, table).write.mode("overwrite").parquet(out[name])
    counts = {
        name: spark.read.parquet(path).count() for name, path in out.items()
    }
    logger.info(
        "[%s] staged inputs to %s — earned: %d, spent: %d, expired: %d | "
        "sales: %d | customers: %d",
        correlation_id, staging_dir, counts["earned"], counts["spent"],
        counts["expired"], counts["sales"], counts["customers"],
    )
    return {
        "status": "success",
        "staging_path": staging_dir,
        "counts": counts,
    }


def load_staged_transactions(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Rebuild the unified transactions relation from a staging area
    written by `stage_inputs` — the reference's ``load_from_staging``
    (src/fifo_matching.py:133) reading the three type splits. The
    three parquet reads union by position (identical schemas by
    construction)."""
    parts = [
        spark.read.parquet(f"{staging_dir}/{t}") for t in _SPLIT_TYPES
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.union(p)
    return df
