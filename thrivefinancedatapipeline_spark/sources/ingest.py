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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
