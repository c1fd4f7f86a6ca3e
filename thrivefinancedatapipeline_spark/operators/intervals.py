"""Interval-overlap join: pairs of time intervals that intersect.

Spark has no interval join; the naive form is a per-key cross join
with ``a.start <= b.end AND b.start <= a.end`` — quadratic in the
rows per key and unshuffleable as an equi-join. The scalable
re-expression (the same one Databricks' range-join optimization and
time-series engines use) BUCKETIZES time:

1. explode every interval into the fixed-width buckets it covers
   (fan-out is bounded by interval_length / bucket_width + 1),
2. equi-join on (key, bucket) — a plain shuffle join on uniform keys,
3. keep genuinely overlapping pairs, and emit each pair ONLY in the
   first bucket both intervals share (``bucket ==
   floor(max(starts) / width)``) — every surviving pair appears
   exactly once, so no distinct() pass is needed.

Pick ``bucket_width`` near the typical interval length: too small
inflates the explode fan-out, too large inflates the per-bucket join.
At 100 TB both knobs degrade linearly, never quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import load_table
from ..plans.events_queries import SESSION_GAP_MIN

#: 1-hour buckets — the engine's event sessions run minutes-to-hours.
BUCKET_US = 3_600 * 1_000_000


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    bucket_width_us: int = BUCKET_US,
) -> DataFrame:
    """Join intervals (key, start, end as TIMESTAMP) that overlap,
    closed-interval semantics (touching endpoints count). Column names
    apart from `key`, `start`, `end` must not collide; left's payload
    survives with an ``l_``/``r_`` prefix on start/end.

    Returns (key, l_start, l_end, r_start, r_end, overlap_us).
    """
    def bucketed(df: DataFrame, side: str) -> DataFrame:
        s_us = F.unix_micros(F.col("start"))
        e_us = F.unix_micros(F.col("end"))
        return df.select(
            F.col(key),
            s_us.alias(f"{side}_s"),
            e_us.alias(f"{side}_e"),
            F.explode(
                F.sequence(
                    F.floor(s_us / bucket_width_us),
                    F.floor(e_us / bucket_width_us),
                )
            ).alias("bucket"),
        )

    lb = bucketed(left, "l")
    rb = bucketed(right, "r")
    first_shared = F.floor(
        F.greatest(F.col("l_s"), F.col("r_s")) / bucket_width_us
    )
    return (
        lb.join(rb, [key, "bucket"])
        .filter(
            (F.col("l_s") <= F.col("r_e"))
            & (F.col("r_s") <= F.col("l_e"))
            & (F.col("bucket") == first_shared)
        )
        .select(
            F.col(key),
            F.timestamp_micros(F.col("l_s")).alias("l_start"),
            F.timestamp_micros(F.col("l_e")).alias("l_end"),
            F.timestamp_micros(F.col("r_s")).alias("r_start"),
            F.timestamp_micros(F.col("r_e")).alias("r_end"),
            (
                F.least(F.col("l_e"), F.col("r_e"))
                - F.greatest(F.col("l_s"), F.col("r_s"))
            ).alias("overlap_us"),
        )
    )


def q_session_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which error bursts land inside a user's ACTIVE window — the
    interval-overlap join over two sessionizations of the same event
    stream: non-error activity sessions (held open for the 30-min
    session gap past their last event, else every sparse session is a
    degenerate point and nothing can overlap) vs error-burst
    sessions.

    r20 (guide §2.4): ONE sessionization over the composite key
    (user_id, is_err) replaces the two filtered sessionize() calls —
    sessions within a (user, is_err) group equal sessionizing that
    filtered stream (same rows, same (ts, event_id) order, same lag
    gaps), so the outputs are identical while the plan drops from two
    events scans + two window exchanges to one of each. The tiny
    session relation is checkpointed once and both join sides read it.
    Measured 0.93x at sf0.1, output-identical at sf0.01/sf0.1."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "error").alias("is_err"),
    )
    w = Window.partitionBy("user_id", "is_err").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = (
        tagged.withColumn(
            "session_idx",
            F.sum(new_session).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "is_err", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .localCheckpoint(eager=True)
    )
    act = sess.filter(~F.col("is_err")).select(
        "user_id",
        F.col("session_start").alias("start"),
        (
            F.col("session_end")
            + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
        ).alias("end"),
    )
    err = sess.filter(F.col("is_err")).select(
        "user_id",
        F.col("session_start").alias("start"),
        F.col("session_end").alias("end"),
    )
    out = interval_overlap_join(act, err, "user_id")
    return out.select(
        "user_id",
        F.date_format("l_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("act_start"),
        F.date_format("r_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("err_start"),
        "overlap_us",
    )


_SESS_SQL = f"""
  SELECT user_id,
         MIN(ts) AS start,
         MAX(ts) {{pad}} AS "end"
  FROM (
    SELECT user_id, ts,
           CAST(SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_idx
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > {SESSION_GAP_MIN * 60} * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev WHERE event_type {{op}} 'error'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
  )
  GROUP BY user_id, session_idx
"""

QUERIES = {
    "session_error_overlap": q_session_error_overlap,
}

ORACLES = {
    # the oracle states overlap DIRECTLY as the inequality join the
    # bucketized plan re-expresses
    "session_error_overlap": f"""
WITH ev AS (SELECT * FROM events),
act AS ({_SESS_SQL.format(op="<>", pad=f"+ INTERVAL {SESSION_GAP_MIN} MINUTE")}),
err AS ({_SESS_SQL.format(op="=", pad="")})
SELECT act.user_id,
       strftime(act.start, '%Y-%m-%d %H:%M:%S.%f') AS act_start,
       strftime(err.start, '%Y-%m-%d %H:%M:%S.%f') AS err_start,
       epoch_us(LEAST(act."end", err."end"))
         - epoch_us(GREATEST(act.start, err.start)) AS overlap_us
FROM act JOIN err ON act.user_id = err.user_id
WHERE act.start <= err."end" AND err.start <= act."end\"""",
}
