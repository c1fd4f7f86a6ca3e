"""Custom stateful streaming operators.

The flagship is `stream_fifo_match`: the reference's core FIFO
algorithm (reference src/fifo_matching.py:23) as a CONTINUOUS process
instead of a monthly batch. Spark has no built-in operator for
"pair the nth A with the nth B per key across time", so this is the
`applyInPandasWithState` case: per-customer state is the pair of
unmatched-so-far queues, and each micro-batch emits exactly the
matches that became determined.

Why queues converge to the batch rank-equality join: batch FIFO is
"nth redeemer consumes nth earned" per customer (operators/fifo.py).
Holding the unmatched suffix of each side in state and zipping
head-to-head as rows arrive produces pair (i, i) exactly once, when
the later of the two sides arrives — the same pairs, incrementally.

Ordering: rows are sorted within each micro-batch; cross-batch order
is arrival order. A production deployment fronts this with a
watermark-delayed sort (emit only below the watermark) to tolerate
out-of-order sources; the lambda-parity tests feed time-ordered files,
matching the reference's monthly-export reality.

State size: O(unmatched backlog) per customer — bounded by the same
earned-surplus the reference's data model guarantees; a runaway key
is visible as state-store growth, the streaming analogue of the skew
checks in `operators/skew.py`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.events_queries import SESSION_GAP_MIN
from .balance_stream import stream_events, stream_transactions

MATCH_SCHEMA = "customerid long, trans_id long, redeemid long"
STATE_SCHEMA = "earned array<long>, redeem array<long>"


def _fifo_state_fn(key, pdf_iter, state: GroupState):
    """Per-customer matcher: append sorted arrivals to the unmatched
    queues, emit zipped pairs, keep the unmatched suffix as state."""
    if state.exists:
        earned_q, redeem_q = state.get
        earned_q, redeem_q = list(earned_q), list(redeem_q)
    else:
        earned_q, redeem_q = [], []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["createdat", "trans_id"])
        for tid, ttype in zip(pdf["trans_id"], pdf["tctype"]):
            (earned_q if ttype == "earned" else redeem_q).append(int(tid))
    n = min(len(earned_q), len(redeem_q))
    state.update((earned_q[n:], redeem_q[n:]))
    yield pd.DataFrame(
        {
            "customerid": [int(key[0])] * n,
            "trans_id": earned_q[:n],
            "redeemid": redeem_q[:n],
        }
    )


def stream_fifo_match(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous FIFO matching over the event stream. Emits one row
    per determined match: (customerid, trans_id of the earned row,
    redeemid of the consuming spent/expired row). Append mode — each
    match is final the moment it is emitted."""
    txns = stream_transactions(spark, source_dir, max_files_per_trigger)
    return txns.groupBy("customerid").applyInPandasWithState(
        _fifo_state_fn,
        outputStructType=MATCH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


try:  # Spark 4+: the state-v2 API (transformWithState). Its Python
    # driver worker speaks protobuf to the JVM, so the API is only
    # usable when google.protobuf is importable — gate on both.
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - Spark 3.x or no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment]
    HAS_TWS = False


class _FifoProcessor(StatefulProcessor):
    """State-v2 twin of `_fifo_state_fn`: the unmatched queues live in
    typed ValueState variables instead of one opaque state tuple.

    What the migration buys at scale: transformWithState runs on the
    RocksDB state-store provider with changelog checkpointing (state
    deltas, not full snapshots, per micro-batch), supports per-state
    TTL and timers, and allows schema evolution per state variable —
    the operational features the v1 applyInPandasWithState API lacks.
    Same matching semantics, verified by the same batch-parity test.
    """

    def init(self, handle) -> None:
        self._earned = handle.getValueState("earned", "q array<long>")
        self._redeem = handle.getValueState("redeem", "q array<long>")

    def handleInputRows(self, key, rows, timer_values):
        got = self._earned.get()
        earned_q = list(got[0]) if got is not None else []
        got = self._redeem.get()
        redeem_q = list(got[0]) if got is not None else []
        for pdf in rows:
            pdf = pdf.sort_values(["createdat", "trans_id"])
            for tid, ttype in zip(pdf["trans_id"], pdf["tctype"]):
                (earned_q if ttype == "earned" else redeem_q).append(int(tid))
        n = min(len(earned_q), len(redeem_q))
        self._earned.update((earned_q[n:],))
        self._redeem.update((redeem_q[n:],))
        yield pd.DataFrame(
            {
                "customerid": [int(key[0])] * n,
                "trans_id": earned_q[:n],
                "redeemid": redeem_q[:n],
            }
        )

    def close(self) -> None:
        pass


def stream_fifo_match_v2(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous FIFO matching on the Spark-4 transformWithState API.

    Requires the RocksDB state-store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider) — the same provider a
    production deployment wants anyway for changelog checkpointing and
    state larger than executor heap."""
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark 4+ and the "
            "google.protobuf package (its Python runner speaks "
            "protobuf to the JVM)"
        )
    txns = stream_transactions(spark, source_dir, max_files_per_trigger)
    return txns.groupBy("customerid").transformWithStateInPandas(
        statefulProcessor=_FifoProcessor(),
        outputStructType=MATCH_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def stream_enriched_events(
    spark, source_dir: str, customer_dim: DataFrame
) -> DataFrame:
    """Stream-static join: enrich the event stream with a dimension
    table. The static side broadcasts per micro-batch — no state, no
    watermark needed; the standard pattern for attaching slowly-
    changing reference data to a 100 TB/day stream."""
    ev = stream_events(spark, source_dir)
    dim = customer_dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return ev.join(F.broadcast(dim), "user_id", "left")


def stream_purchase_attribution(
    spark, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user
    touches (click/view) in the preceding hour. Both sides are
    watermarked so the join state is bounded: a touch can be dropped
    once the watermark passes its ts + 1h. The streaming twin of
    `plans/advanced.q_range_join_touch_counts`'s match step."""
    ev = stream_events(spark, source_dir)
    touches = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("t_user"),
            F.col("ts").alias("touch_ts"),
            F.col("event_id").alias("touch_id"),
        )
        .withWatermark("touch_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        touches,
        F.expr(
            "p_user = t_user AND "
            "touch_ts < purchase_ts AND "
            "touch_ts >= purchase_ts - INTERVAL 1 HOUR"
        ),
    ).select("purchase_id", "touch_id", "purchase_ts", "touch_ts")


def stream_sliding_counts(
    spark, source_dir: str, watermark: str = "4 hours"
) -> DataFrame:
    """Sliding windows (4h length, 1h slide) per event type — each
    event lands in 4 overlapping windows; watermark finalizes a
    window once no earlier data can arrive. The streaming form of a
    moving aggregate (batch twin: groupBy(F.window(..., slide)))."""
    ev = stream_events(spark, source_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "4 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


EWMA_OUT_SCHEMA = (
    "event_id long, event_type string, micros long, "
    "ewma_num long, ewma_den int"
)
EWMA_STATE_SCHEMA = "recent array<long>"


def _ewma_state_fn(key, pdf_iter, state: GroupState):
    """Per-type exponential smoother: state is the last K-1 micro
    values (newest first); each arriving row emits its exact integer
    (ewma_num, ewma_den) pair and shifts into the window."""
    from ..plans.events_queries import EWMA_K, EWMA_WEIGHTS

    recent = list(state.get[0]) if state.exists else []
    frames = list(pdf_iter)
    pdf = (pd.concat(frames) if len(frames) > 1 else frames[0]).sort_values(
        ["ts", "event_id"]
    )
    out_id, out_micros, out_num, out_den = [], [], [], []
    for eid, x in zip(pdf["event_id"], pdf["micros"]):
        window = [int(x)] + recent[: EWMA_K - 1]
        out_id.append(int(eid))
        out_micros.append(int(x))
        out_num.append(sum(w * v for w, v in zip(EWMA_WEIGHTS, window)))
        out_den.append(sum(EWMA_WEIGHTS[: len(window)]))
        recent = window[: EWMA_K - 1]
    state.update((recent,))
    yield pd.DataFrame(
        {
            "event_id": out_id,
            "event_type": [key[0]] * len(out_id),
            "micros": out_micros,
            "ewma_num": out_num,
            "ewma_den": out_den,
        }
    )


def stream_ewma(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous per-type EWMA — the streaming twin of
    `plans/events_queries.ewma_smooth` (lambda parity: identical rows
    over time-ordered input; pinned by test_streaming_stateful).

    The micros conversion runs in Spark expressions BEFORE the
    stateful op so batch and stream round value->int identically.
    State per key is a fixed K-1 longs — O(#event_types) total, the
    smallest possible stateful footprint; at 100 TB/day the state
    store holds kilobytes while the heavy lifting (projection,
    conversion) stays in codegen."""
    ev = stream_events(spark, source_dir, max_files_per_trigger)
    x = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("micros"),
    )
    return x.groupBy("event_type").applyInPandasWithState(
        _ewma_state_fn,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(spark, source_dir: str, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once projection of an at-least-once source: drop
    duplicate event_ids within the watermark horizon.

    Uses dropDuplicatesWithinWatermark (Spark 3.5+): state holds one
    entry per id and is evicted as the watermark advances — bounded.
    Plain dropDuplicates(["event_id"]) would NOT get watermark-based
    eviction (the event-time column isn't in the subset), so its state
    grows without bound in production."""
    ev = stream_events(spark, source_dir)
    return ev.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_dedup_content(
    spark, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the batch windowed content dedup
    (plans/events_queries.q_events_dedup_windowed): first event per
    (hour, user, type, value-cents) survives; duplicates inside the
    watermark horizon are dropped with bounded state. The hour-trunc
    column rides the dedup subset, so a key's state is only needed
    until the watermark passes its hour — the same window-bounded
    state the batch query expresses with its groupBy. (Batch keeps the
    smallest event_id; the stream keeps the first arrival — identical
    KEY sets, which is what the parity test pins.)"""
    ev = stream_events(spark, source_dir)
    return (
        ev.withColumn("hour", F.date_trunc("hour", "ts"))
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(
            ["hour", "user_id", "event_type", "cents"]
        )
    )


def stream_sessionize(
    spark, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization: native session_window with the same
    30-min gap as the batch operator (plans/events_queries). Sessions
    finalize (append) once the watermark passes their close."""
    ev = stream_events(spark, source_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "first_event_id",
        )
    )


def stream_cms_counters(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous count-min sketch of user_id frequencies — the
    streaming twin of the grid under `operators/sketches.
    q_heavy_hitters_cms`, reusing the identical `cms_grid`
    transformation (one code path, batch or stream).

    The CMS is the textbook mergeable-state structure: each micro-batch
    adds into the fixed depth×width cell counters, which is exactly the
    sketch's merge operation, so Spark's streaming aggregation state IS
    the sketch — bounded at depth×width cells regardless of input
    volume or cardinality, and any point-in-time drain answers
    frequency queries without re-reading history. Complete output mode
    (the grid is tiny); no watermark needed because cells only grow."""
    from ..operators.sketches import cms_grid

    return cms_grid(stream_events(spark, source_dir, max_files_per_trigger))


KMV_OUT_SCHEMA = "event_type string, n_sketch int, kth_min_hash long"
KMV_STATE_SCHEMA = "mins array<long>"


def _kmv_state_fn(key, pdf_iter, state: GroupState):
    """Per-type KMV state: the k smallest distinct 60-bit user hashes
    seen so far. Each micro-batch unions its hashes in and re-takes
    the k smallest — the KMV MERGE operation, so state stays <= k
    longs per key no matter the stream volume. Emits the post-batch
    sketch snapshot (the last emitted row per key is the final
    sketch)."""
    from ..operators.sketches import KMV_K

    mins = set(state.get[0]) if state.exists else set()
    for pdf in pdf_iter:
        mins.update(int(h) for h in pdf["h"])
    mins = sorted(mins)[:KMV_K]
    state.update((mins,))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_sketch": [len(mins)],
            "kth_min_hash": [mins[-1] if mins else 0],
        }
    )


def stream_kmv_distinct(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous KMV distinct-count sketch per event type — the
    streaming twin of `operators/sketches.q_sketch_distinct_users`'s
    sketch phase, and the custom-MERGEABLE-state companion to
    `stream_cms_counters` (whose cells a built-in streaming sum
    maintains; a k-minimum set needs applyInPandasWithState).

    The md5 hashing runs in Spark expressions BEFORE the stateful op
    (codegen, and bit-identical to the batch query); Python only
    merges <= k longs per key per batch. Drain parity with the batch
    sketch is pinned by test."""
    from ..functions.text import md5_long

    ev = stream_events(spark, source_dir, max_files_per_trigger)
    hashed = ev.select(
        "event_type", md5_long(F.col("user_id").cast("string")).alias("h")
    )
    return hashed.groupBy("event_type").applyInPandasWithState(
        _kmv_state_fn,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: marker file carried inside every snapshot dir (leading underscore →
#: ignored by parquet readers): the last batch_id folded in, read back
#: to make crash-replayed batches no-ops.
SNAPSHOT_MARKER = "_applied_batch"


def current_snapshot(path: str) -> str | None:
    """Resolve the committed snapshot for an atomically-swapped dir:
    the live dir is authoritative; `<path>__old` only exists if a
    crash hit between the two renames (live moved aside, tmp never
    promoted) — then __old IS the last committed state."""
    import os

    if os.path.isdir(path):
        return path
    if os.path.isdir(path + "__old"):
        return path + "__old"
    return None


def applied_batch(snapshot: str) -> int:
    """batch_id recorded in the snapshot's marker (-1 if none)."""
    import os

    try:
        with open(os.path.join(snapshot, SNAPSHOT_MARKER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def swap_snapshot(df, path: str, batch_id: int) -> None:
    """Write `df` as the new committed snapshot of `path` with the
    atomic two-rename swap. Ordering invariant: a committed snapshot
    exists at `path` or `<path>__old` at EVERY intermediate point —
    __old is only deleted after tmp has been promoted to live
    (deleting it earlier would, on a crash in between, leave only the
    un-promoted tmp, which restarts discard). The batch marker is
    written into tmp so it travels atomically with the promote."""
    import os
    import shutil

    tmp, old = path + "__tmp", path + "__old"
    if os.path.isdir(tmp):  # stale tmp from a crashed write
        shutil.rmtree(tmp)
    df.localCheckpoint(eager=True).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, SNAPSHOT_MARKER), "w") as f:
        f.write(str(int(batch_id)))
    if os.path.isdir(path):
        if os.path.isdir(old):  # stale from a prior crash
            shutil.rmtree(old)
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def run_scd2_upsert(spark, source_dir: str, dim_path: str, checkpoint: str):
    """Continuous SCD2 dimension maintenance — the foreachBatch CDC
    sink pattern: each micro-batch of transactions MERGEs into the
    persisted dimension via `operators.balance.scd2_apply_increment`
    (close affected customers' current rows, append new validity
    rows); the first batch bootstraps the dimension with a full
    `balance_scd2` build.

    This is the production deployment of the batch upsert: the
    dimension is only ever touched where deltas exist, the checkpoint
    makes the sink restart-safe, and `trigger(availableNow)` turns the
    same code into the reference's monthly cron. Inherits the
    increment contract (batches arrive time-ordered — the
    monthly-export reality; a watermark-delayed buffer fronts this for
    out-of-order sources).

    The snapshot swap is ATOMIC at the directory level: each batch
    writes the merged dimension to `<dim_path>__tmp`, then renames the
    live dir aside and the tmp dir into place (two same-filesystem
    renames, each atomic). A crash mid-write leaves the live snapshot
    untouched; a crash between the renames leaves `<dim_path>__old` as
    the fallback the next batch reads — a partially-written parquet
    dir is never read back as prev.

    Replay idempotence: scd2_apply_increment is NOT idempotent, and
    the engine re-runs a batch if a crash lands after the snapshot
    promote but before the streaming commit-log write. Each snapshot
    therefore carries a `_applied_batch` marker (written into tmp, so
    it travels atomically with the promote; the leading underscore
    makes parquet readers ignore it) and a replayed batch_id <= the
    marker is skipped — the snapshot already contains it. Equality
    with a full rebuild over all drained batches is pinned by test,
    including the crash-replay windows."""
    from ..operators.balance import balance_scd2, scd2_apply_increment

    txns = stream_transactions(spark, source_dir, max_files_per_trigger=1)

    def upsert(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        prev_path = current_snapshot(dim_path)
        if prev_path is not None:
            if batch_id <= applied_batch(prev_path):
                return  # crash-replay of a batch the snapshot has
            prev = spark.read.parquet(prev_path)
            new_dim = scd2_apply_increment(prev, batch_df)
        else:
            new_dim = balance_scd2(batch_df)
        swap_snapshot(new_dim, dim_path, batch_id)

    (
        txns.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(dim_path)


REORDER_DELAY_US = 3_600_000_000  # default: 1 hour of tolerated disorder
REORDER_OUT_SCHEMA = "event_id long, user_id long, micros long, seq long"
REORDER_STATE_SCHEMA = (
    "ids array<long>, ts array<long>, seen_max long, next_seq long"
)


def stream_reorder(
    spark,
    source_dir: str,
    delay_us: int = REORDER_DELAY_US,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Watermark-delayed REORDER BUFFER — the front that removes the
    time-ordered-arrival contract from the stateful operators
    downstream (FIFO matcher, EWMA): rows arriving up to `delay_us`
    out of order are parked per key and released in exact
    (ts, event_id) order once the key's watermark (max event time
    seen − delay) passes them, each stamped with a per-key emission
    sequence number.

    The streaming analogue of a sort — windowed, incremental, and
    BOUNDED: state holds only the pending tail (≤ rate × delay rows
    per key), not the stream. Spark allows one applyInPandasWithState
    per query, so in production this runs as its own stage writing an
    ordered log (foreachBatch / parquet sink) that the matcher stage
    consumes. Ordering + completeness-to-horizon on shuffled input are
    pinned by test; rows later than the horizon still emit (tagged by
    their out-of-order seq) rather than silently drop."""

    def reorder(key, pdf_iter, state: GroupState):
        if state.exists:
            ids, ts, seen_max, next_seq = (
                list(state.get[0]), list(state.get[1]),
                state.get[2], state.get[3],
            )
        else:
            ids, ts, seen_max, next_seq = [], [], -(1 << 62), 0
        for pdf in pdf_iter:
            ids.extend(int(x) for x in pdf["event_id"])
            ts.extend(int(x) for x in pdf["micros"])
        if ts:
            seen_max = max(seen_max, max(ts))
        wm = seen_max - delay_us
        order = sorted(range(len(ts)), key=lambda i: (ts[i], ids[i]))
        emit = [i for i in order if ts[i] <= wm]
        hold = [i for i in order if ts[i] > wm]
        out_seq = list(range(next_seq, next_seq + len(emit)))
        state.update((
            [ids[i] for i in hold],
            [ts[i] for i in hold],
            seen_max,
            next_seq + len(emit),
        ))
        yield pd.DataFrame(
            {
                "event_id": [ids[i] for i in emit],
                "user_id": [key[0]] * len(emit),
                "micros": [ts[i] for i in emit],
                "seq": out_seq,
            }
        )

    ev = stream_events(spark, source_dir, max_files_per_trigger)
    x = ev.select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("micros")
    )
    return x.groupBy("user_id").applyInPandasWithState(
        reorder,
        outputStructType=REORDER_OUT_SCHEMA,
        stateStructType=REORDER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_orphan_monitor(
    spark,
    source_dir: str,
    parent_keys: DataFrame,
    watermark: str = "4 hours",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Continuous referential-integrity monitor — the streaming twin
    of `operators/quality.q_referential_integrity` for the live
    ingest path: every micro-batch's events check their user_id
    against the broadcast parent key set (stream-static left join, no
    state) and feed hourly (window, orphan count, total) aggregates —
    the first dashboard a data-contract breach shows up on, hours
    before the nightly batch audit.

    Scale shape: the static side is the distinct parent KEY column
    only (broadcast once, refreshed per restart); the windowed agg
    holds one row of state per open hour."""
    ev = stream_events(spark, source_dir, max_files_per_trigger)
    keys = F.broadcast(
        parent_keys.select(F.col(parent_keys.columns[0]).alias("_pk"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    flagged = ev.join(keys, ev["user_id"] == F.col("_pk"), "left")
    return (
        flagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("_hit").isNull()).cast("long")).alias("n_orphans"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "n_orphans"
        )
    )


def run_substring_novelty_stream(
    spark,
    source_dir: str,
    index_path: str,
    results_path: str,
    checkpoint: str,
):
    """STREAMING corpus novelty over a maintained substring-gram index
    — `dedup_incremental`'s daily-delivery shape as a live pipeline:
    each arriving document batch (1) probes the persisted distinct-
    gram index for its novelty (integer-ppm fraction of the doc's
    distinct grams never seen in EARLIER batches), (2) folds its own
    grams into the index via the crash-safe snapshot swap shared with
    the SCD2 sink (same two-rename atomicity + batch marker).

    Idempotence split: per-batch results land in their own
    `batch=<id>` subdir with mode=overwrite (a replay rewrites the
    identical rows), while the index swap skips replayed batch_ids via
    the snapshot marker — either crash window re-runs to the same
    state. At scale the index is exactly the corpus gram dictionary
    (distinct-reduced, uniform 128-bit keys); the probe is a left
    join of the SMALL batch against it. Novelty is defined against
    PRIOR batches only (within-batch repeats don't flag), matching
    the incremental ingest contract.

    Returns the drained per-doc novelty frame."""
    import os

    from pyspark.sql import functions as F

    from ..operators.dedup import substring_grams

    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def step(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        grams = (
            substring_grams(batch_df)
            .select("doc_id", "h")
            .distinct()
            .localCheckpoint(eager=True)
        )
        snap = current_snapshot(index_path)
        replay = snap is not None and batch_id <= applied_batch(snap)
        if snap is not None:
            idx = spark.read.parquet(snap).withColumn("_seen", F.lit(1))
        else:
            idx = (
                grams.select("h").limit(0).withColumn("_seen", F.lit(1))
            )
        per_doc = (
            grams.join(idx, "h", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(F.col("_seen").isNull().cast("long")).alias("n_novel"),
            )
        )
        out = batch_df.select("doc_id").join(per_doc, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_grams, 0) = 0 THEN 0"
                " ELSE CAST(coalesce(n_novel, 0) AS DECIMAL(38,0))"
                " * 1000000 div n_grams END AS BIGINT)"
            ).alias("novel_ppm"),
        )
        out.write.mode("overwrite").parquet(
            os.path.join(results_path, f"batch={batch_id}")
        )
        if not replay:
            new_index = (
                spark.read.parquet(snap).select("h") if snap is not None
                else grams.select("h").limit(0)
            ).unionAll(grams.select("h")).distinct()
            swap_snapshot(new_index, index_path, batch_id)

    (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(results_path)


def stream_value_histogram(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous per-event-type value histogram — the quantile
    sibling of stream_cms_counters, reusing the identical
    `fixed_hist_cells` transformation (one code path, batch or
    stream). Fixed declared bucket width (a stream can't re-derive
    min/max), cells merge by addition so the streaming aggregation
    state IS the mergeable sketch; drain any snapshot through
    `hist_quantiles_from_cells` for percentiles. Complete output
    mode; no watermark — cells only grow, bounded by the value
    range / FIXED_HIST_W."""
    from ..operators.sketches import fixed_hist_cells
    from .balance_stream import stream_events

    return fixed_hist_cells(
        stream_events(spark, source_dir, max_files_per_trigger)
    )


def stream_benford(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous Benford first-digit counters — live forensic
    screening of the value stream, reusing the identical
    `benford_cells` transformation (one code path, batch or stream).
    Digit counters add across micro-batches, so the streaming
    aggregation state IS the audit's mergeable core (bounded at
    9 * |types| cells); drain any snapshot through
    `benford_from_cells` for the full deviation frame. Complete
    output mode; no watermark — counters only grow."""
    from ..operators.quality import benford_cells
    from .balance_stream import stream_events

    return benford_cells(
        stream_events(spark, source_dir, max_files_per_trigger)
    )


def stream_observed_events(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """The streaming twin of observe_ingest_quality: the SAME
    `observe` expressions attached to the event stream, so every
    micro-batch reports (rows, null ids, non-positive values) in its
    StreamingQueryProgress.observedMetrics — continuous data-quality
    telemetry with no extra pass and no stateful operator."""
    from .balance_stream import stream_events

    ev = stream_events(spark, source_dir, max_files_per_trigger)
    return ev.observe(
        "ingest_quality",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias(
            "null_user_ids"
        ),
        F.sum((F.col("value") <= 0).cast("long")).alias(
            "nonpositive_values"
        ),
    )


TRANS_OUT_SCHEMA = "user_id long, from_type string, to_type string"
TRANS_STATE_SCHEMA = "last_micros long, last_event long, last_type string"


def _transition_state_fn(key, pdf_iter, state: GroupState):
    """Per-user Markov transition emitter: state is the user's LAST
    event (micros, event_id, type); each arriving row emits one
    (from, to) observation against its predecessor — including the
    cross-batch boundary pair, which a stateless per-batch lag would
    silently drop. State is one tuple per user, the minimum possible
    footprint for sequence mining."""
    frames = list(pdf_iter)
    pdf = (pd.concat(frames) if len(frames) > 1 else frames[0]).sort_values(
        ["micros", "event_id"]
    )
    last = state.get if state.exists else None
    out_from, out_to = [], []
    for eid, mic, et in zip(pdf["event_id"], pdf["micros"], pdf["event_type"]):
        if last is not None:
            out_from.append(last[2])
            out_to.append(et)
        last = (int(mic), int(eid), et)
    state.update(last)
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_from),
            "from_type": out_from,
            "to_type": out_to,
        }
    )


def stream_transitions(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous behavior-flow mining — the streaming twin of
    `plans/events_queries.event_transition_matrix`: per-user
    (from_type, to_type) observations emitted as events arrive, with
    the single-row-per-user state carrying the boundary between
    micro-batches (lambda parity over time-ordered input pinned by
    test). Aggregate the emitted pairs with any streaming/ batch
    groupBy to materialize the live matrix; the emission itself never
    shuffles more than the per-user grouping."""
    ev = stream_events(spark, source_dir, max_files_per_trigger)
    x = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("micros"),
    )
    return x.groupBy("user_id").applyInPandasWithState(
        _transition_state_fn,
        outputStructType=TRANS_OUT_SCHEMA,
        stateStructType=TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_hour_cells(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Continuous dayparting counters — the streaming twin of
    events_hour_lift's contingency core, reusing the identical
    `hour_cells` transformation (the cms/benford/histogram pattern:
    streaming aggregation state IS the mergeable cell table, bounded
    at 24 * |types|); drain any snapshot into the lift read-off."""
    from ..plans.events_queries import hour_cells
    from .balance_stream import stream_events

    return hour_cells(
        stream_events(spark, source_dir, max_files_per_trigger)
    )


def run_ivfpq_stream_append(
    spark,
    source_dir: str,
    checkpoint: str,
    codes_path: str,
    max_files_per_trigger: int = 1,
):
    """Streaming maintenance of the persisted IVF-PQ index: each
    micro-batch of NEW vectors (parquet files of (vec_id, embedding)
    appearing in `source_dir`) is ENCODE-ONLY appended under the
    frozen quantizer — the streaming twin of
    `similarity.append_ivfpq_index`, and the arrival path a
    billion-vector deployment actually has (vectors trickle in; the
    quantizer was trained once).

    Exactly-once without an atomic append: each batch lands in its
    own ``batch=<id>/cell=...`` partition pair via DYNAMIC partition
    overwrite, so a crash-replayed batch OVERWRITES ITSELF instead of
    duplicating codes (idempotence pinned by test). Readers drop the
    batch column; the cell partitioning — the probe's pruning key —
    is preserved in the layout.

    Returns the static DataFrame over the maintained code table
    (neighbor_id, cell, codes) after draining with
    ``trigger(availableNow)``."""
    from pyspark.sql import functions as F

    from ..operators.similarity import (
        _ivfpq_encode,
        load_ivfpq_quantizer,
        to_int_vecs,
    )

    coarse, books = load_ivfpq_quantizer(spark)  # frozen, loaded once
    emb = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def step(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        codes = _ivfpq_encode(
            to_int_vecs(batch_df), coarse, books
        ).withColumn("batch", F.lit(int(batch_id)))
        # WRITER-level option, not a session conf: foreachBatch runs
        # each micro-batch on a CLONED session, so setting the conf
        # on the outer session silently does nothing here
        (
            codes.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "cell")
            .parquet(codes_path)
        )

    (
        emb.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(codes_path).select(
        "neighbor_id", "cell", "codes"
    )


RESV_OUT_SCHEMA = (
    "lang string, seq int, rank int, doc_id long, weight int,"
    " priority long"
)
RESV_STATE_SCHEMA = (
    "seq int, prios array<long>, ids array<long>, ws array<int>"
)


def _resv_state_fn(key, pdf_iter, state: GroupState):
    """Per-language A-Res reservoir state: the top-k (priority,
    doc_id, weight) triples seen so far, by (priority desc, doc_id).
    Each micro-batch merges its rows and re-takes the top-k — the
    reservoir MERGE, so state stays <= k triples per key at any
    stream volume. Replays dedupe by doc_id (the priority is a pure
    function of the row, so a replayed doc is byte-identical). Emits
    the full post-batch reservoir stamped with a per-key emission
    `seq` (memory-sink row order across micro-batches is not a
    contract — consumers take the max-seq emission per key)."""
    from ..operators.sampling import RESERVOIR_K

    seq = 0
    cur = {}
    if state.exists:
        seq, prios, ids, ws = state.get
        cur = {int(d): (int(p), int(d), int(w))
               for p, d, w in zip(prios, ids, ws)}
    for pdf in pdf_iter:
        for p, d, w in zip(pdf["priority"], pdf["doc_id"], pdf["weight"]):
            cur[int(d)] = (int(p), int(d), int(w))
    top = sorted(cur.values(), key=lambda t: (-t[0], t[1]))[:RESERVOIR_K]
    seq += 1
    state.update((
        seq,
        [t[0] for t in top],
        [t[1] for t in top],
        [t[2] for t in top],
    ))
    yield pd.DataFrame(
        {
            "lang": [key[0]] * len(top),
            "seq": [seq] * len(top),
            "rank": list(range(1, len(top) + 1)),
            "doc_id": [t[1] for t in top],
            "weight": [t[2] for t in top],
            "priority": [t[0] for t in top],
        }
    )


def stream_weighted_reservoir(
    spark, source_dir: str, max_files_per_trigger: int = 1
):
    """Continuous per-language WEIGHTED reservoir (A-Res) over a
    document stream — the streaming twin of
    `operators/sampling.q_weighted_reservoir_attest`, and the reason
    a reservoir (fixed-size-k, mergeable) is the right weighted
    sampler for arriving data: the stream state is <= k triples per
    stratum forever, and the maintained sample is IDENTICAL to
    re-running the batch operator over everything seen (drain parity
    pinned by test — the reservoir property, exactly).

    The weight and the md5 priority run in Spark EXPRESSIONS before
    the stateful op (codegen, bit-identical to the batch operator);
    Python only merges <= k triples per key per batch."""
    from ..operators.sampling import (
        reservoir_priority_col,
        reservoir_weight_col,
    )

    docs = (
        spark.readStream.schema("doc_id long, lang string, n_chars long")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    w = reservoir_weight_col()
    enriched = docs.select(
        "lang",
        "doc_id",
        w.alias("weight"),
        reservoir_priority_col(w).alias("priority"),
    )
    return enriched.groupBy("lang").applyInPandasWithState(
        _resv_state_fn,
        outputStructType=RESV_OUT_SCHEMA,
        stateStructType=RESV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PACK_OUT_SCHEMA = (
    "lang string, seq int, n_docs long, total_tokens long,"
    " n_packs long, n_split_docs long, fill_ppm long"
)
PACK_STATE_SCHEMA = "seq int, n_docs long, total long, n_split long"


def _pack_state_fn(key, pdf_iter, state: GroupState):
    """Per-language open-pack fill state: (running doc count, running
    token total, boundary-crosser count). The open pack's fill is
    total % PACK_BUDGET — a doc crosses a boundary exactly when the
    fill plus its tokens exceeds the budget, the same predicate the
    batch audit evaluates on pack_offset. Rows are consumed in doc_id
    order within each batch (arrival order across batches is the
    stream's contract), so draining a doc_id-ordered stream
    reproduces the batch scan exactly. Emits the running audit
    stamped with a per-key emission seq (micro-batch row order is not
    a contract — consumers take the max-seq row per key)."""
    from ..operators.packing import PACK_BUDGET

    seq, n_docs, total, n_split = 0, 0, 0, 0
    if state.exists:
        seq, n_docs, total, n_split = state.get
    rows = []
    for pdf in pdf_iter:
        rows.extend(zip(pdf["doc_id"], pdf["n_tokens"]))
    for _d, t in sorted((int(d), int(t)) for d, t in rows):
        if total % PACK_BUDGET + t > PACK_BUDGET:
            n_split += 1
        n_docs += 1
        total += t
    seq += 1
    state.update((seq, n_docs, total, n_split))
    n_packs = -(-total // PACK_BUDGET)
    fill = (
        total * 1_000_000 // (n_packs * PACK_BUDGET) if n_packs else 0
    )
    yield pd.DataFrame(
        {
            "lang": [key[0]],
            "seq": [seq],
            "n_docs": [n_docs],
            "total_tokens": [total],
            "n_packs": [n_packs],
            "n_split_docs": [n_split],
            "fill_ppm": [fill],
        }
    )


def stream_packing_efficiency(
    spark, source_dir: str, max_files_per_trigger: int = 1
):
    """Continuous packing audit over an arriving document stream —
    the streaming twin of `operators/packing.packing_efficiency`
    (the last assembly operator without one): per language, the
    running pack count, capacity fill, and boundary-crosser count as
    documents land. The greedy pack scan folds left-to-right, so its
    audit needs only the OPEN pack's fill per stream — four integers
    of state per language forever, while the batch form re-scans the
    corpus. Token counts run in Spark expressions before the
    stateful op (codegen, bit-identical to the batch audit); Python
    folds pre-counted ints.

    Drain parity (pinned by test): after consuming a doc_id-ordered
    stream, the max-seq row per language equals the batch
    packing_efficiency over the same corpus."""
    from ..functions.text import tokens

    docs = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    enriched = docs.select(
        "lang",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return enriched.groupBy("lang").applyInPandasWithState(
        _pack_state_fn,
        outputStructType=PACK_OUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DD_OUT_SCHEMA = (
    "customerid long, seq int, n_txns long, final_cents long,"
    " peak_cents long, max_drawdown_cents long, drawdown_ppm long"
)
DD_STATE_SCHEMA = (
    "seq int, n_txns long, bal long, peak long, maxdd long"
)


def _drawdown_state_fn(key, pdf_iter, state: GroupState):
    """Per-customer equity-curve state: (running balance, running
    peak, deepest drawdown so far) — three integers reproduce the
    whole-history scan because both the peak and the drawdown are
    running maxima, which fold left-to-right. Rows are consumed in
    (createdat, trans_id) order within each batch; time-ordered
    arrival across batches is the stream's contract (the monthly-
    export pattern). Emits the running audit stamped with a per-key
    emission seq."""
    seq, n_txns, bal, peak, maxdd = 0, 0, 0, 0, 0
    if state.exists:
        seq, n_txns, bal, peak, maxdd = state.get
    rows = []
    for pdf in pdf_iter:
        rows.extend(
            zip(pdf["createdat"], pdf["trans_id"], pdf["delta_cents"])
        )
    for _t, _i, dc in sorted(rows):
        bal += int(dc)
        n_txns += 1
        if bal > peak:
            peak = bal
        if peak - bal > maxdd:
            maxdd = peak - bal
    seq += 1
    state.update((seq, n_txns, bal, peak, maxdd))
    ppm = maxdd * 1_000_000 // peak if peak > 0 else 0
    yield pd.DataFrame(
        {
            "customerid": [key[0]],
            "seq": [seq],
            "n_txns": [n_txns],
            "final_cents": [bal],
            "peak_cents": [peak],
            "max_drawdown_cents": [maxdd],
            "drawdown_ppm": [ppm],
        }
    )


def stream_balance_drawdown(
    spark, source_dir: str, max_files_per_trigger: int = 4
):
    """Continuous max-drawdown monitoring over the transaction
    stream — the streaming twin of plans/finance_queries.
    balance_drawdown: the batch scan's whole-history windows reduce
    to THREE integers of state per customer (balance, peak, deepest
    fall), because running maxima fold left-to-right. The cent
    deltas run in Spark expressions before the stateful op
    (codegen, bit-identical to the batch rollup); Python folds
    pre-computed ints. Drain parity pinned by test: after a
    time-ordered drain, the max-seq row per customer equals the
    batch drawdown over everything seen."""
    from ..plans.finance_queries import delta_cents_col

    txns = stream_transactions(spark, source_dir, max_files_per_trigger)
    enriched = txns.select(
        "customerid",
        "createdat",
        "trans_id",
        delta_cents_col().alias("delta_cents"),
    )
    return enriched.groupBy("customerid").applyInPandasWithState(
        _drawdown_state_fn,
        outputStructType=DD_OUT_SCHEMA,
        stateStructType=DD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


VOL_OUT_SCHEMA = (
    "customerid long, seq int, n_days long, net_cents long,"
    " flow_var_cents2 long"
)
VOL_STATE_SCHEMA = (
    "seq int, n_closed long, s_closed long, ss_closed long,"
    " open_day string, open_flow long"
)


def _volatility_state_fn(key, pdf_iter, state: GroupState):
    """Per-customer daily-flow moment state: closed-day count / sum /
    sum-of-squares plus the OPEN day's date and running flow — six
    scalars reproduce the batch variance because population moments
    fold left-to-right once the day boundary is known, and only the
    newest day can still grow under time-ordered arrival. Rows are
    consumed in (createdat, trans_id) order within each batch;
    time-ordered arrival across batches is the stream's contract
    (the drawdown twin's convention — day cells, unlike set-valued
    twins, are order-SENSITIVE: an out-of-order day would open a
    second cell for a date the batch rollup counts once). ss_closed
    is a BIGINT: it bounds the per-customer lifetime at ~9e18
    cents^2 (≈ a century of 1e8-cent daily swings) — the state
    schema's honest limit, vs the batch side's DECIMAL(38,0)."""
    seq, n_c, s_c, ss_c, open_day, open_flow = 0, 0, 0, 0, "", 0
    if state.exists:
        seq, n_c, s_c, ss_c, open_day, open_flow = state.get
    rows = []
    for pdf in pdf_iter:
        rows.extend(
            zip(pdf["createdat"], pdf["trans_id"], pdf["d"], pdf["dc"])
        )
    for _t, _i, d, dc in sorted(rows):
        if d != open_day:
            if open_day:
                n_c += 1
                s_c += open_flow
                ss_c += open_flow * open_flow
            open_day, open_flow = d, 0
        open_flow += int(dc)
    seq += 1
    state.update((seq, n_c, s_c, ss_c, open_day, open_flow))
    n = n_c + (1 if open_day else 0)
    net = s_c + open_flow
    ss = ss_c + open_flow * open_flow
    # n*ss - net^2 >= 0 (Cauchy-Schwarz), so Python floor-div equals
    # the batch side's truncating `div` / DuckDB `//`
    var = (n * ss - net * net) // (n * n) if n > 0 else 0
    yield pd.DataFrame(
        {
            "customerid": [key[0]],
            "seq": [seq],
            "n_days": [n],
            "net_cents": [net],
            "flow_var_cents2": [var],
        }
    )


def stream_balance_volatility(
    spark, source_dir: str, max_files_per_trigger: int = 4
):
    """Continuous daily-flow volatility monitoring over the
    transaction stream — the streaming twin of
    plans/finance_queries.balance_volatility: the batch scan's
    daily-cell + per-customer moment rollups reduce to six scalars
    of state per customer (closed-day moments + the open day), so
    the risk trio (drawdown depth, TWAB level, flow variance) is now
    fully streamable. Dates and cent deltas run in Spark expressions
    before the stateful op (codegen, bit-identical to the batch
    rollup); Python folds pre-computed ints. Drain parity pinned by
    test: after a time-ordered drain, the max-seq row per customer
    equals the batch volatility over everything seen."""
    from ..plans.finance_queries import delta_cents_col

    txns = stream_transactions(spark, source_dir, max_files_per_trigger)
    enriched = txns.select(
        "customerid",
        "createdat",
        "trans_id",
        F.to_date("createdat").cast("string").alias("d"),
        delta_cents_col().alias("dc"),
    )
    return enriched.groupBy("customerid").applyInPandasWithState(
        _volatility_state_fn,
        outputStructType=VOL_OUT_SCHEMA,
        stateStructType=VOL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LEAK_OUT_SCHEMA = "split_a string, split_b string, seq int, n_pairs long"
LEAK_STATE_SCHEMA = "seq int, n long"


def _leak_state_fn(key, pdf_iter, state: GroupState):
    """Per-(split_a, split_b) leakage counter. State is TWO integers
    forever — the bounded probe state the batch audit's pair relation
    collapses to once the corpus side is a static index. A verified
    pair reaches exactly one micro-batch (its stream doc arrives
    once), so the cross-band duplicate collapse is a within-batch
    set, never state."""
    seq, n = 0, 0
    if state.exists:
        seq, n = state.get
    seen = set()
    for pdf in pdf_iter:
        for d1, d2 in zip(pdf["doc_id_1"], pdf["doc_id_2"]):
            seen.add((int(d1), int(d2)))
    n += len(seen)
    seq += 1
    state.update((seq, n))
    yield pd.DataFrame(
        {
            "split_a": [key[0]],
            "split_b": [key[1]],
            "seq": [seq],
            "n_pairs": [n],
        }
    )


def stream_split_leakage(
    spark, source_dir: str, sf_dir: str, max_files_per_trigger: int = 1
):
    """Continuous train/val/test leakage monitoring — the streaming
    twin of `operators/sampling.split_leakage_audit`: every arriving
    document is MinHash-banded ROW-LOCALLY (dedup.
    minhash_bands_row_local — no streaming aggregation), probes the
    STATIC corpus band index for candidates, exact-Jaccard-verifies
    them, labels both sides with the same pure-hash split_column the
    batch audit uses (a pure expression — no label stream needed),
    and folds verified pairs into two integers of state per
    split-pair cell.

    Pair-once contract: only (index doc < arriving doc) candidates
    are kept, so each unordered pair is counted exactly once — when
    its later member arrives — matching the batch pair relation
    regardless of arrival order. At 100 TB the static side is the
    maintained bucketed band index (build_minhash_band_index) and
    the verify's shingle arrays are a semi-join fetch against the
    document store; here both are materialized once per run
    (localCheckpoint) from the same documents table."""
    from ..operators.dedup import (
        JACCARD_DEN,
        JACCARD_NUM,
        _docs,
        _shingle_rows,
        minhash_bands_for,
        minhash_bands_row_local,
    )
    from ..operators.sampling import split_column

    corpus = _docs(spark, sf_dir)
    idx = (
        minhash_bands_for(corpus)
        .select(F.col("doc_id").alias("doc_id_2"), "band", "key")
        .localCheckpoint(eager=True)
    )
    arrs = (
        _shingle_rows(corpus)
        .groupBy("doc_id")
        .agg(
            F.collect_list("sh").alias("shs2"),
            F.count(F.lit(1)).cast("long").alias("shingles_2"),
        )
        .select(F.col("doc_id").alias("doc_id_2"), "shs2", "shingles_2")
        .localCheckpoint(eager=True)
    )
    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    bn = minhash_bands_row_local(docs).select(
        F.col("doc_id").alias("doc_id_1"),
        F.col("shs").alias("shs1"),
        F.col("n_shingles").alias("shingles_1"),
        "band",
        "key",
    )
    cand = bn.join(idx, ["band", "key"]).filter(
        F.col("doc_id_2") < F.col("doc_id_1")
    )
    common = F.size(
        F.array_intersect(F.col("shs1"), F.col("shs2"))
    ).cast("long")
    verified = (
        cand.join(arrs, "doc_id_2")
        .withColumn("common_shingles", common)
        .filter(
            JACCARD_DEN * F.col("common_shingles")
            >= JACCARD_NUM
            * (
                F.col("shingles_1")
                + F.col("shingles_2")
                - F.col("common_shingles")
            )
        )
    )
    sa = split_column(F.col("doc_id_1"))
    sb = split_column(F.col("doc_id_2"))
    labeled = verified.select(
        "doc_id_1",
        "doc_id_2",
        F.least(sa, sb).alias("split_a"),
        F.greatest(sa, sb).alias("split_b"),
    )
    return labeled.groupBy("split_a", "split_b").applyInPandasWithState(
        _leak_state_fn,
        outputStructType=LEAK_OUT_SCHEMA,
        stateStructType=LEAK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MIG_OUT_SCHEMA = (
    "customerid long, seq int, closed_day string,"
    " from_bucket string, to_bucket string"
)
MIG_STATE_SCHEMA = (
    "seq int, bal long, open_day string, open_net long,"
    " last_bucket string"
)


def _migration_state_fn(key, pdf_iter, state: GroupState):
    """Per-customer bucket-migration state: the whole daily balance
    history reduces to FIVE fields — balance through the last CLOSED
    day, that day's bucket, and the open day's accumulated net — 
    because a day's bucket is only known once a later day arrives
    (the batch computes period-END balances). Each transition is
    emitted exactly once, when its destination day closes. Rows are
    consumed in (createdat, trans_id) order within a batch;
    time-ordered arrival across batches is the stream's contract
    (the drawdown twin's monthly-export pattern)."""
    from ..plans.finance_queries import bucket_of_cents

    seq, bal, open_day, open_net, last_bucket = 0, 0, "", 0, ""
    if state.exists:
        seq, bal, open_day, open_net, last_bucket = state.get
    rows = []
    for pdf in pdf_iter:
        rows.extend(
            zip(pdf["createdat"], pdf["trans_id"], pdf["delta_cents"])
        )
    out = []
    for ts, _i, dc in sorted(rows):
        day = str(ts)[:10]
        if open_day and day != open_day:
            # the open day just closed: its end-of-day balance is
            # known, so its bucket — and the transition into it —
            # are now final
            bal += open_net
            b = bucket_of_cents(bal)
            if last_bucket:
                out.append((open_day, last_bucket, b))
            last_bucket = b
            open_net = 0
        open_day = day
        open_net += int(dc)
    seq += 1
    state.update((seq, bal, open_day, open_net, last_bucket))
    if out:
        yield pd.DataFrame(
            {
                "customerid": [key[0]] * len(out),
                "seq": [seq] * len(out),
                "closed_day": [d for d, _f, _t in out],
                "from_bucket": [f for _d, f, _t in out],
                "to_bucket": [t for _d, _f, t in out],
            }
        )


def stream_bucket_migration(
    spark, source_dir: str, max_files_per_trigger: int = 4
):
    """Continuous balance-bucket migration over the transaction
    stream — the streaming twin of plans/finance_queries.
    balance_bucket_migration: transitions stream out as their
    destination day CLOSES (a later day arrives for the customer),
    each exactly once, so the drained transition log aggregates to
    the batch matrix over all CLOSED days (the final open day per
    customer is not yet decidable — the drain-parity test accounts
    for exactly that row). Cent deltas run in Spark expressions
    before the stateful op; Python folds pre-computed ints over five
    fields of state per customer forever."""
    from ..plans.finance_queries import delta_cents_col

    txns = stream_transactions(spark, source_dir, max_files_per_trigger)
    enriched = txns.select(
        "customerid",
        "createdat",
        "trans_id",
        delta_cents_col().alias("delta_cents"),
    )
    return enriched.groupBy("customerid").applyInPandasWithState(
        _migration_state_fn,
        outputStructType=MIG_OUT_SCHEMA,
        stateStructType=MIG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QSD_OUT_SCHEMA = (
    "split string, quality_bucket string, seq int, n_docs long,"
    " share_ppm long"
)
QSD_STATE_SCHEMA = "seq int, n_low long, n_med long, n_high long"


def _qsd_state_fn(key, pdf_iter, state: GroupState):
    """Per-split quality-mix state: three counters forever. Shares
    are computable at emission because the group key IS the split —
    the denominator lives inside the group."""
    seq, n_low, n_med, n_high = 0, 0, 0, 0
    if state.exists:
        seq, n_low, n_med, n_high = state.get
    for pdf in pdf_iter:
        vc = pdf["quality_bucket"].value_counts()
        n_low += int(vc.get("low", 0))
        n_med += int(vc.get("medium", 0))
        n_high += int(vc.get("high", 0))
    seq += 1
    state.update((seq, n_low, n_med, n_high))
    total = n_low + n_med + n_high
    rows = [
        (b, n)
        for b, n in (("low", n_low), ("medium", n_med), ("high", n_high))
        if n > 0
    ]
    if rows:
        yield pd.DataFrame(
            {
                "split": [key[0]] * len(rows),
                "quality_bucket": [b for b, _ in rows],
                "seq": [seq] * len(rows),
                "n_docs": [n for _, n in rows],
                "share_ppm": [n * 1_000_000 // total for _, n in rows],
            }
        )


def stream_quality_split_drift(
    spark, source_dir: str, max_files_per_trigger: int = 1
):
    """Continuous quality-mix-per-split monitoring — the streaming
    twin of `operators/sampling.quality_split_drift`: each arriving
    document is bucketed by the SAME quality_bucket_col expression
    the registered scorer uses and split by the same pure-hash
    split_column, then folded into three integers of state per
    split. Shares are exact at every emission (the split is the
    group key, so the denominator is in-state). Drain parity pinned:
    the max-seq rows equal the batch audit over everything seen."""
    from ..operators.sampling import split_column
    from ..operators.textops import quality_bucket_col

    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    enriched = docs.select(
        split_column(F.col("doc_id")).alias("split"),
        quality_bucket_col(F.col("text")).alias("quality_bucket"),
    )
    return enriched.groupBy("split").applyInPandasWithState(
        _qsd_state_fn,
        outputStructType=QSD_OUT_SCHEMA,
        stateStructType=QSD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KEEP_OUT_SCHEMA = (
    "content_hash string, seq int, doc_id long, lang string,"
    " source string, n_copies long"
)
KEEP_STATE_SCHEMA = (
    "seq int, prio long, n_chars_raw long, doc_id long, lang string,"
    " source string, n_copies long"
)


def _keep_priority_state_fn(key, pdf_iter, state: GroupState):
    """Per-content-hash streaming argmin: the batch window's
    (prio, n_chars_raw, doc_id) ordering folds left-to-right, so the
    state is ONE candidate row + a copy counter per group — emitted
    with a seq so drain parity reads the max-seq row."""
    seq, best, n = 0, None, 0
    if state.exists:
        seq, p, nc, did, lang, src, n = state.get
        best = (int(p), int(nc), int(did), lang, src)
    for pdf in pdf_iter:
        for p, nc, did, lang, src in zip(
            pdf["prio"], pdf["n_chars_raw"], pdf["doc_id"],
            pdf["lang"], pdf["source"],
        ):
            n += 1
            cand = (int(p), int(nc), int(did), str(lang), str(src))
            if best is None or cand[:3] < best[:3]:
                best = cand
    seq += 1
    state.update((seq, best[0], best[1], best[2], best[3], best[4], n))
    yield pd.DataFrame(
        {
            "content_hash": [key[0]],
            "seq": [seq],
            "doc_id": [best[2]],
            "lang": [best[3]],
            "source": [best[4]],
            "n_copies": [n],
        }
    )


def stream_keep_priority(
    spark, source_dir: str, max_files_per_trigger: int = 1
):
    """Continuous source-priority canonicalization — the streaming
    twin of operators/dedup.dedup_keep_priority: every arriving
    document hashes its normalized text in a Spark expression
    (codegen, bit-identical to the batch hash), and the per-group
    state is the single best (trust rank, raw length, doc_id)
    candidate plus a copy counter — a streaming argmin, the smallest
    possible dedup state. Arrival order cannot change the fixpoint
    (min is order-free), so drain parity holds for ANY file order —
    unlike first-arrival dedup (stream_dedup_content), this twin
    converges to the batch CHOICE, not just the batch key set."""
    from ..functions.text import normalize
    from ..operators.dedup import _SRC_PRIO

    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    enriched = docs.select(
        "doc_id",
        "lang",
        "source",
        F.expr(_SRC_PRIO).alias("prio"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.md5(normalize(F.col("text"))).alias("content_hash"),
    )
    return enriched.groupBy("content_hash").applyInPandasWithState(
        _keep_priority_state_fn,
        outputStructType=KEEP_OUT_SCHEMA,
        stateStructType=KEEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


VEL_OUT_SCHEMA = (
    "trans_id long, customerid long, es long, n_1h long,"
    " spent_1h_cents long, n_24h long"
)
VEL_STATE_SCHEMA = "es array<long>, dc array<long>"


def _velocity_flags_state_fn(key, pdf_iter, state: GroupState):
    """Per-customer trailing-window state: the (es, dc) events of the
    last 24 hours RELATIVE TO THE NEWEST EVENT SEEN — everything
    older can never enter a future backward-looking frame of a
    time-ordered stream, so the state is bounded by the customer's
    busiest day, not by history. Emits exactly the batch screen's
    flagged rows when events arrive time-ordered (the range frames
    only look backward)."""
    from ..plans.finance_queries import (
        VEL_DAY_S,
        VEL_HOUR_S,
        VEL_MIN_DAY,
        VEL_RATE_NUM,
    )

    hist: list[tuple[int, int]] = []
    if state.exists:
        es_arr, dc_arr = state.get
        hist = [(int(e), int(x)) for e, x in zip(es_arr, dc_arr)]
    rows = []
    for pdf in pdf_iter:
        for t, e, x in zip(pdf["trans_id"], pdf["es"], pdf["dc"]):
            rows.append((int(e), int(t), int(x)))
    rows.sort()  # within-batch time order
    # the WHOLE batch joins the history BEFORE any row is scored:
    # a batch range frame includes every row of the current row's
    # equal-es TIE GROUP (even ones "later" in arrival order), so
    # same-second ties that share a micro-batch must see each other
    # — the he <= e guard still excludes genuinely later events
    hist.extend((e, x) for e, _t, x in rows)
    out = {
        "trans_id": [], "customerid": [], "es": [], "n_1h": [],
        "spent_1h_cents": [], "n_24h": [],
    }
    for e, t, _x in rows:
        n1 = n24 = 0
        sp1 = 0
        for he, hx in hist:
            if e - VEL_DAY_S <= he <= e:
                n24 += 1
                if e - VEL_HOUR_S <= he:
                    n1 += 1
                    if hx < 0:
                        sp1 += -hx
        if VEL_RATE_NUM * n1 >= n24 and n24 >= VEL_MIN_DAY:
            out["trans_id"].append(t)
            out["customerid"].append(int(key[0]))
            out["es"].append(e)
            out["n_1h"].append(n1)
            out["spent_1h_cents"].append(sp1)
            out["n_24h"].append(n24)
    newest = max(e for e, _x in hist)
    hist = [(e, x) for e, x in hist if e >= newest - VEL_DAY_S]
    state.update(([e for e, _x in hist], [x for _e, x in hist]))
    yield pd.DataFrame(out)


def stream_velocity_flags(
    spark, source_dir: str, max_files_per_trigger: int = 1
):
    """Continuous transaction-velocity screening — the streaming twin
    of plans/finance_queries.txn_velocity_flags: epoch seconds and
    cent deltas run in Spark expressions (bit-identical to the batch
    projection); per customer the state is the trailing 24 hours of
    (es, dc) pairs relative to the newest event (bounded by the
    busiest day). On a time-ordered drain where equal-second tie
    groups arrive within ONE micro-batch, the emitted flag rows
    equal the batch screen EXACTLY — backward-looking frames never
    need strictly-future events, but the batch RANGE frame includes
    all same-es peers, so a row emitted before a same-second tie
    arrives in a later file would undercount n_1h/n_24h. The parity
    test guarantees the precondition by splitting files on day
    boundaries (ties share a file)."""
    from ..plans.finance_queries import delta_cents_col

    txns = stream_transactions(spark, source_dir, max_files_per_trigger)
    enriched = txns.select(
        "customerid",
        "trans_id",
        F.unix_timestamp("createdat").alias("es"),
        delta_cents_col().alias("dc"),
    )
    return enriched.groupBy("customerid").applyInPandasWithState(
        _velocity_flags_state_fn,
        outputStructType=VEL_OUT_SCHEMA,
        stateStructType=VEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
