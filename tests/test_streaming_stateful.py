"""Lambda-parity for the custom stateful streaming operators: the
streaming result over time-ordered micro-batches must equal the batch
computation on the union of all batches."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.operators.fifo import fifo_match
from thrivefinancedatapipeline_spark.sources.ingest import transactions_from_events
from thrivefinancedatapipeline_spark.streaming import stateful


@pytest.fixture(scope="module")
def timed_events(spark, sf_dir):
    """sf0.001 events split into 6 time-ordered parquet files — the
    monthly-export arrival pattern the reference assumes."""
    tmp = tempfile.mkdtemp(prefix="stream_timed_")
    ev = load_table(spark, sf_dir, "events")
    bounds = [1, 6, 11, 16, 21, 26, 32]
    for i in range(6):
        (
            ev.filter(
                (F.dayofmonth("ts") >= bounds[i])
                & (F.dayofmonth("ts") < bounds[i + 1])
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(tmp)
        )
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def drain(stream_df, name, mode):
    chk = tempfile.mkdtemp(prefix="chk_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = stream_df.sparkSession.table(name).collect()
    shutil.rmtree(chk, ignore_errors=True)
    return out


def test_stream_fifo_matches_batch(spark, timed_events):
    got = drain(
        stateful.stream_fifo_match(spark, timed_events, max_files_per_trigger=1),
        "stream_fifo",
        "append",
    )
    stream_pairs = {(r.customerid, r.trans_id, r.redeemid) for r in got}
    batch = fifo_match(
        transactions_from_events(spark.read.parquet(timed_events))
    ).filter(F.col("redeemid").isNotNull())
    batch_pairs = {
        (r.customerid, r.trans_id, r.redeemid) for r in batch.collect()
    }
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0


def test_stream_fifo_emits_each_match_once(spark, timed_events):
    got = drain(
        stateful.stream_fifo_match(spark, timed_events, max_files_per_trigger=1),
        "stream_fifo_once",
        "append",
    )
    earned_ids = [r.trans_id for r in got]
    redeem_ids = [r.redeemid for r in got]
    assert len(earned_ids) == len(set(earned_ids))
    assert len(redeem_ids) == len(set(redeem_ids))


def test_stream_dedup_drops_replayed_batch(spark, timed_events):
    # replay one batch file into a copy of the source (at-least-once)
    tmp = tempfile.mkdtemp(prefix="stream_dup_")
    try:
        ev = spark.read.parquet(timed_events)
        ev.coalesce(2).write.mode("append").parquet(tmp)
        ev.filter(F.dayofmonth("ts") < 6).coalesce(1).write.mode("append").parquet(tmp)
        got = drain(stateful.stream_dedup(spark, tmp), "stream_dedup", "append")
        assert len(got) == ev.count()
        ids = [r.event_id for r in got]
        assert len(ids) == len(set(ids))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_static_enrichment_matches_batch_join(spark, sf_dir, timed_events):
    from thrivefinancedatapipeline_spark.datamodel import load_table

    cust = load_table(spark, sf_dir, "customer")
    got = drain(
        stateful.stream_enriched_events(spark, timed_events, cust),
        "stream_enrich",
        "append",
    )
    ev = spark.read.parquet(timed_events)
    batch = ev.join(
        cust.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "user_id",
        "left",
    )
    assert len(got) == batch.count()
    got_seg = {(r.event_id, r.segment) for r in got}
    want_seg = {(r.event_id, r.segment) for r in batch.collect()}
    assert got_seg == want_seg


def test_stream_stream_interval_join_matches_batch(spark, timed_events):
    got = drain(
        stateful.stream_purchase_attribution(spark, timed_events),
        "stream_attr",
        "append",
    )
    stream_pairs = {(r.purchase_id, r.touch_id) for r in got}
    ev = spark.read.parquet(timed_events)
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("touch_ts") < F.col("purchase_ts"))
        & (F.col("touch_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    batch_pairs = {(r.purchase_id, r.touch_id) for r in batch.collect()}
    # inner interval join emits matches as both sides arrive; with
    # time-ordered input every batch match is eventually emitted
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0


def test_stream_sliding_windows_match_batch(spark, timed_events):
    got = drain(
        stateful.stream_sliding_counts(spark, timed_events),
        "stream_sliding",
        "append",
    )
    stream_rows = {
        (r.window_start, r.event_type): r.n_events for r in got
    }
    ev = spark.read.parquet(timed_events)
    batch = (
        ev.groupBy(F.window("ts", "4 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 4 HOURS")).alias("wm")
    ).collect()[0].wm
    batch_rows = {
        (r.window_start, r.event_type): r.n_events
        for r in batch.collect()
        # append mode only emits windows fully below the final watermark
        if r.window_start + __import__("datetime").timedelta(hours=4) <= wm
    }
    missing = set(batch_rows) - set(stream_rows)
    assert not missing
    for k in batch_rows:
        assert stream_rows[k] == batch_rows[k]
    assert len(batch_rows) > 0


def test_stream_sessionize_matches_batch_session_window(spark, timed_events):
    got = drain(
        stateful.stream_sessionize(spark, timed_events), "stream_sess", "append"
    )
    stream_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in got
    }
    ev = spark.read.parquet(timed_events)
    batch = (
        ev.groupBy(
            F.session_window(
                "ts", f"{stateful.SESSION_GAP_MIN} minutes"
            ).alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    # append mode only finalizes sessions the watermark has passed;
    # sessions inside the final 2h horizon stay in state forever in an
    # availableNow drain — exclude them from the batch expectation
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    ).collect()[0].wm
    batch_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
        if r.session_end < wm
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_fifo_v2_transformwithstate_matches_batch(spark, timed_events):
    """The state-v2 (transformWithState) FIFO matcher produces the
    identical match set; runs on the RocksDB state-store provider."""
    if not stateful.HAS_TWS:
        pytest.skip("transformWithState needs Spark 4+ and google.protobuf")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = drain(
            stateful.stream_fifo_match_v2(
                spark, timed_events, max_files_per_trigger=1
            ),
            "stream_fifo_v2",
            "append",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    stream_pairs = {(r.customerid, r.trans_id, r.redeemid) for r in got}
    batch = fifo_match(
        transactions_from_events(
            spark.read.parquet(timed_events)
        )
    )
    batch_pairs = {
        (r.customerid, r.trans_id, r.redeemid)
        for r in batch.filter(F.col("redeemid").isNotNull()).collect()
    }
    assert stream_pairs == batch_pairs


def test_stream_content_dedup_matches_batch_key_set(spark, timed_events):
    got = drain(
        stateful.stream_dedup_content(spark, timed_events),
        "stream_content_dedup",
        "append",
    )
    stream_keys = {
        (r.hour, r.user_id, r.event_type, r.cents) for r in got
    }
    assert len(got) == len(stream_keys), "stream emitted a duplicate key"
    ev = spark.read.parquet(timed_events)
    batch_keys = {
        (r.hour, r.user_id, r.event_type, r.cents)
        for r in ev.select(
            F.date_trunc("hour", "ts").alias("hour"),
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        ).distinct().collect()
    }
    assert stream_keys == batch_keys


def test_stream_ewma_matches_batch(spark, timed_events):
    """Lambda parity: the stateful streaming EWMA over time-ordered
    micro-batches equals the batch window fold, row for row (exact
    integer numerator/denominator — no float tolerance needed)."""
    from thrivefinancedatapipeline_spark.plans.events_queries import ewma_smooth

    got = drain(
        stateful.stream_ewma(spark, timed_events, max_files_per_trigger=1),
        "stream_ewma",
        "append",
    )
    stream_rows = {
        (r.event_id, r.event_type, r.micros, r.ewma_num, r.ewma_den)
        for r in got
    }
    batch = ewma_smooth(spark.read.parquet(timed_events))
    batch_rows = {
        (r.event_id, r.event_type, r.micros, r.ewma_num, r.ewma_den)
        for r in batch.collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0
    # every row past warm-up carries the full weight mass 2^K - 1
    full = [r for r in got if r.ewma_den == 255]
    assert len(full) > len(got) // 2


def test_stream_kmv_matches_batch_sketch(spark, timed_events):
    """Drain parity for the custom mergeable state: the final streamed
    KMV per event type equals the batch sketch over the unioned
    batches (k smallest distinct user hashes → same k-th min)."""
    from pyspark.sql import Window

    from thrivefinancedatapipeline_spark.functions.text import md5_long
    from thrivefinancedatapipeline_spark.operators.sketches import KMV_K

    got = drain(
        stateful.stream_kmv_distinct(
            spark, timed_events, max_files_per_trigger=1
        ),
        "stream_kmv",
        "append",
    )
    # the sketch is monotone (n only grows, k-th min only shrinks), so
    # the final snapshot per key is (max n, min kth) — no reliance on
    # memory-sink row order across micro-batches
    final = {}
    for r in got:
        n, k = final.get(r.event_type, (0, 1 << 62))
        final[r.event_type] = (max(n, r.n_sketch), min(k, r.kth_min_hash))

    ev = spark.read.parquet(timed_events)
    d = ev.select(
        "event_type", md5_long(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    batch = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    )
    expect = {r.event_type: (r.n, r.kth) for r in batch.collect()}
    assert final == expect
    assert len(final) > 0


def test_stream_scd2_upsert_equals_full_rebuild(spark, timed_events):
    """The foreachBatch CDC sink applied batch-by-batch must land on
    the same dimension as one full SCD2 build over all the data."""
    from thrivefinancedatapipeline_spark.operators.balance import (
        balance_scd2,
    )

    dim = tempfile.mkdtemp(prefix="scd2_dim_") + "/dim"
    chk = tempfile.mkdtemp(prefix="chk_scd2_")
    try:
        got = stateful.run_scd2_upsert(spark, timed_events, dim, chk)
        stream_rows = {
            (
                r.customer_id,
                round(r.balance, 2),
                r.effective_from,
                r.transaction_id,
                r.effective_to,
                r.is_current,
            )
            for r in got.collect()
        }
        full = balance_scd2(
            transactions_from_events(spark.read.parquet(timed_events))
        )
        full_rows = {
            (
                r.customer_id,
                round(r.balance, 2),
                r.effective_from,
                r.transaction_id,
                r.effective_to,
                r.is_current,
            )
            for r in full.collect()
        }
        assert stream_rows == full_rows
        assert len(stream_rows) > 0
    finally:
        shutil.rmtree(os.path.dirname(dim), ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


@pytest.fixture(scope="module")
def shuffled_events(spark, sf_dir):
    """sf0.001 events split into 6 rank-balanced batches with each row
    possibly deferred ONE batch (md5 jitter) — bounded cross-batch
    disorder, the at-least-once/out-of-order arrival pattern."""
    import hashlib

    tmp = tempfile.mkdtemp(prefix="stream_shuffled_")
    ev = load_table(spark, sf_dir, "events")
    rows = sorted(ev.collect(), key=lambda r: (r.ts, r.event_id))
    n_batches = 6
    chunk = (len(rows) + n_batches - 1) // n_batches
    batches = [[] for _ in range(n_batches)]
    for rank, r in enumerate(rows):
        b = rank // chunk
        jitter = hashlib.md5(str(r.event_id).encode()).digest()[0] & 1
        batches[min(b + jitter, n_batches - 1)].append(r)
    for batch in batches:
        spark.createDataFrame(batch, ev.schema).coalesce(1).write.mode(
            "append"
        ).parquet(tmp)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_reorder_releases_in_order(spark, shuffled_events):
    """On input with bounded cross-batch disorder, the reorder buffer
    must emit every row below each key's final watermark, in exact
    (ts, event_id) order (checked via the emission seq)."""
    delay_us = 6 * 24 * 3_600_000_000  # > one batch span of disorder
    got = drain(
        stateful.stream_reorder(spark, shuffled_events, delay_us=delay_us),
        "stream_reorder",
        "append",
    )
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append((r.seq, r.micros, r.event_id))

    ev = spark.read.parquet(shuffled_events)
    want = {}
    for r in ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("micros")
    ).collect():
        want.setdefault(r.user_id, []).append((r.micros, r.event_id))

    assert len(by_user) > 0
    emitted_total = 0
    for user, rows in want.items():
        horizon = max(m for m, _ in rows) - delay_us
        expect = sorted((m, e) for m, e in rows if m <= horizon)
        gotten = sorted(by_user.get(user, []))  # by seq
        assert [(m, e) for _, m, e in gotten] == expect, f"user {user}"
        # seqs are dense from 0 — nothing emitted twice or skipped
        assert [s for s, _, _ in gotten] == list(range(len(expect)))
        emitted_total += len(expect)
    assert emitted_total > 0


def test_reorder_fronted_fifo_matches_batch(spark, shuffled_events):
    """Two-stage pipeline on OUT-OF-ORDER input: reorder buffer →
    ordered log → stateful FIFO matcher. The matcher's time-ordered
    arrival contract is satisfied by the buffer, so its matches must
    equal the batch FIFO over exactly the emitted (below-horizon)
    events — the end-to-end proof the buffer removes the contract."""
    delay_us = 6 * 24 * 3_600_000_000
    ordered = drain(
        stateful.stream_reorder(spark, shuffled_events, delay_us=delay_us),
        "stream_reorder_log",
        "append",
    )
    # rebuild full ordered event rows (the log carries ids + seq)
    ev = spark.read.parquet(shuffled_events)
    by_id = {r.event_id: r for r in ev.collect()}
    rows = sorted(ordered, key=lambda r: (r.user_id, r.seq))
    log_dir = tempfile.mkdtemp(prefix="ordered_log_")
    try:
        # one file per seq-slice: per-user order survives because seq
        # is dense per user and slices are taken in seq order
        max_seq = max(r.seq for r in rows)
        n_files = 4
        step = (max_seq + n_files) // n_files
        for k in range(n_files):
            slice_rows = [
                by_id[r.event_id]
                for r in rows
                if k * step <= r.seq < (k + 1) * step
            ]
            if slice_rows:
                spark.createDataFrame(slice_rows, ev.schema).coalesce(
                    1
                ).write.mode("append").parquet(log_dir)
        got = drain(
            stateful.stream_fifo_match(
                spark, log_dir, max_files_per_trigger=1
            ),
            "stream_fifo_ordered",
            "append",
        )
        stream_pairs = {(r.customerid, r.trans_id, r.redeemid) for r in got}
        batch = fifo_match(
            transactions_from_events(spark.read.parquet(log_dir))
        ).filter(F.col("redeemid").isNotNull())
        batch_pairs = {
            (r.customerid, r.trans_id, r.redeemid) for r in batch.collect()
        }
        assert stream_pairs == batch_pairs
        assert len(stream_pairs) > 0
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


def test_stream_scd2_upsert_crash_between_renames_recovers(
    spark, timed_events
):
    """Atomic-swap recovery: kill the sink at the worst moment — the
    live dimension renamed aside (__old) but the new snapshot never
    promoted — then restart with the SAME checkpoint and more data.
    The restarted sink must read prev from __old, replay the
    uncommitted batch, and land on exactly the full-rebuild dimension
    with no leftover __old/__tmp dirs."""
    import glob as globmod

    from thrivefinancedatapipeline_spark.operators.balance import (
        balance_scd2,
    )

    files = globmod.glob(timed_events + "/part-*")
    # feed files in event-time order (the increment contract)
    files.sort(
        key=lambda p: spark.read.parquet(p).agg(F.min("ts")).collect()[0][0]
    )
    assert len(files) == 6
    src = tempfile.mkdtemp(prefix="scd2_src_")
    dimroot = tempfile.mkdtemp(prefix="scd2_dim_crash_")
    dim = dimroot + "/dim"
    chk = tempfile.mkdtemp(prefix="chk_scd2_crash_")
    try:
        import time as _t

        for f in files[:4]:
            shutil.copy(f, src)
            _t.sleep(0.05)  # keep source mtime order == event order
        stateful.run_scd2_upsert(spark, src, dim, chk)
        # replay window: a batch re-runs against a dimension that
        # already contains it (promote landed, commit-log write lost —
        # or, as simulated here, the whole checkpoint is lost and
        # every batch replays). scd2_apply_increment is not
        # idempotent, so only the _applied_batch marker keeps the
        # re-application a no-op.
        before = {tuple(r) for r in spark.read.parquet(dim).collect()}
        chk_lost = tempfile.mkdtemp(prefix="chk_scd2_lost_")
        stateful.run_scd2_upsert(spark, src, dim, chk_lost)
        shutil.rmtree(chk_lost, ignore_errors=True)
        assert {tuple(r) for r in spark.read.parquet(dim).collect()} == before
        # simulate the crash window: live dir moved aside, tmp lost
        os.replace(dim, dim + "__old")
        for f in files[4:]:
            shutil.copy(f, src)
            _t.sleep(0.05)
        got = stateful.run_scd2_upsert(spark, src, dim, chk)

        def rows(df):
            return {
                (
                    r.customer_id,
                    round(r.balance, 2),
                    r.effective_from,
                    r.transaction_id,
                    r.effective_to,
                    r.is_current,
                )
                for r in df.collect()
            }

        full = balance_scd2(
            transactions_from_events(spark.read.parquet(timed_events))
        )
        assert rows(got) == rows(full)
        assert os.path.isdir(dim)
        assert not os.path.isdir(dim + "__old")
        assert not os.path.isdir(dim + "__tmp")
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dimroot, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


def test_substring_novelty_stream_matches_sequential_twin(spark, sf_dir):
    """The streaming gram-index pipeline must flag exactly what a
    sequential driver-side replay flags: a doc's gram is novel iff no
    EARLIER batch contained it. Also exercises the shared snapshot
    helpers (index survives across batches, marker present)."""
    import glob as globmod
    import hashlib
    import re
    import time as _t

    from thrivefinancedatapipeline_spark.datamodel import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(60)
        .collect()
    )
    src = tempfile.mkdtemp(prefix="nov_src_")
    idx = tempfile.mkdtemp(prefix="nov_idx_") + "/index"
    res = tempfile.mkdtemp(prefix="nov_res_") + "/results"
    chk = tempfile.mkdtemp(prefix="nov_chk_")
    try:
        batches = [docs[0:20], docs[20:40], docs[40:60]]
        for i, b in enumerate(batches):
            spark.createDataFrame(
                [(d.doc_id, d.text) for d in b], "doc_id long, text string"
            ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b{i}")
            # file stream ingests in mtime order; one dir per batch
            _t.sleep(0.05)
        # flatten: the stream source wants files in one dir
        flat = tempfile.mkdtemp(prefix="nov_flat_")
        for i in range(3):
            for f in sorted(globmod.glob(f"{src}/b{i}/part-*")):
                shutil.copy(f, f"{flat}/batch{i}.parquet")
                _t.sleep(0.05)
        got = {
            r.doc_id: r
            for r in stateful.run_substring_novelty_stream(
                spark, flat, idx, res, chk
            ).collect()
        }

        # sequential twin
        L = 8
        seen = set()
        want = {}
        for b in batches:
            batch_grams = {}
            for d in b:
                ts = re.sub(r"\s+", " ", d.text).strip().lower().split(" ")
                gs = {
                    hashlib.md5(
                        " ".join(ts[i : i + L]).encode()
                    ).hexdigest()
                    for i in range(len(ts) - L + 1)
                }
                batch_grams[d.doc_id] = gs
                novel = sum(1 for g in gs if g not in seen)
                ppm = novel * 1_000_000 // len(gs) if gs else 0
                want[d.doc_id] = (len(gs), novel, ppm)
            for gs in batch_grams.values():
                seen |= gs
        assert len(got) == 60
        for doc_id, (n_grams, n_novel, ppm) in want.items():
            r = got[doc_id]
            assert (r.n_grams, r.n_novel, r.novel_ppm) == (
                n_grams, n_novel, ppm,
            ), doc_id
        # index snapshot committed with its marker
        assert os.path.isdir(idx)
        assert os.path.isfile(os.path.join(idx, stateful.SNAPSHOT_MARKER))
        shutil.rmtree(flat, ignore_errors=True)
    finally:
        for d in (src, os.path.dirname(idx), os.path.dirname(res), chk):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_transitions_match_batch_matrix(spark, timed_events):
    """Lambda parity for sequence mining: the streamed per-user
    (from, to) observations — including cross-batch boundary pairs —
    aggregate to exactly the batch Markov matrix counts."""
    from collections import Counter

    got = drain(
        stateful.stream_transitions(
            spark, timed_events, max_files_per_trigger=1
        ),
        "stream_transitions",
        "append",
    )
    stream_counts = Counter((r.from_type, r.to_type) for r in got)

    ev = spark.read.parquet(timed_events)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch_pairs = (
        ev.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("from_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .count()
        .collect()
    )
    batch_counts = Counter()
    for r in batch_pairs:
        batch_counts[(r.from_type, r.to_type)] = r["count"]
    assert stream_counts == batch_counts and stream_counts


def test_stream_weighted_reservoir_matches_batch(spark, sf_dir):
    """Drain parity for the streaming A-Res reservoir: the max-seq
    emission per language equals the batch weighted-reservoir over
    the full document set — the reservoir property (a merged stream
    of bounded states == one batch pass), with byte-identical
    priorities because both sides share the same Spark expressions."""
    import os

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sampling import (
        q_weighted_reservoir_attest,
    )

    src = tempfile.mkdtemp(prefix="stream_resv_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
        )
        # three arrival batches split by doc_id
        for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
            part = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            import glob
            import shutil

            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
        got = drain(
            stateful.stream_weighted_reservoir(
                spark, src, max_files_per_trigger=1
            ),
            "stream_resv",
            "append",
        )
        latest_seq = {}
        for r in got:
            latest_seq[r.lang] = max(latest_seq.get(r.lang, 0), r.seq)
        final = sorted(
            (r.lang, r.rank, r.doc_id, r.weight, r.priority)
            for r in got
            if r.seq == latest_seq[r.lang]
        )
        want = sorted(
            tuple(r)
            for r in q_weighted_reservoir_attest(spark, sf_dir).collect()
        )
        assert final == want
        assert len({r.lang for r in got}) >= 2
        # reservoir invariant along the stream: the k-th priority per
        # key never decreases batch over batch (merging can only
        # raise the bar) — but ONLY once the reservoir is FULL: while
        # a stratum holds fewer than RESERVOIR_K docs its floor is
        # just its current minimum and legitimately drops when a
        # lower-priority doc still makes the cut (r7 ADVICE closed)
        from thrivefinancedatapipeline_spark.operators.sampling import (
            RESERVOIR_K,
        )

        kth = {}
        for r in sorted(got, key=lambda r: r.seq):
            key = (r.lang, r.seq)
            kth.setdefault(key, []).append(r.priority)
        for lang in latest_seq:
            floors = [
                min(kth[(lang, s)])
                for s in range(1, latest_seq[lang] + 1)
                if len(kth.get((lang, s), [])) == RESERVOIR_K
            ]
            assert all(a <= b for a, b in zip(floors, floors[1:])) or (
                len(floors) <= 1
            )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_packing_efficiency_matches_batch(spark, sf_dir):
    """Drain parity for the streaming packing audit: the max-seq row
    per language equals the batch packing_efficiency over the full
    corpus — the greedy pack fold is left-to-right associative, so
    per-batch folding over four integers of state reproduces the
    batch scan exactly (token counts share the same Spark
    expressions). Also pins MONOTONE growth of every counter along
    the stream."""
    import glob
    import os

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.packing import (
        packing_efficiency,
    )

    src = tempfile.mkdtemp(prefix="stream_pack_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
            part = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).orderBy("doc_id").coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            # distinct mtimes pin the FileStreamSource arrival order
            # to the doc_id split (listing order is mtime-based)
            os.utime(f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i))
        got = drain(
            stateful.stream_packing_efficiency(
                spark, src, max_files_per_trigger=1
            ),
            "stream_pack",
            "append",
        )
        latest = {}
        for r in got:
            if r.lang not in latest or r.seq > latest[r.lang].seq:
                latest[r.lang] = r
        final = sorted(
            (
                r.lang, r.n_docs, r.total_tokens, r.n_packs,
                r.n_split_docs, r.fill_ppm,
            )
            for r in latest.values()
        )
        want = sorted(
            tuple(r) for r in packing_efficiency(spark, sf_dir).collect()
        )
        assert final == want
        # counters never decrease along the stream per language
        by_lang = {}
        for r in sorted(got, key=lambda r: r.seq):
            prev = by_lang.get(r.lang)
            if prev is not None:
                assert r.n_docs >= prev.n_docs
                assert r.total_tokens >= prev.total_tokens
                assert r.n_packs >= prev.n_packs
                assert r.n_split_docs >= prev.n_split_docs
            by_lang[r.lang] = r
        assert len(got) > len(latest)  # multiple emissions per lang
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_balance_drawdown_matches_batch(spark, sf_dir):
    """Drain parity for the streaming drawdown monitor: the max-seq
    row per customer equals the batch drawdown rollup over the union
    of all batches (running maxima fold left-to-right, so three
    integers of state reproduce the whole-history windows); drawdown
    and peak are monotone along the stream. The source pins file
    mtimes so FileStreamSource arrival matches the time split (the
    timed_events fixture's appended part files can tie on mtime and
    arrive out of time order — drawdown, unlike set-valued twins, is
    order-SENSITIVE, so the contract is explicit here)."""
    import glob

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        drawdown_from,
    )

    src = tempfile.mkdtemp(prefix="stream_dd_")
    try:
        ev = load_table(spark, sf_dir, "events")
        bounds = [1, 6, 11, 16, 21, 26, 32]
        for i in range(6):
            part = ev.filter(
                (F.dayofmonth("ts") >= bounds[i])
                & (F.dayofmonth("ts") < bounds[i + 1])
            ).coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i)
            )
        _assert_drawdown_parity(spark, src, drawdown_from)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _assert_drawdown_parity(spark, src, drawdown_from):
    got = drain(
        stateful.stream_balance_drawdown(
            spark, src, max_files_per_trigger=1
        ),
        "stream_dd",
        "append",
    )
    latest = {}
    for r in got:
        if r.customerid not in latest or r.seq > latest[r.customerid].seq:
            latest[r.customerid] = r
    final = sorted(
        (
            r.customerid, r.n_txns, r.final_cents, r.peak_cents,
            r.max_drawdown_cents, r.drawdown_ppm,
        )
        for r in latest.values()
    )
    want = sorted(
        tuple(r)
        for r in drawdown_from(
            transactions_from_events(spark.read.parquet(src))
        ).collect()
    )
    assert final == want
    assert len(final) > 10
    # running maxima never decrease along the stream
    by_cust = {}
    for r in sorted(got, key=lambda r: r.seq):
        prev = by_cust.get(r.customerid)
        if prev is not None:
            assert r.peak_cents >= prev.peak_cents
            assert r.max_drawdown_cents >= prev.max_drawdown_cents
            assert r.n_txns >= prev.n_txns
        by_cust[r.customerid] = r
    assert len(got) > len(latest)


def test_stream_balance_volatility_matches_batch(spark, sf_dir):
    """Drain parity for the streaming daily-flow volatility monitor:
    the max-seq row per customer equals the batch volatility rollup
    over the union of all batches (population moments fold
    left-to-right once day cells close; six scalars of state per
    customer). Day cells are order-SENSITIVE — an out-of-order day
    would open a second cell for a date the batch counts once — so
    the source pins file mtimes like the drawdown twin."""
    import glob

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        volatility_from,
    )

    src = tempfile.mkdtemp(prefix="stream_vol_")
    try:
        ev = load_table(spark, sf_dir, "events")
        bounds = [1, 6, 11, 16, 21, 26, 32]
        for i in range(6):
            part = ev.filter(
                (F.dayofmonth("ts") >= bounds[i])
                & (F.dayofmonth("ts") < bounds[i + 1])
            ).coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i)
            )
        got = drain(
            stateful.stream_balance_volatility(
                spark, src, max_files_per_trigger=1
            ),
            "stream_vol",
            "append",
        )
        latest = {}
        for r in got:
            if (
                r.customerid not in latest
                or r.seq > latest[r.customerid].seq
            ):
                latest[r.customerid] = r
        final = sorted(
            (r.customerid, r.n_days, r.net_cents, r.flow_var_cents2)
            for r in latest.values()
        )
        want = sorted(
            tuple(r)
            for r in volatility_from(
                transactions_from_events(spark.read.parquet(src))
            ).collect()
        )
        assert final == want
        assert len(final) > 10
        # day counts never decrease along the stream
        by_cust = {}
        for r in sorted(got, key=lambda r: r.seq):
            prev = by_cust.get(r.customerid)
            if prev is not None:
                assert r.n_days >= prev.n_days
            by_cust[r.customerid] = r
        assert len(got) > len(latest)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_bucket_migration_matches_batch(spark, sf_dir):
    """Drain parity for the streaming bucket-migration twin against
    an exact pure-Python replay: the drained transition log equals
    every CLOSED-day transition (a transition is closed once a later
    active day arrives for the customer), each emitted exactly once;
    and closed + still-open final transitions together equal the
    batch balance_bucket_migration matrix — so the stream misses
    nothing except the one undecidable open day per customer."""
    import glob
    from collections import Counter

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        _txns,
        balance_bucket_migration,
        bucket_of_cents,
        delta_cents_col,
    )

    src = tempfile.mkdtemp(prefix="stream_mig_")
    try:
        ev = load_table(spark, sf_dir, "events")
        bounds = [1, 6, 11, 16, 21, 26, 32]
        for i in range(6):
            part = ev.filter(
                (F.dayofmonth("ts") >= bounds[i])
                & (F.dayofmonth("ts") < bounds[i + 1])
            ).coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i)
            )
        got = drain(
            stateful.stream_bucket_migration(
                spark, src, max_files_per_trigger=1
            ),
            "stream_mig",
            "append",
        )
        # exact Python replay of the daily-balance bucket walk
        rows = (
            _txns(spark, sf_dir)
            .select(
                "customerid",
                F.date_format("createdat", "yyyy-MM-dd").alias("d"),
                delta_cents_col().alias("dc"),
            )
            .collect()
        )
        daily = {}
        for r in rows:
            daily[(r.customerid, r.d)] = (
                daily.get((r.customerid, r.d), 0) + r.dc
            )
        by_cust = {}
        for (cid, d), net in sorted(daily.items()):
            by_cust.setdefault(cid, []).append((d, net))
        closed, final = [], Counter()
        for cid, days in by_cust.items():
            bal, prev = 0, None
            for i, (d, net) in enumerate(days):
                bal += net
                b = bucket_of_cents(bal)
                if prev is not None:
                    if i < len(days) - 1:
                        closed.append((cid, d, prev, b))
                    else:
                        final[(prev, b)] += 1  # open at drain end
                prev = b
        want_closed = Counter(closed)
        got_closed = Counter(
            (r.customerid, r.closed_day, r.from_bucket, r.to_bucket)
            for r in got
        )
        assert got_closed == want_closed
        assert max(got_closed.values(), default=1) == 1  # exactly once
        # closed + open-day transitions == the batch matrix
        batch = Counter()
        for r in balance_bucket_migration(spark, sf_dir).collect():
            batch[(r.from_bucket, r.to_bucket)] = r.n_transitions
        stream_plus_final = Counter(final)
        for _cid, _d, frm, to in got_closed:
            stream_plus_final[(frm, to)] += 1
        assert stream_plus_final == batch
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_keep_priority_matches_batch(spark, sf_dir):
    """Drain parity for the streaming source-priority dedup: the
    max-seq row per content hash equals the batch
    dedup_keep_priority CHOICE (min is order-free, so parity must
    hold even under an adversarial REVERSED arrival order), and the
    per-group copy counters both grow monotonically and sum to the
    corpus size."""
    import glob
    import os

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.dedup import (
        dedup_keep_priority,
    )

    src = tempfile.mkdtemp(prefix="stream_keep_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        # REVERSED doc_id order across files: the worst case for any
        # first-arrival rule — argmin state must not care
        for i, (lo, hi) in enumerate([(340, 10**9), (170, 340), (0, 170)]):
            part = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).orderBy(F.col("doc_id").desc()).coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i))
        got = drain(
            stateful.stream_keep_priority(spark, src, max_files_per_trigger=1),
            "stream_keep_priority",
            "append",
        )
        last, hist = {}, {}
        for r in got:
            if r.content_hash not in last or r.seq > last[r.content_hash].seq:
                last[r.content_hash] = r
            hist.setdefault(r.content_hash, []).append((r.seq, r.n_copies))
        # monotone copy counters along each group's emission sequence
        for rows in hist.values():
            rows.sort()
            counts = [n for _s, n in rows]
            assert counts == sorted(counts)
        stream_pick = {
            (r.doc_id, r.lang, r.source, r.n_copies) for r in last.values()
        }
        batch_pick = {
            tuple(r) for r in dedup_keep_priority(spark, sf_dir).collect()
        }
        assert stream_pick == batch_pick
        assert sum(r.n_copies for r in last.values()) == docs.count()
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_velocity_flags_matches_batch(spark, sf_dir):
    """Drain parity for the streaming velocity screen: on a
    time-ordered drain (files split on day boundaries, so equal-es
    tie groups never straddle micro-batches) the emitted flag rows
    equal the batch txn_velocity_flags EXACTLY — backward-looking
    range frames never need future events."""
    import glob

    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        txn_velocity_flags,
    )

    src = tempfile.mkdtemp(prefix="stream_vel_")
    try:
        ev = load_table(spark, sf_dir, "events")
        bounds = [1, 6, 11, 16, 21, 26, 32]
        for i in range(6):
            part = ev.filter(
                (F.dayofmonth("ts") >= bounds[i])
                & (F.dayofmonth("ts") < bounds[i + 1])
            ).coalesce(1)
            part.write.parquet(f"{src}/b{i}", mode="overwrite")
            for f in glob.glob(f"{src}/b{i}/part-*.parquet"):
                shutil.copy(f, f"{src}/file{i}.parquet")
            shutil.rmtree(f"{src}/b{i}")
            os.utime(
                f"{src}/file{i}.parquet", (1_000_000 + i, 1_000_000 + i)
            )
        got = drain(
            stateful.stream_velocity_flags(
                spark, src, max_files_per_trigger=1
            ),
            "stream_vel_flags",
            "append",
        )
        stream_rows = sorted(
            (r.trans_id, r.customerid, r.es, r.n_1h,
             r.spent_1h_cents, r.n_24h)
            for r in got
        )
        batch_rows = sorted(
            tuple(r) for r in txn_velocity_flags(spark, sf_dir).collect()
        )
        assert stream_rows == batch_rows
        assert len(stream_rows) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
