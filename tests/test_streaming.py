"""Structured Streaming twins: lambda-parity with the batch operators.

Micro-batches are written as separate parquet files into a temp dir;
availableNow drains them; results must equal the batch computation on
the union of all batches.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.operators.balance import (
    balance_history,
    current_balances,
)
from thrivefinancedatapipeline_spark.sources.ingest import (
    transactions_from_events,
)
from thrivefinancedatapipeline_spark.streaming import balance_stream


@pytest.fixture(scope="module")
def staged_events(spark, sf_dir):
    """Split sf0.001 events into 3 parquet files (micro-batches)."""
    tmp = tempfile.mkdtemp(prefix="stream_src_")
    ev = load_table(spark, sf_dir, "events")
    # 3 slices by event_id → 3 files appearing as a file stream
    for i in range(3):
        (
            ev.filter(F.col("event_id") % 3 == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(tmp)
        )
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_current_balances_matches_batch(spark, staged_events):
    chk = tempfile.mkdtemp(prefix="chk_")
    try:
        got = balance_stream.run_to_completion(
            balance_stream.stream_current_balances(spark, staged_events),
            chk,
            "stream_balances",
        )
        stream_rows = {
            r.customerid: round(r.current_balance, 2) for r in got.collect()
        }
        ev = spark.read.parquet(staged_events)
        batch = current_balances(
            balance_history(transactions_from_events(ev))
        )
        batch_rows = {
            r.customer_id: round(r.current_balance, 2) for r in batch.collect()
        }
        assert stream_rows == batch_rows
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_stream_windowed_agg_matches_batch(spark, staged_events):
    chk = tempfile.mkdtemp(prefix="chk_")
    try:
        got = balance_stream.run_to_completion(
            balance_stream.stream_windowed_event_agg(spark, staged_events),
            chk,
            "stream_windows",
        )
        stream_rows = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in got.collect()
        }
        ev = spark.read.parquet(staged_events)
        batch = (
            ev.groupBy(
                F.date_trunc("hour", F.col("ts")).alias("window_start"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100,
                    2,
                ).alias("total_value"),
            )
        )
        batch_rows = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in batch.collect()
        }
        assert stream_rows == batch_rows
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_stream_cms_grid_matches_batch(spark, staged_events):
    """The drained streaming CMS equals the batch grid cell-for-cell:
    streaming aggregation state is literally the mergeable sketch."""
    from thrivefinancedatapipeline_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_grid,
    )
    from thrivefinancedatapipeline_spark.streaming import stateful

    chk = tempfile.mkdtemp(prefix="chk_cms_")
    try:
        got = balance_stream.run_to_completion(
            stateful.stream_cms_counters(spark, staged_events),
            chk,
            "stream_cms",
        )
        stream_cells = {(r.i, r.bucket): r.c for r in got.collect()}
        batch = cms_grid(spark.read.parquet(staged_events))
        batch_cells = {(r.i, r.bucket): r.c for r in batch.collect()}
        assert stream_cells == batch_cells
        assert len(batch_cells) <= CMS_DEPTH * CMS_WIDTH
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_stream_orphan_monitor_matches_batch(spark, sf_dir, staged_events):
    """Windowed orphan counts from the stream equal the batch
    stream-static audit over the same events (complete drain)."""
    from thrivefinancedatapipeline_spark.streaming import stateful

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    chk = tempfile.mkdtemp(prefix="chk_orphan_")
    try:
        got = balance_stream.run_to_completion(
            stateful.stream_orphan_monitor(spark, staged_events, cust),
            chk,
            "stream_orphans",
        )
        stream_rows = {
            r.window_start: (r.n_events, r.n_orphans) for r in got.collect()
        }
        ev = spark.read.parquet(staged_events)
        keys = cust.distinct().withColumnRenamed("c_custkey", "_pk")
        batch = (
            ev.join(keys, ev["user_id"] == F.col("_pk"), "left")
            .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum((F.col("_pk").isNull()).cast("long")).alias("n_orphans"),
            )
        )
        batch_rows = {
            r.window_start: (r.n_events, r.n_orphans) for r in batch.collect()
        }
        assert stream_rows == batch_rows
        assert sum(n for n, _ in stream_rows.values()) == ev.count()
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_stream_value_histogram_matches_batch(spark, staged_events):
    """The drained streaming histogram equals the batch cells
    cell-for-cell, and the quantile read-off is identical from either
    side — streaming aggregation state as a mergeable quantile
    sketch (the CMS pattern applied to percentiles)."""
    from thrivefinancedatapipeline_spark.operators.sketches import (
        fixed_hist_cells,
        hist_quantiles_from_cells,
    )
    from thrivefinancedatapipeline_spark.streaming import stateful

    chk = tempfile.mkdtemp(prefix="chk_hist_")
    try:
        got = balance_stream.run_to_completion(
            stateful.stream_value_histogram(spark, staged_events),
            chk,
            "stream_hist",
        )
        stream_cells = {
            (r.event_type, r.bucket): r.c for r in got.collect()
        }
        batch = fixed_hist_cells(spark.read.parquet(staged_events))
        batch_cells = {
            (r.event_type, r.bucket): r.c for r in batch.collect()
        }
        assert stream_cells == batch_cells and batch_cells
        sq = sorted(
            (r.event_type, r.q, r.target_rank, r.bucket, r.lo_cents,
             r.hi_cents)
            for r in hist_quantiles_from_cells(got).collect()
        )
        bq = sorted(
            (r.event_type, r.q, r.target_rank, r.bucket, r.lo_cents,
             r.hi_cents)
            for r in hist_quantiles_from_cells(batch).collect()
        )
        assert sq == bq and sq
        # each quantile's bucket really covers its target rank and
        # per-type counts cover the full input
        ev = spark.read.parquet(staged_events)
        n_by_type = {
            r.event_type: r.n
            for r in ev.groupBy("event_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert {
            t for t, _ in stream_cells
        } == set(n_by_type)
        for t in n_by_type:
            total = sum(c for (tt, _), c in stream_cells.items() if tt == t)
            assert total == n_by_type[t]
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_stream_benford_matches_batch(spark, staged_events):
    """The drained streaming Benford counters equal the batch cells,
    and the deviation frame read off the stream state equals the
    batch audit row-for-row."""
    from thrivefinancedatapipeline_spark.operators.quality import (
        benford_cells,
        benford_from_cells,
    )
    from thrivefinancedatapipeline_spark.streaming import stateful

    chk = tempfile.mkdtemp(prefix="chk_benford_")
    try:
        got = balance_stream.run_to_completion(
            stateful.stream_benford(spark, staged_events),
            chk,
            "stream_benford",
        )
        stream_cells = {
            (r.event_type, r.digit): r.n for r in got.collect()
        }
        batch = benford_cells(spark.read.parquet(staged_events))
        batch_cells = {
            (r.event_type, r.digit): r.n for r in batch.collect()
        }
        assert stream_cells == batch_cells and batch_cells
        key = lambda r: (r.event_type, r.digit)  # noqa: E731
        sa = sorted(map(tuple, benford_from_cells(got).collect()))
        ba = sorted(map(tuple, benford_from_cells(batch).collect()))
        assert sa == ba and sa
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_observed_metrics_batch_and_stream(spark, sf_dir, staged_events):
    """Observation-API telemetry: batch metrics equal a direct audit
    of the same table (while costing zero extra scans), and the
    streaming twin surfaces per-batch observedMetrics whose totals
    cover the full input."""
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.quality import (
        observe_ingest_quality,
    )
    from thrivefinancedatapipeline_spark.streaming import stateful

    ev = load_table(spark, sf_dir, "events")
    observed, obs = observe_ingest_quality(ev)
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("nulls"),
        F.sum((F.col("value") <= 0).cast("long")).alias("nonpos"),
    ).collect()[0]
    assert m["n_rows"] == direct.n
    assert m["null_user_ids"] == (direct.nulls or 0)
    assert m["nonpositive_values"] == (direct.nonpos or 0)
    assert m["approx_days"] >= 1

    chk = tempfile.mkdtemp(prefix="chk_obs_")
    totals = {"n_rows": 0, "null_user_ids": 0, "nonpositive_values": 0}
    try:
        q = (
            stateful.stream_observed_events(spark, staged_events)
            .writeStream.format("noop")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        for p in q.recentProgress:
            om = p["observedMetrics"].get("ingest_quality")
            if om:
                for k in totals:
                    totals[k] += om[k]
        q.stop()
    finally:
        shutil.rmtree(chk, ignore_errors=True)
    n_input = spark.read.parquet(staged_events).count()
    assert totals["n_rows"] == n_input
    assert totals["null_user_ids"] == 0


def test_stream_hour_cells_match_batch(spark, staged_events):
    """The drained streaming dayparting counters equal the batch
    cells cell-for-cell (shared hour_cells code path)."""
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        hour_cells,
    )
    from thrivefinancedatapipeline_spark.streaming import stateful

    chk = tempfile.mkdtemp(prefix="chk_hourcells_")
    try:
        got = balance_stream.run_to_completion(
            stateful.stream_hour_cells(spark, staged_events),
            chk,
            "stream_hour_cells",
        )
        stream_cells = {
            (r.event_type, r.hour): r.o for r in got.collect()
        }
        batch_cells = {
            (r.event_type, r.hour): r.o
            for r in hour_cells(
                spark.read.parquet(staged_events)
            ).collect()
        }
        assert stream_cells == batch_cells and batch_cells
        assert all(0 <= h <= 23 for _, h in stream_cells)
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_stream_jsonl_corpus_drain_matches_batch_reader(spark):
    """Streaming-twin drain parity for JSONL corpus drops: documents
    landing across two drops drain to exactly the batch json reader's
    relation (same ids, same text), and a drop appended AFTER the
    first drain arrives exactly once in the second — set semantics,
    order-insensitive by design (FileStreamSource orders by mtime, so
    the test stamps distinct mtimes per drop)."""
    import json
    import os
    import shutil
    import tempfile

    from thrivefinancedatapipeline_spark.streaming.balance_stream import (
        CORPUS_JSONL_SCHEMA,
        stream_jsonl_corpus,
    )

    src = tempfile.mkdtemp(prefix="jsonlstream_")
    chk = tempfile.mkdtemp(prefix="jsonlchk_")
    out = tempfile.mkdtemp(prefix="jsonlout_")
    try:
        def drop(name, docs, mtime):
            p = os.path.join(src, name)
            with open(p, "w") as f:
                for d in docs:
                    f.write(json.dumps(d) + "\n")
            os.utime(p, (mtime, mtime))

        batch1 = [
            {"doc_id": 1, "lang": "en", "source": "web",
             "text": "alpha doc"},
            {"doc_id": 2, "lang": "de", "source": "web",
             "text": "beta doc\nwith embedded newline"},
        ]
        drop("drop0.jsonl", batch1, 1_700_000_000)

        def drain():
            # parquet sink: the memory sink cannot RECOVER from a
            # checkpoint, so a second availableNow drain would refuse
            # to start — exactly-once across drains needs the
            # file-commit sink
            q = (
                stream_jsonl_corpus(spark, src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                r["doc_id"]: (r["lang"], r["source"], r["text"])
                for r in spark.read.schema(CORPUS_JSONL_SCHEMA)
                .parquet(out)
                .collect()
            }

        def batch_read():
            return {
                r["doc_id"]: (r["lang"], r["source"], r["text"])
                for r in spark.read.schema(CORPUS_JSONL_SCHEMA)
                .json(src)
                .collect()
            }

        got = drain()
        assert got == batch_read() and len(got) == 2
        # embedded newlines survive (JSONL carries boundaries in-band
        # — exactly why the streaming twin is JSONL, not wholetext)
        assert "\n" in got[2][2]

        drop(
            "drop1.jsonl",
            [{"doc_id": 3, "lang": "en", "source": "books",
              "text": "gamma doc"}],
            1_700_000_100,
        )
        got2 = drain()
        assert got2 == batch_read() and len(got2) == 3
    finally:
        for d in (src, chk, out):
            shutil.rmtree(d, ignore_errors=True)


def test_corpus_funnel_stream_decontam_and_cross_drop_dedup(spark):
    """Streaming corpus-funnel twin: documents landing across two
    drops are decontaminated against a STATIC blocklist and
    exact-deduped with CROSS-DROP state — a byte-identical document
    arriving in drop 2 is suppressed by state RECOVERED from the
    checkpoint (the assertion plain batch tests cannot make), a
    benchmark-id doc and a blocklist-overlapping doc are dropped by
    the same clean rule as batch q_corpus_clean, and the drained sink
    equals a batch recompute with the same definitions (set
    semantics on content hashes — dropDuplicates keeps an arbitrary
    first row per hash, so doc ids are not a contract)."""
    import json
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.functions.text import (
        md5_long,
        shingles_from_tokens,
        tokens,
    )
    from thrivefinancedatapipeline_spark.streaming.balance_stream import (
        corpus_funnel_stream,
    )

    src = tempfile.mkdtemp(prefix="funnelsrc_")
    chk = tempfile.mkdtemp(prefix="funnelchk_")
    out = tempfile.mkdtemp(prefix="funnelout_")
    try:
        bench_texts = ["held out eval question one", "secret eval two plus"]
        blocklist = (
            spark.createDataFrame([(t,) for t in bench_texts], "text string")
            .select(tokens(F.col("text")).alias("toks"))
            .select(F.explode(shingles_from_tokens(F.col("toks"))).alias("sh"))
            .distinct()
        )

        def drop(name, docs, mtime):
            p = os.path.join(src, name)
            with open(p, "w") as f:
                for d in docs:
                    f.write(json.dumps(d) + "\n")
            os.utime(p, (mtime, mtime))

        def drain():
            q = (
                corpus_funnel_stream(spark, src, blocklist)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                r["content_hash"]
                for r in spark.read.parquet(out).collect()
            }

        def batch_hashes():
            docs = spark.read.schema(
                "doc_id long, lang string, source string, text string"
            ).json(src)
            shingled = docs.select(
                "doc_id",
                md5_long(F.col("text")).alias("content_hash"),
                tokens(F.col("text")).alias("toks"),
            ).select(
                "doc_id",
                "content_hash",
                shingles_from_tokens(F.col("toks")).alias("shs"),
            )
            bl = blocklist.agg(
                F.collect_set("sh").alias("bl_shingles")
            )
            return {
                r["content_hash"]
                for r in shingled.crossJoin(F.broadcast(bl))
                .filter(
                    (F.col("doc_id") % 97 != 0)
                    & ~F.arrays_overlap(
                        F.col("shs"), F.col("bl_shingles")
                    )
                )
                .select("content_hash")
                .distinct()
                .collect()
            }

        drop(
            "d0.jsonl",
            [
                {"doc_id": 1, "lang": "en", "source": "web",
                 "text": "alpha doc body here"},
                {"doc_id": 2, "lang": "de", "source": "web",
                 "text": "beta doc body here"},
                # in-batch duplicate of doc 1 (same bytes)
                {"doc_id": 3, "lang": "en", "source": "crawl",
                 "text": "alpha doc body here"},
            ],
            1_700_000_000,
        )
        got1 = drain()
        assert got1 == batch_hashes() and len(got1) == 2

        drop(
            "d1.jsonl",
            [
                # cross-drop duplicate: suppressed by RECOVERED state
                {"doc_id": 4, "lang": "en", "source": "books",
                 "text": "beta doc body here"},
                # benchmark id (97 % 97 == 0): decontam drops it
                {"doc_id": 97, "lang": "en", "source": "web",
                 "text": "totally novel benchmark carrier"},
                # shares the 3-gram 'held out eval' with the blocklist
                {"doc_id": 5, "lang": "en", "source": "web",
                 "text": "contains held out eval overlap words"},
                # genuinely new and clean
                {"doc_id": 6, "lang": "fr", "source": "books",
                 "text": "gamma fresh clean doc"},
            ],
            1_700_000_100,
        )
        got2 = drain()
        assert got2 == batch_hashes() and len(got2) == 3
        # the new survivor is exactly the gamma doc's hash
        gamma = spark.range(1).select(
            md5_long(F.lit("gamma fresh clean doc")).alias("h")
        ).collect()[0]["h"]
        assert got2 - got1 == {gamma}
    finally:
        for d in (src, chk, out):
            shutil.rmtree(d, ignore_errors=True)


def test_corpus_funnel_stream_watermarked_dedup_bounded_state(spark):
    """The bounded-state production variant: dedup_within switches the
    funnel to dropDuplicatesWithinWatermark over ingest time. Within
    the lateness bound the semantics match the unbounded form — an
    in-batch duplicate AND a cross-drop duplicate arriving seconds
    later are both suppressed (drains run well inside a 30-minute
    watermark) — and the streaming plan actually carries the
    watermarked dedup operator (asserted on the physical plan, so a
    silent fallback to the unbounded form cannot stay green)."""
    import json
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.functions.text import (
        md5_long,
        shingles_from_tokens,
        tokens,
    )
    from thrivefinancedatapipeline_spark.streaming.balance_stream import (
        corpus_funnel_stream,
    )

    src = tempfile.mkdtemp(prefix="wfunnelsrc_")
    chk = tempfile.mkdtemp(prefix="wfunnelchk_")
    out = tempfile.mkdtemp(prefix="wfunnelout_")
    try:
        blocklist = (
            spark.createDataFrame(
                [("held out eval question one",)], "text string"
            )
            .select(tokens(F.col("text")).alias("toks"))
            .select(
                F.explode(shingles_from_tokens(F.col("toks"))).alias("sh")
            )
            .distinct()
        )
        stream = corpus_funnel_stream(
            spark, src, blocklist, dedup_within="30 minutes"
        )
        # the bounded-state operator is IN the plan (not the unbounded
        # dropDuplicates): check the logical string form
        plan = stream._jdf.queryExecution().logical().toString()
        assert "WithinWatermark" in plan

        def drop(name, docs, mtime):
            p = os.path.join(src, name)
            with open(p, "w") as f:
                for d in docs:
                    f.write(json.dumps(d) + "\n")
            os.utime(p, (mtime, mtime))

        def drain():
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                r["content_hash"]
                for r in spark.read.parquet(out).collect()
            }

        drop(
            "d0.jsonl",
            [
                {"doc_id": 1, "lang": "en", "source": "web",
                 "text": "alpha doc body here"},
                {"doc_id": 2, "lang": "en", "source": "crawl",
                 "text": "alpha doc body here"},  # in-batch dup
            ],
            1_700_000_000,
        )
        got1 = drain()
        assert len(got1) == 1

        drop(
            "d1.jsonl",
            [
                # cross-drop dup, seconds later — well inside the bound
                {"doc_id": 3, "lang": "de", "source": "books",
                 "text": "alpha doc body here"},
                {"doc_id": 4, "lang": "fr", "source": "books",
                 "text": "gamma fresh clean doc"},
            ],
            1_700_000_100,
        )
        got2 = drain()
        assert len(got2) == 2
        gamma = spark.range(1).select(
            md5_long(F.lit("gamma fresh clean doc")).alias("h")
        ).collect()[0]["h"]
        assert got2 - got1 == {gamma}
    finally:
        for d in (src, chk, out):
            shutil.rmtree(d, ignore_errors=True)


def test_corpus_funnel_stream_watermark_eviction_reemits_late_dup(spark):
    """The documented re-emission TRADE of the bounded-state variant,
    proven by behavior (not plan shape): with dedup_within='1 second'
    a duplicate arriving AFTER the watermark has advanced past the
    original's ingest time is RE-EMITTED — the seen-set entry was
    evicted, which is exactly what bounds the state. Three drains:
    (1) alpha emits and seeds state; (2) an unrelated doc several wall
    seconds later advances the watermark past alpha's ingest time,
    evicting its entry; (3) a byte-identical alpha arrives and emits
    AGAIN (two alpha rows in the sink). The in-bound suppression tests
    above pin the other side of the trade; together they pin the
    semantics, not just the operator's presence in the plan."""
    import json
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.functions.text import (
        md5_long,
        shingles_from_tokens,
        tokens,
    )
    from thrivefinancedatapipeline_spark.streaming.balance_stream import (
        corpus_funnel_stream,
    )

    src = tempfile.mkdtemp(prefix="efunnelsrc_")
    chk = tempfile.mkdtemp(prefix="efunnelchk_")
    out = tempfile.mkdtemp(prefix="efunnelout_")
    try:
        blocklist = (
            spark.createDataFrame(
                [("held out eval question one",)], "text string"
            )
            .select(tokens(F.col("text")).alias("toks"))
            .select(
                F.explode(shingles_from_tokens(F.col("toks"))).alias("sh")
            )
            .distinct()
        )
        stream = corpus_funnel_stream(
            spark, src, blocklist, dedup_within="1 second"
        )

        def drop(name, docs):
            p = os.path.join(src, name)
            with open(p, "w") as f:
                for d in docs:
                    f.write(json.dumps(d) + "\n")

        def drain():
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return [
                r["content_hash"]
                for r in spark.read.parquet(out).collect()
            ]

        alpha = spark.range(1).select(
            md5_long(F.lit("alpha doc body here")).alias("h")
        ).collect()[0]["h"]

        drop("d0.jsonl", [
            {"doc_id": 1, "lang": "en", "source": "web",
             "text": "alpha doc body here"},
        ])
        assert drain().count(alpha) == 1

        # wall sleep >> delay: the next batch's ingest_ts advances the
        # committed watermark PAST alpha's entry, evicting it
        time.sleep(5)
        drop("d1.jsonl", [
            {"doc_id": 2, "lang": "fr", "source": "books",
             "text": "beta fresh clean doc"},
        ])
        assert drain().count(alpha) == 1

        time.sleep(5)
        drop("d2.jsonl", [
            {"doc_id": 3, "lang": "de", "source": "crawl",
             "text": "alpha doc body here"},  # late duplicate
        ])
        # evicted state cannot suppress it: alpha appears TWICE
        assert drain().count(alpha) == 2
    finally:
        for d in (src, chk, out):
            shutil.rmtree(d, ignore_errors=True)
