"""Sink helpers: streaming parquet sink drains exactly-once; the
compactor consolidates small files without changing the data."""

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.sources.io import compact_parquet
from thrivefinancedatapipeline_spark.streaming.balance_stream import (
    run_to_parquet,
    stream_transactions,
)


def test_stream_to_parquet_sink_is_exactly_once(spark, sf_dir):
    src = tempfile.mkdtemp(prefix="sink_src_")
    out = tempfile.mkdtemp(prefix="sink_out_")
    chk = tempfile.mkdtemp(prefix="sink_chk_")
    try:
        ev = load_table(spark, sf_dir, "events")
        for i in range(3):
            ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        run_to_parquet(stream_transactions(spark, src), out, chk)
        written = spark.read.parquet(out)
        assert written.count() == ev.count()
        # a second drain with the same checkpoint writes nothing new
        run_to_parquet(stream_transactions(spark, src), out, chk)
        assert spark.read.parquet(out).count() == ev.count()
    finally:
        for d in (src, out, chk):
            shutil.rmtree(d, ignore_errors=True)


def test_merge_schema_reads_evolved_dataset(spark, sf_dir):
    import tempfile as tf

    from thrivefinancedatapipeline_spark.sources.io import read_parquet_merged

    d = tf.mkdtemp(prefix="evolve_")
    try:
        ev = load_table(spark, sf_dir, "events").limit(100)
        ev.select("event_id", "user_id").write.mode("append").parquet(d)
        ev.select(
            "event_id", "user_id", F.lit("v2").alias("schema_version")
        ).write.mode("append").parquet(d)
        merged = read_parquet_merged(spark, d)
        assert set(merged.columns) == {"event_id", "user_id", "schema_version"}
        assert merged.count() == 200
        # old files surface the new column as null
        assert merged.filter(F.col("schema_version").isNull()).count() == 100
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_range_sorted_write_has_disjoint_file_ranges(spark, sf_dir):
    import tempfile as tf

    import pyarrow.parquet as pq

    from thrivefinancedatapipeline_spark.sources.io import (
        write_range_sorted_parquet,
    )

    d = tf.mkdtemp(prefix="rangesort_")
    try:
        ev = load_table(spark, sf_dir, "events")
        write_range_sorted_parquet(ev, d, ["event_id"], n_files=4)
        back = spark.read.parquet(d)
        assert back.count() == ev.count()
        # per-file key ranges must be disjoint → row-group min/max
        # stats are tight and a range predicate skips whole files
        ranges = []
        for p in sorted(glob.glob(f"{d}/*.parquet")):
            md = pq.ParquetFile(p).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.schema.column(i).name == "event_id"
            )
            mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
            maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi <= lo
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir):
    src = tempfile.mkdtemp(prefix="cmp_src_")
    out = tempfile.mkdtemp(prefix="cmp_out_")
    try:
        ev = load_table(spark, sf_dir, "events")
        # simulate small-file accretion: 24 tiny files
        ev.repartition(24).write.mode("overwrite").parquet(src)
        assert len(glob.glob(f"{src}/*.parquet")) >= 24
        compact_parquet(spark, src, out, target_file_mb=64)
        out_files = glob.glob(f"{out}/*.parquet")
        assert 1 <= len(out_files) < 24
        assert spark.read.parquet(out).count() == ev.count()
    finally:
        for d in (src, out):
            shutil.rmtree(d, ignore_errors=True)


def test_zorder_write_tightens_stats_on_both_keys(spark, sf_dir):
    """Z-ordered files each cover a small bounding box: the average
    per-file span fraction on EVERY clustered column is well below 1
    (an unsorted write gives ~1.0 per file on both)."""
    import tempfile as tf

    import pyarrow.parquet as pq

    from thrivefinancedatapipeline_spark.sources.io import (
        write_zordered_parquet,
    )

    d = tf.mkdtemp(prefix="zorder_")
    try:
        ev = load_table(spark, sf_dir, "events")
        write_zordered_parquet(ev, d, ["user_id", "event_id"], n_files=16)
        back = spark.read.parquet(d)
        assert back.count() == ev.count()
        assert "__z" not in back.columns
        glb = ev.agg(
            F.min("user_id"), F.max("user_id"),
            F.min("event_id"), F.max("event_id"),
        ).collect()[0]
        spans = {"user_id": [], "event_id": []}
        for p in sorted(glob.glob(f"{d}/*.parquet")):
            md = pq.ParquetFile(p).metadata
            for col in spans:
                idx = next(
                    i for i in range(md.num_columns)
                    if md.schema.column(i).name == col
                )
                mins = [
                    md.row_group(g).column(idx).statistics.min
                    for g in range(md.num_row_groups)
                ]
                maxs = [
                    md.row_group(g).column(idx).statistics.max
                    for g in range(md.num_row_groups)
                ]
                spans[col].append((min(mins), max(maxs)))
        for col, (glo, ghi) in (
            ("user_id", (glb[0], glb[1])),
            ("event_id", (glb[2], glb[3])),
        ):
            gspan = ghi - glo or 1
            fracs = [(hi - lo) / gspan for lo, hi in spans[col]]
            avg = sum(fracs) / len(fracs)
            assert avg < 0.6, f"{col}: avg file span fraction {avg:.2f}"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucket_and_partition_planning():
    from thrivefinancedatapipeline_spark.sources.bucketing import (
        plan_bucket_count,
        plan_shuffle_partitions,
    )

    mb = 1024 * 1024
    # power-of-2 growth: 1 TB at 256 MB target → 4096 buckets
    assert plan_bucket_count(1024 * 1024 * mb, 256) == 4096
    assert plan_bucket_count(0) == 1
    assert plan_bucket_count(300 * mb, 256) == 2
    # any two planned counts divide one another (coalesceBucketsInJoin)
    a, b = plan_bucket_count(10**13), plan_bucket_count(10**10)
    assert max(a, b) % min(a, b) == 0
    # shuffle partitions: byte-sized, floored at core count
    assert plan_shuffle_partitions(10 * mb, 128, cpus=32) == 32
    assert plan_shuffle_partitions(100 * 1024 * mb, 128, cpus=32) == 800


def test_binary_file_source_feeds_the_decode_stack(spark):
    """Raw-file ingestion end-to-end: real WAV and BMP files written
    to a directory enter through the built-in binaryFile source and
    decode through the REAL codec kernels with the gates armed —
    payloads survive ingestion byte-exact, pruning never reads pruned
    payloads, and doc_ids are deterministic CONTENT hashes (same
    bytes under two names collapse to one id — the dedup-friendly
    convention; path-tail ids would collide across shard dirs)."""
    import hashlib
    import os
    import tempfile

    from thrivefinancedatapipeline_spark.multimodal import bmp, wav
    from thrivefinancedatapipeline_spark.sources.io import (
        read_binary_files,
    )

    d = tempfile.mkdtemp(prefix="binsrc_")
    try:
        samples = {}
        for i in range(3):
            s = [(b % 97) - 48 for b in hashlib.md5(
                f"w{i}".encode()).digest()]
            data = wav.encode_wav(s, sample_rate=8_000)
            with open(os.path.join(d, f"a{i}.wav"), "wb") as f:
                f.write(data)
            samples[f"a{i}.wav"] = (data, s)
        px = hashlib.md5(b"img").digest() * 3  # 4x4 RGB
        bdata = bmp.encode_bmp(px, 4, 4)
        with open(os.path.join(d, "img0.bmp"), "wb") as f:
            f.write(bdata)

        df = read_binary_files(spark, d)
        rows = {os.path.basename(r["path"]): r for r in df.collect()}
        assert set(rows) == {"a0.wav", "a1.wav", "a2.wav", "img0.bmp"}
        # payloads byte-exact; lengths agree; doc_ids distinct + stable
        for name, (data, s) in samples.items():
            assert bytes(rows[name]["payload"]) == data
            assert rows[name]["length"] == len(data)
            assert wav.decode_wav(bytes(rows[name]["payload"]))[
                "samples"
            ] == s
        assert bmp.decode_bmp(bytes(rows["img0.bmp"]["payload"]))[
            "pixels"
        ] == px
        ids = [r["doc_id"] for r in rows.values()]
        assert len(set(ids)) == 4
        # the id is the FULL 128-bit md5 hex of the content — a
        # truncated-long id is birthday-likely to collide near the
        # ~1.5B-doc design point (two distinct files collapsing)
        for name, (data, _) in samples.items():
            assert rows[name]["doc_id"] == hashlib.md5(data).hexdigest()
        again = {
            os.path.basename(r["path"]): r["doc_id"]
            for r in read_binary_files(spark, d).collect()
        }
        assert all(again[n] == rows[n]["doc_id"] for n in rows)
        # byte-identical content under a DIFFERENT name shares the id
        # (content-hash convention); a subdir copy with the SAME
        # basename gets listed recursively and collapses too
        os.makedirs(os.path.join(d, "sub"), exist_ok=True)
        with open(os.path.join(d, "sub", "a0.wav"), "wb") as f:
            f.write(samples["a0.wav"][0])
        all_rows = read_binary_files(spark, d).collect()
        dups = [
            r for r in all_rows
            if bytes(r["payload"]) == samples["a0.wav"][0]
        ]
        # recursive lookup really listed the subdir copy...
        assert len(dups) == 2 and len(all_rows) == 5
        # ...and both share the one content id
        assert {r["doc_id"] for r in dups} == {rows["a0.wav"]["doc_id"]}

        # glob + max_bytes prune by name and length at the source
        only_wav = read_binary_files(spark, d, glob="*.wav")
        assert only_wav.count() == 4  # 3 top-level + the subdir copy
        small = read_binary_files(
            spark, d, max_bytes=len(bdata) - 1
        )
        assert "img0.bmp" not in {
            os.path.basename(r["path"]) for r in small.collect()
        }
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_text_corpus_wholetext_one_doc_per_file(spark):
    """wholetext ingestion: each file IS a document (the raw-crawl
    drop layout), newlines preserved, doc_ids the same content-hash convention as
    the binary source."""
    import os
    import tempfile

    from thrivefinancedatapipeline_spark.sources.io import (
        read_text_corpus,
    )

    d = tempfile.mkdtemp(prefix="txtsrc_")
    try:
        docs = {
            "d0.txt": "first doc\nwith two lines\n",
            "d1.txt": "second doc, one line",
            "d2.txt": "third\n",
        }
        for name, text in docs.items():
            with open(os.path.join(d, name), "w") as f:
                f.write(text)
        # an EMPTY file yields no record in wholetext mode (Spark's
        # text source emits rows from content, not listings) — a
        # zero-byte drop silently contributes nothing, by design
        with open(os.path.join(d, "empty.txt"), "w"):
            pass
        rows = {
            os.path.basename(r["path"]): r
            for r in read_text_corpus(spark, d).collect()
        }
        assert set(rows) == set(docs)
        import hashlib

        for name, text in docs.items():
            assert rows[name]["text"] == text
            # full 128-bit md5 hex of the text — the key convention
            assert rows[name]["doc_id"] == hashlib.md5(
                text.encode()
            ).hexdigest()
        assert len({r["doc_id"] for r in rows.values()}) == 3
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
