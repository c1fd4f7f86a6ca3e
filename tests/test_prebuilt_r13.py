"""Round-13 prebuilds (staged in tools/check_prebuilt.py in round 12):
Spark == DuckDB at two SFs plus per-operator invariants — the
pre-registration pin every prebuilt catalog since r5 has used.

The r12 theme is end-to-end attestation: corpus_pipeline_attest folds
the ENTIRE run_corpus_pipeline funnel (decontaminate -> dedup ->
quality gate -> chunk -> chunk-dedup -> pack) into one oracled
relation whose counts are identity-pinned against the pipeline's own
driver-side report — the composition and its audit cannot drift."""

import os

import duckdb


def _duck(d, sql, tables=("documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def _dirs(sf_dir):
    return [
        d
        for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01"))
        if os.path.isdir(d)
    ]


def test_corpus_pipeline_attest_vs_duckdb_and_funnel_shape(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.quality import (
        PIPELINE_ATTEST_ORACLE,
        PIPELINE_STAGES,
        corpus_pipeline_attest,
    )

    for d in _dirs(sf_dir):
        got = sorted(
            tuple(r) for r in corpus_pipeline_attest(spark, d).collect()
        )
        want = sorted(tuple(r) for r in _duck(d, PIPELINE_ATTEST_ORACLE))
        assert got == want, f"corpus_pipeline_attest mismatch at {d}"
        by_ord = {r[0]: r for r in got}
        assert [by_ord[i][1] for i in range(1, 8)] == list(PIPELINE_STAGES)
        # the doc funnel strictly filters: counts monotone non-increasing
        doc_counts = [by_ord[i][2] for i in range(1, 5)]
        assert doc_counts == sorted(doc_counts, reverse=True)
        assert doc_counts[-1] > 0, "quality gate emptied the corpus"
        # chunk dedup only removes: rows and tokens shrink or hold
        assert by_ord[6][2] <= by_ord[5][2]
        assert by_ord[6][3] <= by_ord[5][3]
        # packing is a pure re-labeling of the unique chunks: token
        # total identical, and every pack except at most one tail per
        # lang stream is implied full (n_packs * budget >= tokens)
        assert by_ord[7][3] == by_ord[6][3]
        from thrivefinancedatapipeline_spark.operators.packing import (
            PACK_BUDGET,
        )

        assert by_ord[7][2] * PACK_BUDGET >= by_ord[7][3]
        # membership checksums attest real sets (0 = empty stage)
        assert all(by_ord[i][4] != 0 for i in range(1, 8))
        # a shrinking stage must CHANGE the membership checksum
        for a, b in ((1, 4), (5, 6)):
            if by_ord[a][2] != by_ord[b][2]:
                assert by_ord[a][4] != by_ord[b][4]


def test_corpus_pipeline_attest_matches_pipeline_report(spark, sf_dir):
    """The identity pin: the oracled attest's stage figures equal the
    driver-side report run_corpus_pipeline computes for itself — the
    audit and the pipeline cannot drift."""
    from thrivefinancedatapipeline_spark.operators.quality import (
        corpus_pipeline_attest,
    )
    from thrivefinancedatapipeline_spark.pipeline import (
        run_corpus_pipeline,
    )

    report = run_corpus_pipeline(spark, sf_dir)
    by_ord = {
        r["stage_ord"]: r
        for r in (
            x.asDict() for x in corpus_pipeline_attest(spark, sf_dir).collect()
        )
    }
    assert by_ord[1]["n_rows"] == report["n_documents"]
    assert by_ord[2]["n_rows"] == report["n_after_decontaminate"]
    assert by_ord[3]["n_rows"] == report["n_after_dedup"]
    assert by_ord[4]["n_rows"] == report["n_after_quality_gate"]
    assert by_ord[5]["n_rows"] == report["n_chunks"]
    assert by_ord[6]["n_rows"] == report["n_unique_chunks"]
    assert by_ord[7]["n_rows"] == report["n_packs"]
    assert by_ord[7]["n_tokens"] == report["total_tokens"]


def test_codec_attest5_vs_duckdb_and_stream_order(spark, sf_dir):
    from thrivefinancedatapipeline_spark.multimodal.binary_ops import (
        CODEC_ATTEST5_ORACLE,
        q_multimodal_codec_attest5,
    )

    for d in _dirs(sf_dir):
        got = sorted(
            tuple(r)
            for r in q_multimodal_codec_attest5(spark, d).collect()
        )
        want = sorted(tuple(r) for r in _duck(d, CODEC_ATTEST5_ORACLE))
        assert got == want, f"codec_attest5 mismatch at {d}"
        # pixels are bytes: the AVI column is strictly positive; the
        # PCM columns mix signs by construction (digits pull negative,
        # letters positive) — across a corpus both signs must appear
        # in the SAMPLE domain, and every sample exceeds int16, so a
        # width-truncating decode could not have matched the oracle
        assert all(r[1] > 0 for r in got)
        assert len({r[2] for r in got}) > 1
        assert len({r[3] for r in got}) > 1


def test_avi_audio_first_encoder_is_pixel_identical():
    """audio_first only PREPENDS a stream declaration: the decoded
    video is byte-identical to the single-stream form, and the
    container still round-trips through the chunk walker."""
    import hashlib

    from thrivefinancedatapipeline_spark.multimodal import avi

    px = hashlib.md5(b"order").digest() * 3  # 48 bytes = 4x4 RGB
    plain = avi.encode_avi_dib([px], 4, 4, fps=5)
    afirst = avi.encode_avi_dib([px], 4, 4, fps=5, audio_first=True)
    assert afirst != plain  # the audio strl is really in there
    dp = avi.decode_avi_frames(plain)
    da = avi.decode_avi_frames(afirst)
    assert [f["pixels"] for f in dp] == [f["pixels"] for f in da] == [px]
    assert avi.avi_stream_info(afirst)["handler"] == b"DIB "
    # container transparency holds in both forms
    assert avi.avi_frame_chunks(plain) == avi.avi_frame_chunks(afirst)
