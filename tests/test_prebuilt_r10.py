"""Round-10 prebuilds (staged in tools/check_prebuilt.py): Spark ==
DuckDB at two SFs plus per-operator invariants — the
pre-registration pin the r5–r9 prebuilt catalogs used."""

import os

import duckdb


def _duck(d, sql, tables=("documents",)):
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


def test_source_token_cost_curve_vs_duckdb_and_bounds(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.packing import (
        PACK_BUDGET,
        SOURCE_TOKEN_COST_CURVE_ORACLE,
        TOKEN_COST_GRID,
        source_token_cost_curve,
    )

    for d in _dirs(sf_dir):
        got = sorted(
            tuple(r)
            for r in source_token_cost_curve(spark, d).collect()
        )
        want = sorted(
            tuple(r)
            for r in _duck(d, SOURCE_TOKEN_COST_CURVE_ORACLE)
        )
        assert got == want, f"source_token_cost_curve mismatch at {d}"
        srcs = {r[0] for r in got}
        # full grid per source, no dropped cells
        assert len(got) == len(srcs) * len(TOKEN_COST_GRID)
        for (src, win, stride, n_docs, raw, nch, ctoks, packs,
             blowup, fill) in got:
            assert (win, stride) in TOKEN_COST_GRID
            assert n_docs >= 1 and raw >= n_docs  # >= 1 token per doc
            assert nch >= n_docs                  # >= 1 chunk per doc
            assert ctoks >= raw                   # overlap only adds
            assert packs == (ctoks + PACK_BUDGET - 1) // PACK_BUDGET
            # definition invariants (the fill<=1e6 rule that caught
            # packing_efficiency's undercounted tail)
            assert 0 < fill <= 1_000_000
            assert blowup >= 1_000_000
            assert blowup == ctoks * 1_000_000 // raw
            if win == stride:
                # no overlap => chunking is a pure partition of the
                # token stream
                assert ctoks == raw and blowup == 1_000_000


def test_token_cost_curve_matches_real_chunker_at_production_point(
    spark, sf_dir
):
    """The closed-form cell arithmetic equals the materializing
    chunker at the production (CHUNK_TOKENS, CHUNK_STRIDE) point:
    per source, n_chunks and chunk_tokens match q_corpus_chunk
    exactly — the curve prices what the pipeline actually ships."""
    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.packing import (
        source_token_cost_curve,
    )
    from thrivefinancedatapipeline_spark.operators.textops import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q_corpus_chunk,
    )

    d = sf_dir
    curve = {
        r["source"]: (r["n_chunks"], r["chunk_tokens"])
        for r in source_token_cost_curve(spark, d).collect()
        if r["win_tokens"] == CHUNK_TOKENS
        and r["stride_tokens"] == CHUNK_STRIDE
    }
    src = load_table(spark, d, "documents").select("doc_id", "source")
    real = {
        r["source"]: (r["n"], r["t"])
        for r in q_corpus_chunk(spark, d)
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("t"),
        )
        .collect()
    }
    assert curve == real
