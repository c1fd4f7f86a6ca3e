"""r20 optimization: the vectorized dedup kernels must be bit-identical
to the interpreted HOF folds they replaced.

The expression builders (_sim_pack/_SIM_PACK/_SIM_PACK_HS2 and the
exploded _minhash_per_doc aggregation) stay in the module as the
executable reference implementations; these tests pin kernel ==
expression on the real corpus so any drift in bit order, majority
tie-breaks, or (A_j*h + B_j) % P integer math fails loudly here
instead of surfacing as an oracle mismatch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thrivefinancedatapipeline_spark.functions.text import (  # noqa: E402
    md5_long,
    tokens,
)
from thrivefinancedatapipeline_spark.operators import dedup as D  # noqa: E402


def test_simhash_pack_kernel_matches_expression(spark, sf_dir):
    docs = D._docs(spark, sf_dir)
    toks = F.array_distinct(tokens(F.col("text")))
    hs = F.transform(toks, md5_long)
    ref = (
        docs.select("doc_id", hs.alias("hs"))
        .select(
            "doc_id",
            F.expr(f"CAST({D._SIM_PACK} AS BIGINT)").alias("simhash"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    got = D._simhash_df(docs).orderBy("doc_id").toPandas()
    assert ref.equals(got)


def test_simhash_wide_kernel_matches_expression(spark, sf_dir):
    docs = D._docs(spark, sf_dir)
    toks = F.array_distinct(tokens(F.col("text")))
    hs_lo = F.transform(toks, md5_long)
    hs_hi = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 16, 15), 16, 10).cast(
            "long"
        ),
    )
    ref = (
        docs.select("doc_id", hs_lo.alias("hs"), hs_hi.alias("hs2"))
        .select(
            "doc_id",
            F.expr(f"CAST({D._SIM_PACK} AS BIGINT)").alias("sim_lo"),
            F.expr(
                f"CAST({D._SIM_PACK_HS2} AS BIGINT)"
            ).alias("sim_hi"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    got = D._simhash_wide_df(docs).orderBy("doc_id").toPandas()
    assert ref.equals(got)


def test_simhash_kernel_degenerate_rows(spark):
    # empty token set -> 0 (the fold's zero accumulator); NULL text ->
    # NULL (aggregate(NULL) semantics); single token -> its own bits
    # (majority 2*1 > 1 at every set bit).
    docs = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "tok"), (4, "x y z w x y z w")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.simhash
        for r in D._simhash_df(docs).collect()
    }
    toks = F.array_distinct(tokens(F.col("text")))
    hs = F.transform(toks, md5_long)
    ref = {
        r.doc_id: r.simhash
        for r in docs.select(
            "doc_id", hs.alias("hs")
        ).select(
            "doc_id",
            F.expr(f"CAST({D._SIM_PACK} AS BIGINT)").alias("simhash"),
        ).collect()
    }
    assert got == ref
    assert got[2] is None  # NULL text -> NULL fingerprint


# NOTE: a minhash zero-shuffle kernel twin was tried and REVERTED this
# round (11-13 s vs 1.2 s at sf0.1 — interpreted per-element md5 beat
# by codegen-after-explode; see the r20 comment block in dedup.py), so
# only the simhash kernel has parity pins here.
