"""r19 optimization: the vectorized exact-integer ANN kernels must be
bit-identical to the literal-expression builders they replaced.

The expression builders (_cell_structs, _coarse_map_expr,
_pq_encode_expr, _pq_lut_expr) stay in the module as the executable
reference implementations; these tests pin kernel == expression on the
real corpus so any future drift in tie-breaks, flat-index offsets, or
integer math fails loudly here instead of surfacing as an oracle
mismatch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thrivefinancedatapipeline_spark.operators import similarity as S  # noqa: E402


def _iv(spark, sf_dir):
    return S._int_vecs(spark, sf_dir)


def _quantizer(spark, sf_dir):
    iv = _iv(spark, sf_dir)
    coarse = S._trained_centroids_cached(spark, sf_dir, iv)
    books = S._ivfpq_books_cached(sf_dir, iv, coarse)
    return iv, coarse, books


def test_assign_and_probe_kernels_match_expressions(spark, sf_dir):
    iv, coarse, _books = _quantizer(spark, sf_dir)
    structs = S._cell_structs(coarse)
    ref = iv.select(
        "vec_id",
        F.array_min(structs).getField("cell").alias("cell"),
        F.array_min(structs).getField("d").alias("d2"),
    ).orderBy("vec_id").toPandas()
    k = S.pd_assign_cells(coarse, with_d2=True)
    got = (
        iv.select("vec_id", k("xi").alias("a"))
        .select("vec_id", F.col("a.cell").alias("cell"),
                F.col("a.d2").alias("d2"))
        .orderBy("vec_id").toPandas()
    )
    assert ref.equals(got)

    for n_probe in (1, S.N_PROBE, S.KM_K):
        ref_p = (
            iv.select(
                "vec_id",
                F.explode(
                    F.slice(F.array_sort(structs), 1, n_probe)
                ).alias("pc"),
            )
            .select("vec_id", F.col("pc.cell").alias("cell"))
            .orderBy("vec_id", "cell").toPandas()
        )
        got_p = (
            iv.select(
                "vec_id",
                F.explode(
                    S.pd_probe_cells(coarse, n_probe)("xi")
                ).alias("cell"),
            )
            .orderBy("vec_id", "cell").toPandas()
        )
        assert ref_p.equals(got_p), n_probe


def test_ivfpq_encode_kernel_matches_expressions(spark, sf_dir):
    iv, coarse, books = _quantizer(spark, sf_dir)
    structs = S._cell_structs(coarse)
    cmap = S._coarse_map_expr(coarse)
    ref = (
        iv.select(
            F.col("vec_id").alias("neighbor_id"), "xi",
            F.array_min(structs).getField("cell").alias("cell"),
        )
        .withColumn(
            "res",
            F.expr(f"zip_with(xi, element_at({cmap}, cell), "
                   "(x, c) -> x - c)"),
        )
        .select(
            "neighbor_id", "cell",
            S._pq_encode_expr(books, col="res").alias("codes"),
        )
        .orderBy("neighbor_id").toPandas()
    )
    got = (
        S._ivfpq_encode(iv, coarse, books).orderBy("neighbor_id").toPandas()
    )
    ref["codes"] = ref["codes"].apply(list)
    got["codes"] = got["codes"].apply(list)
    assert ref.equals(got)


def test_ivfpq_probe_luts_match_expressions(spark, sf_dir):
    iv, coarse, books = _quantizer(spark, sf_dir)
    structs = S._cell_structs(coarse)
    cmap = S._coarse_map_expr(coarse)
    ref = (
        iv.filter(F.col("vec_id") < S.N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"), "xi",
            F.explode(
                F.slice(F.array_sort(structs), 1, S.N_PROBE)
            ).alias("pc"),
        )
        .select("query_id", "xi", F.col("pc.cell").alias("cell"))
        .withColumn(
            "qres",
            F.expr(f"zip_with(xi, element_at({cmap}, cell), "
                   "(x, c) -> x - c)"),
        )
        .select(
            "query_id", "cell",
            S._pq_lut_expr(books, col="qres").alias("lut"),
        )
        .orderBy("query_id", "cell").toPandas()
    )
    got = (
        S._ivfpq_probes(iv, coarse, books)
        .orderBy("query_id", "cell").toPandas()
    )
    ref["lut"] = ref["lut"].apply(list)
    got["lut"] = got["lut"].apply(list)
    assert ref.equals(got)


def test_flat_pq_kernels_match_expressions(spark, sf_dir):
    iv = _iv(spark, sf_dir)
    books = S._pq_codebooks_cached(sf_dir, iv)
    ref_c = iv.select(
        "vec_id", S._pq_encode_expr(books).alias("codes")
    ).orderBy("vec_id").toPandas()
    got_c = iv.select(
        "vec_id", S.pd_pq_encode(books)("xi").alias("codes")
    ).orderBy("vec_id").toPandas()
    ref_c["codes"] = ref_c["codes"].apply(list)
    got_c["codes"] = got_c["codes"].apply(list)
    assert ref_c.equals(got_c)

    q = iv.filter(F.col("vec_id") < S.N_QUERIES)
    ref_l = q.select(
        "vec_id", S._pq_lut_expr(books).alias("lut")
    ).orderBy("vec_id").toPandas()
    got_l = q.select(
        "vec_id", S.pd_pq_lut(books)("xi").alias("lut")
    ).orderBy("vec_id").toPandas()
    ref_l["lut"] = ref_l["lut"].apply(list)
    got_l["lut"] = got_l["lut"].apply(list)
    assert ref_l.equals(got_l)


def test_unrolled_adc_matches_aggregate_fold(spark, sf_dir):
    iv, coarse, books = _quantizer(spark, sf_dir)
    codes = S._ivfpq_encode(iv, coarse, books)
    probes = S._ivfpq_probes(iv, coarse, books)
    joined = F.broadcast(probes).join(codes, "cell")
    both = joined.select(
        F.expr(S._ADC_EXPR).alias("unrolled"),
        F.expr(
            "aggregate(codes, 0L, (acc, i) -> acc + element_at(lut, i))"
        ).alias("folded"),
    )
    assert both.filter(F.col("unrolled") != F.col("folded")).count() == 0
    assert both.count() > 0
