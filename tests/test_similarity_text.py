"""Similarity-search and text-analysis operator tests."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.functions.text import normalize, tokens
from thrivefinancedatapipeline_spark.operators import similarity, textops


def test_knn_bruteforce_shape(spark, sf_dir):
    out = similarity.q_knn_bruteforce_cosine(spark, sf_dir).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r.rank)
    assert set(by_query) == set(range(similarity.N_QUERIES))
    for ranks in by_query.values():
        assert sorted(ranks) == list(range(1, similarity.TOP_K + 1))


def test_knn_excludes_self(spark, sf_dir):
    out = similarity.q_knn_bruteforce_cosine(spark, sf_dir).collect()
    assert all(r.query_id != r.neighbor_id for r in out)


def test_knn_lsh_bounded(spark, sf_dir):
    out = similarity.q_knn_lsh(spark, sf_dir)
    assert out.count() <= similarity.N_QUERIES * similarity.TOP_K


def test_lang_id_rules(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog in the house"),
            Row(doc_id=2, text="el perro y el gato en la casa que es"),
            Row(doc_id=3, text="zzz qqq xxx"),
        ],
        schema="doc_id long, text string",
    )
    toks = tokens(F.col("text"))
    hits = {lang: textops._stop_hits(toks, lang) for lang in textops.LANG_ORDER}
    pred = F.lit("und")
    for lang in reversed(textops.LANG_ORDER):
        cond = hits[lang] > 0
        for o in textops.LANG_ORDER:
            if o != lang:
                cond = cond & (hits[lang] >= hits[o])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    got = {r.doc_id: r.p for r in docs.select("doc_id", pred.alias("p")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_fingerprint_stability(spark, sf_dir):
    a = textops.q_text_fingerprint(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    b = textops.q_text_fingerprint(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    assert a == b
    assert all(r.fingerprint >= 0 for r in a)


def test_token_count_matches_python(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="  Foo  bar   BAZ ")],
        schema="doc_id long, text string",
    )
    out = docs.select(
        F.size(tokens(F.col("text"))).alias("n"),
        F.length(normalize(F.col("text"))).alias("c"),
    ).collect()[0]
    assert out.n == 3
    assert out.c == len("foo bar baz")
