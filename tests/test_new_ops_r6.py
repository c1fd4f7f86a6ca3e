"""Round-6 operator additions: tokenizer fertility, bigram
familiarity, and embedding source drift — Python-twin and invariant
pins on top of the Spark==DuckDB oracle rows the driver checks."""

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import load_table


def _toks(text):
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def test_bpe_fertility_invariants_and_total(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.textops import (
        q_bpe_apply,
        q_bpe_fertility,
    )

    rows = q_bpe_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a word is at least one piece; a piece is at least one char
        assert r.fertility_ppm >= 1_000_000
        assert r.chars_per_subword_ppm >= 1_000_000
        assert r.n_subwords >= r.n_words
        assert r.n_chars >= r.n_subwords
    # the per-lang rollup accounts for exactly the words bpe_apply
    # counts per document
    total_words = sum(r.n_words for r in rows)
    apply_words = (
        q_bpe_apply(spark, sf_dir).agg(F.sum("n_words")).collect()[0][0]
    )
    assert total_words == apply_words


def test_bigram_familiarity_python_twin(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.textops import (
        q_corpus_bigram_familiarity,
    )

    got = {
        r.doc_id: r
        for r in q_corpus_bigram_familiarity(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    corpus = Counter()
    per_doc = defaultdict(list)
    for d in docs:
        ts = _toks(d.text)
        bgs = [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        per_doc[d.doc_id] = bgs
        corpus.update(bgs)
    assert set(got) == {d.doc_id for d in docs}
    for d in docs:
        bgs = per_doc[d.doc_id]
        r = got[d.doc_id]
        assert r.n_bigrams == len(bgs)
        fam = sum(corpus[b] for b in bgs)
        assert r.fam_sum == fam
        assert r.fam_avg == (fam // len(bgs) if bgs else 0)
        if bgs:
            assert r.fam_avg >= 1  # every bigram matches itself


def test_embedding_source_drift_invariants(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.similarity import (
        q_embedding_source_drift,
    )

    rows = q_embedding_source_drift(spark, sf_dir).collect()
    assert rows
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    globals_ = {r.global_norm_sq for r in rows}
    assert len(globals_) == 1  # one shared global centroid
    for r in rows:
        assert r.norm_sq >= 0 and r.global_norm_sq > 0
        # squared cosine is <= 1 exactly; ppm magnitude bounded
        assert abs(r.cos2_ppm_signed) <= 1_000_000


def test_corpus_zipf_audit_invariants(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.textops import (
        ZIPF_RANKS,
        q_corpus_zipf_audit,
    )

    rows = {r.r: r for r in q_corpus_zipf_audit(spark, sf_dir).collect()}
    assert set(rows) <= set(ZIPF_RANKS)
    assert rows  # at least the head ranks exist
    for r in rows.values():
        # frequencies are rank-ordered, so every octave ratio >= 1
        assert r.freq_r >= r.freq_2r
        assert r.ratio_ppm >= 1_000_000
        assert r.ratio_ppm == r.freq_r * 1_000_000 // r.freq_2r


def test_knn_ivfpq_recall_audit_consistency(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ivfpq_knn,
        knn_ivfpq_recall_audit,
        q_knn_bruteforce_cosine,
    )

    rows = {r.query_id: r for r in
            knn_ivfpq_recall_audit(spark, sf_dir).collect()}
    assert len(rows) == N_QUERIES
    bf = {(r.query_id, r.neighbor_id)
          for r in q_knn_bruteforce_cosine(spark, sf_dir).collect()}
    iv = {(r.query_id, r.neighbor_id)
          for r in ivfpq_knn(spark, sf_dir).collect()}
    for q, r in rows.items():
        expect = len({p for p in bf if p[0] == q} & iv)
        assert r.n_hits == expect
        assert 0 <= r.n_hits <= TOP_K
        assert r.recall_ppm == r.n_hits * 1_000_000 // TOP_K
