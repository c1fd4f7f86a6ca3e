"""Dedup operator unit tests on literal documents."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.functions.text import normalize, shingles
from thrivefinancedatapipeline_spark.operators import dedup


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )


def test_shingles_basic(spark):
    df = spark.range(1).select(F.lit("a b c d").alias("text"))
    out = df.select(shingles(F.col("text")).alias("s")).collect()[0].s
    assert out == ["a b c", "b c d"]


def test_shingles_short_doc_empty(spark):
    df = spark.range(1).select(F.lit("a b").alias("text"))
    out = df.select(shingles(F.col("text")).alias("s")).collect()[0].s
    assert out == []


def test_normalization_collapses_case_and_space(spark):
    df = docs_df(spark, ["Hello  World", "hello world", "different doc"])
    hashed = df.select(F.md5(normalize(F.col("text"))).alias("h")).collect()
    assert hashed[0].h == hashed[1].h
    assert hashed[0].h != hashed[2].h


def test_ngram_jaccard_finds_near_dup(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog near the barn today",
        "the quick brown fox jumps over the lazy dog near the barn tonight",
        "completely different words in this sentence here and now friends",
    ]  # 12 tokens, one differing → J = 9/11 ≈ 0.82 ≥ 0.8
    sh = dedup._shingle_rows(docs_df(spark, texts))
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), "sh")
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), "sh")
    pairs = (
        s1.join(s2, "sh")
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2")
        .distinct()
    )
    out = dedup._verified_pairs(pairs, sh).collect()
    assert [(r.doc_id_1, r.doc_id_2) for r in out] == [(0, 1)]


def test_minhash_matches_exact_jaccard(spark, sf_dir):
    """LSH must find every pair the exact operator finds at this SF
    (high-similarity pairs collide in >=1 band with these params)."""
    exact = {
        (r.doc_id_1, r.doc_id_2)
        for r in dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_id_1, r.doc_id_2)
        for r in dedup.q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh == exact


def test_simhash_near_dup_small_hamming(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",
    ]
    sims = {
        r.doc_id: r.simhash
        for r in dedup._simhash_df(docs_df(spark, texts)).collect()
    }
    ham = bin(sims[0] ^ sims[1]).count("1")
    assert 0 < ham <= 20  # one-token change moves few of 60 bits


def test_hot_shingle_df_cap_bounds_candidates(spark, monkeypatch):
    """A boilerplate shingle shared by every doc must NOT generate the
    quadratic all-pairs candidate set; docs that only share capped
    (hot) shingles produce no pairs, while genuinely near-dup docs
    still match through their rare shingles."""
    monkeypatch.setattr(dedup, "MAX_SHINGLE_DF", 3)
    boiler = "terms of service apply to this content"
    texts = [f"{boiler} unique{i} filler{i} main{i} body{i} words{i}" for i in range(8)]
    # two near-dups sharing rare shingles (one trailing token differs)
    texts += [
        "the quick brown fox jumps over the lazy dog near the barn today",
        "the quick brown fox jumps over the lazy dog near the barn tonight",
    ]
    docs = docs_df(spark, texts)
    monkeypatch.setattr(dedup, "_docs", lambda spark, sf_dir: docs)
    out = dedup.q_dedup_ngram_jaccard(spark, "ignored").collect()
    pairs = {(r.doc_id_1, r.doc_id_2) for r in out}
    # boilerplate-only docs (jaccard < 0.8 anyway) contribute nothing;
    # crucially the candidate join never saw the 8*7/2 hot-shingle pairs
    assert pairs == {(8, 9)}


def test_all_hot_shingles_recall_escape_hatch(spark, monkeypatch):
    """A mass-replicated doc whose EVERY shingle is above the DF cap
    must still pair with its replicas: each doc keeps its
    RARE_KEEP_PER_DOC lowest-DF shingles in the index regardless of
    the cap, so the cluster collides on those instead of vanishing."""
    monkeypatch.setattr(dedup, "MAX_SHINGLE_DF", 3)
    texts = ["the quick brown fox jumps over the lazy dog today"] * 8
    docs = docs_df(spark, texts)
    monkeypatch.setattr(dedup, "_docs", lambda spark, sf_dir: docs)
    out = dedup.q_dedup_ngram_jaccard(spark, "ignored").collect()
    pairs = {(r.doc_id_1, r.doc_id_2) for r in out}
    assert pairs == {(i, j) for i in range(8) for j in range(i + 1, 8)}


def test_graph_stats_wedge_budget_guard(spark, monkeypatch):
    """Past the wedge budget the join must not launch: fail fast with
    the exact pre-computed wedge count."""
    import pytest

    pairs = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (1, 3, 0), (3, 4, 0)],
        "doc_id_1 long, doc_id_2 long, hamming int",
    )
    monkeypatch.setattr(
        dedup, "q_dedup_simhash_pairs", lambda spark, sf_dir: pairs
    )
    monkeypatch.setattr(dedup, "WEDGE_BUDGET", 0)
    with pytest.raises(RuntimeError, match="1 wedges"):
        dedup.q_dedup_graph_stats(spark, "ignored")


def test_embedding_cosine_guard_trips(spark, monkeypatch, sf_dir):
    """The exact O(n^2) path must refuse large corpora unless forced."""
    import pytest

    monkeypatch.setattr(dedup, "EXACT_COSINE_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        dedup.q_dedup_embedding_cosine(spark, sf_dir)
    # explicit opt-in still works
    assert dedup.q_dedup_embedding_cosine(spark, sf_dir, exact=True).count() >= 0


def test_graph_stats_triangle_plus_pendant(spark, monkeypatch):
    from thrivefinancedatapipeline_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 0), (1, 3, 0), (3, 4, 0)],
        "doc_id_1 long, doc_id_2 long, hamming int",
    )
    monkeypatch.setattr(
        dedup, "q_dedup_simhash_pairs", lambda spark, sf_dir: pairs
    )
    row = dedup.q_dedup_graph_stats(spark, "ignored").collect()[0]
    assert (row.n_edges, row.n_wedges, row.n_triangles) == (4, 1, 1)


def test_substring_spans_invariants_and_python_twin(spark, sf_dir):
    """Span accounting invariants (every span is >= L tokens, coverage
    never exceeds the doc, positions >= spans) plus an exact
    driver-side Python recompute of the full pipeline on the corpus."""
    from collections import defaultdict
    import hashlib
    import re

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.dedup import (
        SPAN_L,
        q_dedup_substring_spans,
    )

    rows = {r.doc_id: r for r in q_dedup_substring_spans(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)

    # python twin
    toks = {
        d.doc_id: re.sub(r"\s+", " ", d.text).strip().lower().split(" ")
        for d in docs
    }
    gram_docs = defaultdict(set)
    positions = {}
    for did, ts in toks.items():
        ps = []
        for i in range(len(ts) - SPAN_L + 1):
            h = hashlib.md5(" ".join(ts[i : i + SPAN_L]).encode()).hexdigest()
            ps.append((i + 1, h))
            gram_docs[h].add(did)
        positions[did] = ps
    for did, ts in toks.items():
        hit_pos = sorted(
            p for p, h in positions[did] if len(gram_docs[h]) >= 2
        )
        n_spans = dup_tokens = 0
        prev = None
        for p in hit_pos:
            if prev is None or p > prev + SPAN_L:
                n_spans += 1
            dup_tokens += SPAN_L if prev is None else min(SPAN_L, p - prev)
            prev = p
        r = rows[did]
        assert r.n_tokens == len(ts)
        assert r.n_dup_positions == len(hit_pos)
        assert r.n_spans == n_spans
        assert r.dup_tokens == dup_tokens
        assert r.dup_tokens <= r.n_tokens
        assert r.dup_tokens >= SPAN_L * r.n_spans or r.n_spans == 0
        assert r.dup_ppm == dup_tokens * 1_000_000 // len(ts)


def test_source_overlap_matrix_python_twin(spark, sf_dir):
    """Feed-level contamination rollup equals a driver-side recompute:
    shared distinct 8-token grams per source pair."""
    import hashlib
    import re
    from collections import defaultdict
    from itertools import combinations

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.dedup import (
        SPAN_L,
        source_overlap_matrix,
    )

    got = {
        (r.source_1, r.source_2): r.shared_grams
        for r in source_overlap_matrix(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    by_source = defaultdict(set)
    for d in docs.collect():
        ts = re.sub(r"\s+", " ", d.text).strip().lower().split(" ")
        for i in range(len(ts) - SPAN_L + 1):
            h = hashlib.md5(" ".join(ts[i : i + SPAN_L]).encode()).hexdigest()
            by_source[d.source].add(h)
    want = {}
    for s1, s2 in combinations(sorted(by_source), 2):
        n = len(by_source[s1] & by_source[s2])
        if n:
            want[(s1, s2)] = n
    assert got == want
    assert len(got) > 0  # synthetic corpus has cross-source overlap


def test_kcore_matches_exact_python_reference(spark, sf_dir):
    """k-core parity with an exact driver-side peeling reference over
    the same collected edge list (iterative ops aren't
    SQL-expressible — the dedup_clusters pattern), plus the defining
    properties: every surviving vertex keeps >= k within-core
    neighbors, and no peeled vertex could survive (maximality via
    uniqueness of the k-core)."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        KCORE_K,
        kcore_decompose,
        q_dedup_simhash_pairs,
    )

    pairs = {
        (r.doc_id_1, r.doc_id_2)
        for r in q_dedup_simhash_pairs(spark, sf_dir)
        .select("doc_id_1", "doc_id_2")
        .collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive
                if len(adj[v] & alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    want = {v: len(adj[v] & alive) for v in alive}

    got = {
        r.doc_id: r.core_deg
        for r in kcore_decompose(spark, sf_dir).collect()
    }
    assert got == want
    for v, d in got.items():
        assert d >= KCORE_K


def test_dedup_containment_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for asymmetric containment dedup: Spark
    == DuckDB oracle at two SFs; containment >= Jaccard on shared
    pairs (min-denominator dominance) and the threshold really holds
    on every emitted row."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.operators.dedup import (
        CONTAIN_DEN,
        CONTAIN_NUM,
        CONTAINMENT_ORACLE,
        dedup_containment,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = dedup_containment(spark, d).collect()
        got = sorted(
            (r.doc_id_1, r.doc_id_2, r.common_shingles, r.shingles_1,
             r.shingles_2, r.contain_1_ppm, r.contain_2_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(CONTAINMENT_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"containment mismatch at {d}"
        for r in rows:
            mn = min(r.shingles_1, r.shingles_2)
            assert CONTAIN_DEN * r.common_shingles >= CONTAIN_NUM * mn
            assert max(r.contain_1_ppm, r.contain_2_ppm) >= 800_000


def test_lsh_recall_audit_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the banding self-audit: Spark ==
    DuckDB oracle at two SFs; caught <= true <= pairs; recall at or
    above the theoretical floor when true dups exist (1-(1-J^4)^4 at
    J=0.8 is ~0.88 — assert a loose 0.5 to avoid overfitting the
    synthetic corpus)."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.operators.dedup import (
        LSH_RECALL_ORACLE,
        lsh_recall_audit,
    )

    saw_true = False
    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        r = lsh_recall_audit(spark, d).collect()[0]
        got = (r.n_sample_docs, r.n_pairs, r.n_true, r.n_caught,
               r.recall_ppm)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = tuple(
            int(x) for x in con.execute(LSH_RECALL_ORACLE).fetchall()[0]
        )
        con.close()
        assert got == want, f"recall audit mismatch at {d}: {got} {want}"
        assert r.n_caught <= r.n_true <= r.n_pairs
        assert r.n_pairs == r.n_sample_docs * (r.n_sample_docs - 1) // 2
        if r.n_true:
            saw_true = True
            assert r.recall_ppm >= 500_000, got
    assert saw_true, "audit sample contained no true near-dups anywhere"
