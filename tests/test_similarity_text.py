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


def test_decontaminate_flags_only_nonbench_overlaps(spark, monkeypatch):
    """Docs sharing a 3-gram with a benchmark doc are flagged with the
    right overlap count; benchmark docs themselves and non-overlapping
    docs never appear."""
    monkeypatch.setattr(textops, "BENCH_DOC_MOD", 5)
    rows = [
        Row(doc_id=0, text="alpha beta gamma delta", lang="en",
            source="s", n_chars=1),          # benchmark (0 % 5 == 0)
        Row(doc_id=1, text="alpha beta gamma epsilon", lang="en",
            source="s", n_chars=1),          # shares 'alpha beta gamma'
        Row(doc_id=2, text="zeta eta theta iota", lang="en",
            source="s", n_chars=1),          # clean
        Row(doc_id=3, text="beta gamma delta kappa", lang="en",
            source="s", n_chars=1),          # shares 'beta gamma delta'
    ]
    docs = spark.createDataFrame(rows)
    monkeypatch.setattr(textops, "_docs", lambda spark, sf_dir: docs)
    out = {
        r.doc_id: r.n_contaminated_shingles
        for r in textops.q_corpus_decontaminate(spark, "ignored").collect()
    }
    assert out == {1: 1, 3: 1}


def test_mixture_weights_shares_sum_to_ppm(spark, sf_dir):
    rows = textops.q_corpus_mixture_weights(spark, sf_dir).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    share_sum = sum(r.share_ppm for r in rows)
    # floor division: sum of shares within |cells| ppm of 1e6
    assert 1_000_000 - len(rows) <= share_sum <= 1_000_000
    for r in rows:
        assert r.share_ppm == r.n_tokens * 1_000_000 // total_tokens


def test_repeat_factors_cap_and_equalization(spark, sf_dir):
    rows = textops.q_corpus_repeat_factors(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        want = min(4_000_000, total * 1_000_000 // (len(rows) * r.n_tokens))
        assert r.repeat_ppm == want
    # repeating each lang by its factor moves shares toward uniform:
    # every capped-below lang ends within one epoch of the target
    for r in rows:
        if r.repeat_ppm < 4_000_000:
            eff = r.n_tokens * r.repeat_ppm / 1_000_000
            assert abs(eff - total / len(rows)) <= r.n_tokens


def test_quality_gate_keeps_top_half_per_lang(spark, sf_dir):
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.quality import (
        q_quality_gate_by_lang,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_per_lang = {
        r.lang: r.n for r in docs.groupBy("lang").agg(
            F.count("*").alias("n")).collect()
    }
    kept = q_quality_gate_by_lang(spark, sf_dir).collect()
    kept_per_lang = {}
    for r in kept:
        kept_per_lang[r.lang] = kept_per_lang.get(r.lang, 0) + 1
    for lang, n in n_per_lang.items():
        assert kept_per_lang.get(lang, 0) == n // 2


def test_bpe_train_k_merge_list_properties(spark, sf_dir):
    """BPE training invariants: K rows, one per round; winning pair
    counts are non-increasing (a merge can only remove occurrences of
    existing pairs, and pairs born from the new symbol inherit at most
    its count); merged symbols are distinct; and round 1 equals
    bpe_merge_candidates' rank-1 pair."""
    from thrivefinancedatapipeline_spark.operators.textops import (
        BPE_ROUNDS,
        q_bpe_merge_candidates,
        q_bpe_train_k,
    )

    rows = sorted(q_bpe_train_k(spark, sf_dir).collect())
    assert [r["round"] for r in rows] == list(range(1, BPE_ROUNDS + 1))
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len({r["merged"] for r in rows}) == BPE_ROUNDS
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]
    top1 = q_bpe_merge_candidates(spark, sf_dir).filter("rank = 1").collect()
    # bpe_merge_candidates pairs CHARACTERS of raw words (incl.
    # non-alnum), train_k pairs symbols of the alnum vocab — round 1
    # agrees whenever the global winner is alnum, which it is here
    assert rows[0]["merged"] == top1[0]["pair"]
    assert rows[0]["pair_count"] == top1[0]["pair_count"]


def test_bpe_apply_matches_reference_python_bpe(spark, sf_dir):
    """Tokenizing with the trained merges must match a reference
    Python BPE (Sennrich-style greedy merge applied in order) word for
    word; plus count invariants (words <= subwords <= chars)."""
    import re
    from collections import Counter

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.textops import (
        q_bpe_apply,
        q_bpe_train_k,
    )

    merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(
            q_bpe_train_k(spark, sf_dir).collect(), key=lambda r: r["round"]
        )
    ]

    def bpe(word):
        syms = list(word)
        for l_s, r_s in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l_s
                    and syms[i + 1] == r_s
                ):
                    out.append(l_s + r_s)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {r.doc_id: r for r in q_bpe_apply(spark, sf_dir).collect()}
    for d in docs.collect():
        words = [
            w
            for w in re.sub(r"\s+", " ", d.text).strip().lower().split(" ")
            if re.fullmatch(r"[a-z0-9]+", w)
        ]
        counts = Counter(words)
        n_sub = sum(len(bpe(w)) * c for w, c in counts.items())
        n_chars = sum(len(w) * c for w, c in counts.items())
        r = got[d.doc_id]
        assert r.n_words == len(words)
        assert r.n_subwords == n_sub
        assert r.n_chars == n_chars
        assert r.n_words <= r.n_subwords <= r.n_chars or r.n_words == 0


def test_corpus_bigram_coverage_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the bigram-LM coverage score: Spark
    == DuckDB oracle at two SFs, plus invariants: coverage bounded in
    [0, 1e6], n_common <= n_bigrams, and every document scored."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.textops import (
        BIGRAM_COVERAGE_ORACLE,
        corpus_bigram_coverage,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = corpus_bigram_coverage(spark, d).collect()
        got = sorted(
            (r.doc_id, r.n_bigrams, r.n_common, r.coverage_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            (int(a), int(b), int(c), int(e))
            for a, b, c, e in con.execute(
                BIGRAM_COVERAGE_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"bigram coverage mismatch at {d}"
        n_docs = load_table(spark, d, "documents").count()
        assert len(rows) == n_docs
        for r in rows:
            assert 0 <= r.n_common <= r.n_bigrams
            assert 0 <= r.coverage_ppm <= 1_000_000


def test_pii_scan_redact_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the PII scrub: Spark == DuckDB oracle
    at two SFs INCLUDING the md5 fingerprint of the redacted text
    (any regexp_replace divergence flips it), plus the contract: the
    injected quota is found exactly (doc_id % 3 emails, 1 phone) and
    every redacted doc is clean."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.operators.textops import (
        PII_ORACLE,
        pii_scan_redact,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = pii_scan_redact(spark, d).collect()
        got = sorted(
            (r.doc_id, r.n_emails, r.n_phones, r.redacted_len,
             r.redacted_fp, r.is_clean)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            (int(a), int(b), int(c), int(e), int(f), int(g))
            for a, b, c, e, f, g in con.execute(PII_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"pii scrub mismatch at {d}"
        for r in rows:
            assert r.n_emails == r.doc_id % 3
            assert r.n_phones == 1
            assert r.is_clean == 1


def test_corpus_source_drift_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the TV-distance drift audit: Spark ==
    DuckDB oracle at two SFs; tv_ppm in [0, 1e6]; a Python replay
    over collected counts confirms the missing-bucket algebra."""
    import os
    from collections import Counter

    import duckdb

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.textops import (
        DRIFT_BUCKET_W,
        SOURCE_DRIFT_ORACLE,
        corpus_source_drift,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = corpus_source_drift(spark, d).collect()
        got = sorted((r.source, r.n_docs, r.tv_ppm) for r in rows)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            (s, int(n), int(t))
            for s, n, t in con.execute(SOURCE_DRIFT_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"source drift mismatch at {d}"
        assert all(0 <= t <= 1_000_000 for _, _, t in got)
        # exact Python replay (full TV incl. missing buckets)
        docs = load_table(spark, d, "documents").select(
            "source", "n_chars"
        ).collect()
        cells = Counter(
            (r.source, r.n_chars // DRIFT_BUCKET_W) for r in docs
        )
        n = len(docs)
        n_s = Counter(r.source for r in docs)
        buckets = {b for _, b in cells}
        n_b = {
            b: sum(c for (s2, b2), c in cells.items() if b2 == b)
            for b in buckets
        }
        for s, nd, tv in got:
            num = sum(
                abs(cells.get((s, b), 0) * n - n_b[b] * n_s[s])
                for b in buckets
            )
            assert nd == n_s[s]
            assert tv == num * 1_000_000 // (2 * n_s[s] * n)


def test_corpus_lexical_diversity_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; hapax <=
    types <= tokens and ppm columns bounded."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.operators.textops import (
        LEXICAL_DIVERSITY_ORACLE,
        corpus_lexical_diversity,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = corpus_lexical_diversity(spark, d).collect()
        got = sorted(
            (r.source, r.n_tokens, r.n_types, r.n_hapax, r.ttr_ppm,
             r.hapax_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            (s, int(a), int(b), int(c), int(e), int(f))
            for s, a, b, c, e, f in con.execute(
                LEXICAL_DIVERSITY_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"lexical diversity mismatch at {d}"
        for _, n_tok, n_ty, n_hx, ttr, hap in got:
            assert n_hx <= n_ty <= n_tok
            assert 0 <= ttr <= 1_000_000 and 0 <= hap <= 1_000_000


def test_corpus_dup_rate_by_source_vs_duckdb(spark, sf_dir):
    """Pre-registration pin: Spark == DuckDB at two SFs; distinct <=
    docs; ppm columns bounded; totals match the corpus."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.textops import (
        DUP_RATE_ORACLE,
        corpus_dup_rate_by_source,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = corpus_dup_rate_by_source(spark, d).collect()
        got = sorted(
            (r.source, r.n_docs, r.n_distinct, r.internal_dup_ppm,
             r.n_shared, r.cross_source_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(
            (s, int(a), int(b), int(c), int(e), int(f))
            for s, a, b, c, e, f in con.execute(
                DUP_RATE_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"dup rate mismatch at {d}"
        n_total = load_table(spark, d, "documents").count()
        assert sum(r[1] for r in got) == n_total
        for _, nd, dz, ip, sh, cp in got:
            assert dz <= nd and sh <= dz
            assert 0 <= ip <= 1_000_000 and 0 <= cp <= 1_000_000
