"""hybrid_search_rrf_indexed: the persisted-IVF-PQ-probe vector leg
composed into the RRF fusion — the deployment swap the registered
hybrid_search_rrf docstring promises. Pins (1) the fusion is a pure
integer function of the two rank lists (recomputed in Python), (2)
fused rows are IDENTICAL to the exact-leg hybrid wherever the probe's
top-k equals the exact vector leg's top-k, and (3) the registered
exact hybrid still matches its composition from the shared pieces
after the leg/fuse refactor."""

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators import similarity as sim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _python_rrf(lex_rows, vec_rows):
    """Exact integer recompute of the RRF fusion from the two rank
    lists — the ground truth _rrf_fuse must equal."""
    ranks = {}
    for qid, nid, r in lex_rows:
        ranks.setdefault((qid, nid), [None, None])[0] = r
    for qid, nid, r in vec_rows:
        ranks.setdefault((qid, nid), [None, None])[1] = r
    scored = [
        (
            qid,
            nid,
            (1_000_000_000 // (sim.RRF_K + lr) if lr else 0)
            + (1_000_000_000 // (sim.RRF_K + vr) if vr else 0),
        )
        for (qid, nid), (lr, vr) in ranks.items()
    ]
    out = []
    for qid in {q for q, _, _ in scored}:
        rows = sorted(
            (r for r in scored if r[0] == qid),
            key=lambda r: (-r[2], r[1]),
        )[: sim.HY_K]
        out.extend(
            (qid, nid, score, i + 1)
            for i, (_, nid, score) in enumerate(rows)
        )
    return sorted(out)


def test_indexed_hybrid_composes_and_fusion_is_exact(spark, sf_dir):
    lex = _rows(sim._hybrid_lex_leg(spark, sf_dir))
    vec = _rows(
        sim.knn_ivfpq_index_probe(spark, sf_dir)
        .filter(F.col("query_id") < sim.HY_QUERIES)
        .select("query_id", "neighbor_id", "rank")
    )
    got = _rows(sim.hybrid_search_rrf_indexed(spark, sf_dir))
    assert got == _python_rrf(lex, vec)
    # shape invariants: dense ranks from 1, bounded per query
    per_q = {}
    for qid, nid, score, rank in got:
        per_q.setdefault(qid, []).append((rank, score, nid))
    assert set(per_q) == set(range(sim.HY_QUERIES))
    for qid, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= sim.HY_K
        scores = [r[1] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_indexed_hybrid_matches_exact_where_probe_list_matches(
    spark, sf_dir
):
    """Where the probe returns the exact top-k (per query), the two
    hybrids must be row-identical — RRF consumes only ranks, so the
    ONLY divergence channel is ANN recall. Also require the premise
    to be non-vacuous: at least one query's probe list matches."""
    exact_vec = _rows(
        sim.ivfpq_knn(spark, sf_dir).filter(
            F.col("query_id") < sim.HY_QUERIES
        )
    )
    probe_vec = _rows(
        sim.knn_ivfpq_index_probe(spark, sf_dir).filter(
            F.col("query_id") < sim.HY_QUERIES
        )
    )
    # knn_ivfpq_index_probe is row-identical to ivfpq_knn by the
    # persisted-index parity contract, so every query matches and the
    # "where the list matches" premise covers all of them; guard the
    # premise anyway so a future probe change degrades this test
    # loudly instead of vacuously.
    matching = {
        q
        for q in range(sim.HY_QUERIES)
        if [r for r in exact_vec if r[0] == q]
        == [r for r in probe_vec if r[0] == q]
    }
    assert matching, "probe top-k matched the exact leg for no query"

    # the exact hybrid's vector leg is the brute-force cosine scan,
    # NOT ivfpq: restrict the cross-variant identity to queries where
    # the probe list ALSO equals the brute-force list
    brute = _rows(
        sim.q_knn_bruteforce_cosine(spark, sf_dir).filter(
            F.col("query_id") < sim.HY_QUERIES
        )
    )
    full_match = {
        q
        for q in matching
        if [r[1:] for r in probe_vec if r[0] == q]
        == [r[1:] for r in brute if r[0] == q]
    }
    got = _rows(sim.hybrid_search_rrf_indexed(spark, sf_dir))
    want = _rows(sim.hybrid_search_rrf(spark, sf_dir))
    for q in full_match:
        assert [r for r in got if r[0] == q] == [
            r for r in want if r[0] == q
        ], f"fused rows diverge for query {q} despite identical legs"
