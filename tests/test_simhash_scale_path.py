"""The simhash graph consumers' explicit scale path (r15): every
consumer of the 60-bit pair relation takes ``pairs_fn`` and can ride
the 120-bit q_dedup_simhash_wide_pairs — the measured fix for the
15-bit bands' n^2/2^15 random-candidate quadratic (SCALEUP100_r14).

Pins here are IDENTITY pins: consumer(pairs_fn=wide) must equal an
implementation-independent Python recompute FROM the wide pair
relation (union-find, integer pagerank, wedge counting), at two SFs.
That proves the kwarg is actually wired through — a consumer that
silently kept the 60-bit default would diverge wherever the two pair
relations differ, which test_wide_and_narrow_relations_differ shows
they do at sf0.01."""

import os

import pytest

from thrivefinancedatapipeline_spark.operators.dedup import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERS,
    PR_TOTAL,
    dedup_cluster_keep_priority,
    dedup_cluster_size_histogram,
    q_dedup_clusters,
    q_dedup_clusters_star,
    q_dedup_graph_stats,
    q_dedup_pagerank,
    q_dedup_simhash_pairs,
    q_dedup_simhash_wide_pairs,
)

SF001 = "/root/testdata/sf0.01"

_CACHE: dict = {}


def _dirs(sf_dir):
    return [d for d in (sf_dir, SF001) if os.path.isdir(d)]


def _wide_pairs(spark, d):
    if d not in _CACHE:
        pairs = {
            (r["doc_id_1"], r["doc_id_2"])
            for r in q_dedup_simhash_wide_pairs(spark, d).collect()
        }
        import duckdb

        ids = [
            r[0]
            for r in duckdb.connect()
            .execute(
                f"SELECT doc_id FROM "
                f"read_parquet('{d}/documents.parquet') ORDER BY doc_id"
            )
            .fetchall()
        ]
        _CACHE[d] = (pairs, ids)
    return _CACHE[d]


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_wide_and_narrow_relations_differ(spark):
    """Non-vacuity: the 120-bit and 60-bit pair sets genuinely differ
    at sf0.01 (3 flips of 120 is stricter than 3 of 60), so the
    identity pins below would catch a consumer that ignored its
    pairs_fn."""
    wide, _ = _wide_pairs(spark, SF001)
    narrow = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in q_dedup_simhash_pairs(spark, SF001).collect()
    }
    assert wide != narrow
    # the wide relation is a near-subset in practice: docs that agree
    # on 117 of 120 majority bits agree on ~all token sets; require
    # real overlap so the two relations describe the same phenomenon
    assert wide & narrow


def test_clusters_wide_identity_both_engines(spark, sf_dir):
    """Both CC engines, fed the wide relation, reproduce a plain
    union-find over the collected wide pairs — at two SFs."""
    for d in _dirs(sf_dir):
        pairs, ids = _wide_pairs(spark, d)
        want = _union_find(ids, pairs)
        for fn in (q_dedup_clusters, q_dedup_clusters_star):
            got = {
                r["doc_id"]: r["cluster_id"]
                for r in fn(
                    spark, d, pairs_fn=q_dedup_simhash_wide_pairs
                ).collect()
            }
            assert got == want, fn.__name__


def test_graph_stats_wide_identity(spark, sf_dir):
    """Edges / wedges / triangles over the wide relation equal a
    Python recompute with the same degree-ordered orientation."""
    for d in _dirs(sf_dir):
        pairs, ids = _wide_pairs(spark, d)
        adj: dict = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {u: len(vs) for u, vs in adj.items()}
        out: dict = {}
        directed = set()
        for a, b in pairs:
            u, v = (a, b) if (deg[a], a) < (deg[b], b) else (b, a)
            out.setdefault(u, []).append(v)
            directed.add((u, v))
        n_wedges = sum(len(vs) * (len(vs) - 1) // 2 for vs in out.values())
        n_triangles = 0
        for u, vs in out.items():
            svs = sorted(vs, key=lambda x: (deg[x], x))
            for i, a in enumerate(svs):
                for b in svs[i + 1:]:
                    if (a, b) in directed:
                        n_triangles += 1
        row = q_dedup_graph_stats(
            spark, d, pairs_fn=q_dedup_simhash_wide_pairs
        ).collect()[0]
        assert (
            row["n_edges"],
            row["n_wedges"],
            row["n_triangles"],
        ) == (len(pairs), n_wedges, n_triangles)


def test_pagerank_wide_identity(spark, sf_dir):
    """Exact-integer pagerank over the wide relation equals the same
    fixed-K integer recursion in plain Python."""
    for d in _dirs(sf_dir):
        pairs, ids = _wide_pairs(spark, d)
        deg: dict = {}
        nbrs: dict = {}
        for a, b in pairs:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
        deg = {u: len(vs) for u, vs in nbrs.items()}
        n = len(ids)
        init = PR_TOTAL // n
        base = ((PR_DAMP_DEN - PR_DAMP_NUM) * init) // PR_DAMP_DEN
        mass = {i: init for i in ids}
        for _ in range(PR_ITERS):
            insum = {i: 0 for i in ids}
            for u, vs in nbrs.items():
                c = mass[u] // deg[u]
                for v in vs:
                    insum[v] += c
            mass = {
                i: base + (PR_DAMP_NUM * insum[i]) // PR_DAMP_DEN
                for i in ids
            }
        got = {
            r["doc_id"]: (r["degree"], r["mass_scaled"])
            for r in q_dedup_pagerank(
                spark, d, pairs_fn=q_dedup_simhash_wide_pairs
            ).collect()
        }
        want = {i: (deg.get(i, 0), mass[i]) for i in ids}
        assert got == want


def test_cluster_rollups_ride_wide_pairs(spark, sf_dir):
    """The two rollup consumers forward pairs_fn through
    q_dedup_clusters: histogram and survivor selection recomputed from
    the union-find labels match cell-for-cell."""
    import duckdb

    for d in _dirs(sf_dir):
        pairs, ids = _wide_pairs(spark, d)
        labels = _union_find(ids, pairs)
        sizes: dict = {}
        for _, c in labels.items():
            sizes[c] = sizes.get(c, 0) + 1

        def bucket(n):
            return (
                "1" if n == 1 else "2" if n == 2
                else "3-4" if n <= 4 else "5-8" if n <= 8 else "9+"
            )

        want_hist: dict = {}
        for c, n in sizes.items():
            b = bucket(n)
            cur = want_hist.get(b)
            if cur is None:
                want_hist[b] = [1, n, n, n]
            else:
                cur[0] += 1
                cur[1] += n
                cur[2] = min(cur[2], n)
                cur[3] = max(cur[3], n)
        got_hist = {
            r["size_bucket"]: [
                r["n_clusters"], r["n_docs"], r["min_size"], r["max_size"]
            ]
            for r in dedup_cluster_size_histogram(
                spark, d, pairs_fn=q_dedup_simhash_wide_pairs
            ).collect()
        }
        assert got_hist == want_hist

        rows = duckdb.connect().execute(
            f"SELECT doc_id, lang, source, length(text) FROM "
            f"read_parquet('{d}/documents.parquet')"
        ).fetchall()
        by_cluster: dict = {}
        for doc_id, lang, source, n_chars in rows:
            # _SRC_PRIO: CAST(substring(source, 4) AS BIGINT)
            prio = int(source[3:])
            by_cluster.setdefault(labels[doc_id], []).append(
                (prio, n_chars, doc_id, lang, source)
            )
        want_keep = {}
        for c, members in by_cluster.items():
            prio, _, doc_id, lang, source = min(members)
            want_keep[c] = (doc_id, lang, source, len(members))
        got_keep = {
            r["cluster_id"]: (
                r["doc_id"], r["lang"], r["source"], r["n_members"]
            )
            for r in dedup_cluster_keep_priority(
                spark, d, pairs_fn=q_dedup_simhash_wide_pairs
            ).collect()
        }
        assert got_keep == want_keep


def test_kcore_wide_identity(spark, sf_dir):
    """kcore_decompose(pairs_fn=wide) equals an exact driver-side
    peeling recompute from the wide pair relation — the r16 fix for
    the one graph consumer the r15 pairs_fn wiring missed (it
    hard-called the guarded 60-bit finder and would raise above
    SIMHASH_WIDE_THRESHOLD_DOCS instead of riding the wide
    relation)."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        KCORE_K,
        kcore_decompose,
    )

    for d in _dirs(sf_dir):
        pairs, _ = _wide_pairs(spark, d)
        adj: dict = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive = set(adj)
        while True:
            drop = {v for v in alive if len(adj[v] & alive) < KCORE_K}
            if not drop:
                break
            alive -= drop
        want = {v: len(adj[v] & alive) for v in alive}
        got = {
            r["doc_id"]: r["core_deg"]
            for r in kcore_decompose(
                spark, d, pairs_fn=q_dedup_simhash_wide_pairs
            ).collect()
        }
        assert got == want
        # non-vacuity at the base SF: the wide graph has a k-core
        if d == SF001:
            assert want


def test_radius_sweep_pairs_fn_wiring(spark):
    """dedup_simhash_radius_sweep(pairs_fn=wide) sweeps the WIDE
    relation: per-radius pair counts equal the registered wide sweep's
    (only the checksum namespace differs), and differ from the 60-bit
    default's — so the r16 kwarg is provably wired through, not
    ignored."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        dedup_simhash_radius_sweep,
        dedup_simhash_wide_radius_sweep,
    )

    def counts(df):
        return {
            r["ham_max"]: (r["n_pairs"], r["n_pairs_widest"])
            for r in df.collect()
        }

    wide_via_kwarg = counts(
        dedup_simhash_radius_sweep(
            spark, SF001, pairs_fn=q_dedup_simhash_wide_pairs
        )
    )
    wide_registered = counts(dedup_simhash_wide_radius_sweep(spark, SF001))
    narrow_default = counts(dedup_simhash_radius_sweep(spark, SF001))
    assert wide_via_kwarg == wide_registered
    assert wide_via_kwarg != narrow_default


def test_guard_count_cache_key_tracks_rewrites(tmp_path):
    """The 60-bit guard's doc-count cache is keyed on (realpath,
    mtime, size) of documents.parquet, not the raw path string (r17
    ADVICE fix): a corpus rewritten in place must get a fresh count,
    not a stale guard verdict."""
    import os

    from thrivefinancedatapipeline_spark.operators.dedup import (
        _guard_cache_key,
    )

    p = tmp_path / "documents.parquet"
    p.write_bytes(b"v1")
    k1 = _guard_cache_key(str(tmp_path))
    # same content, same mtime -> same key (cache hit)
    assert _guard_cache_key(str(tmp_path)) == k1
    # rewrite in place (different size + mtime) -> different key
    p.write_bytes(b"v2-longer")
    os.utime(p, ns=(k1[1] + 1, k1[1] + 1))
    assert _guard_cache_key(str(tmp_path)) != k1
    # a missing corpus still yields a stable, non-crashing key
    missing = _guard_cache_key(str(tmp_path / "nope"))
    assert missing[1] is None and missing[2] is None


def test_minhash_band_divisor_guard():
    """A rows-per-band that does not divide K=16 fails loudly on BOTH
    the Spark banding and the oracle banding (r16 ADVICE fix) instead
    of silently dropping trailing permutations. ValueError, not
    AssertionError (r17 ADVICE fix): python -O strips asserts."""
    import pytest as _pytest

    from thrivefinancedatapipeline_spark.operators.dedup import (
        _minhash_band_selects,
        _minhash_bands_r,
    )

    with _pytest.raises(ValueError, match="divide"):
        _minhash_bands_r(None, 3)
    with _pytest.raises(ValueError, match="divide"):
        _minhash_band_selects(3)


def test_registered_defaults_unchanged(spark, sf_dir):
    """The kwarg's DEFAULT is still the registered 60-bit relation:
    q_dedup_clusters() with no pairs_fn equals union-find over the
    60-bit pairs (the driver-proven semantics did not move)."""
    d = sf_dir
    import duckdb

    narrow = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in q_dedup_simhash_pairs(spark, d).collect()
    }
    ids = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM read_parquet('{d}/documents.parquet')"
        )
        .fetchall()
    ]
    want = _union_find(ids, narrow)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in q_dedup_clusters(spark, d).collect()
    }
    assert got == want


def test_narrow_pairs_guard_refuses_above_threshold(spark, sf_dir, monkeypatch):
    """The 60-bit pair path REFUSES corpora above the wide threshold
    (the EXACT_COSINE_MAX_ROWS discipline): the quadratic path is
    unreachable by accident, unguarded=True forces it, and the
    consumers' default path inherits the refusal with the pointer to
    the wide relation."""
    import pytest

    from thrivefinancedatapipeline_spark.operators import dedup

    monkeypatch.setattr(dedup, "SIMHASH_WIDE_THRESHOLD_DOCS", 10)
    with pytest.raises(ValueError, match="wide_pairs"):
        dedup.q_dedup_simhash_pairs(spark, sf_dir)
    with pytest.raises(ValueError, match="pairs_fn"):
        dedup.q_dedup_clusters(spark, sf_dir).collect()
    # explicit overrides still work: forced quadratic path and the
    # documented wide path are both callable above the threshold
    assert dedup.q_dedup_simhash_pairs(
        spark, sf_dir, unguarded=True
    ).columns == ["doc_id_1", "doc_id_2", "hamming"]
    assert dedup.q_dedup_simhash_wide_pairs(spark, sf_dir).columns == [
        "doc_id_1", "doc_id_2", "hamming"
    ]


def test_threshold_constant_matches_band_math():
    """SIMHASH_WIDE_THRESHOLD_DOCS is the documented knee: at n = 2^16
    the 15-bit bands' expected random candidates n^2/2/2^15 pass n
    itself (super-linear from here), while 30-bit bands stay below n
    until n = 2^31."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        SIM_BAND_BITS,
        SIMHASH_WIDE_THRESHOLD_DOCS,
        WIDE_BAND_BITS,
    )

    n = SIMHASH_WIDE_THRESHOLD_DOCS
    assert n * n // 2 // (1 << SIM_BAND_BITS) >= n // 2
    assert n * n // 2 // (1 << WIDE_BAND_BITS) < n
