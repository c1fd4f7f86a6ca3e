"""Tests: deterministic sampling/splitting and the salted-join helper."""

import pytest
from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.operators import sampling
from thrivefinancedatapipeline_spark.operators.skew import salted_join


def test_sample_by_hash_is_stable_and_a_subset(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    s1 = {r.k for r in sampling.sample_by_hash(df, "k", 10).collect()}
    s2 = {r.k for r in sampling.sample_by_hash(df, "k", 10).collect()}
    s20 = {r.k for r in sampling.sample_by_hash(df, "k", 20).collect()}
    assert s1 == s2                      # rerun-stable
    assert s1 <= s20                     # rate increase only ADDS rows
    assert 40 <= len(s1) <= 180          # ~10% of 1000


def test_split_is_exhaustive_and_disjoint(spark):
    df = spark.range(500).select(sampling.split_column(F.col("id")).alias("s"))
    counts = {r.s: r.c for r in df.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 500
    assert counts["train"] > counts["val"]


def test_split_membership_survives_new_rows(spark):
    old = spark.range(300)
    grown = spark.range(600)
    s_old = {
        (r.id, r.s)
        for r in old.select("id", sampling.split_column(F.col("id")).alias("s")).collect()
    }
    s_new = {
        (r.id, r.s)
        for r in grown.select("id", sampling.split_column(F.col("id")).alias("s")).collect()
        if r.id < 300
    }
    assert s_old == s_new  # growing the corpus never reassigns old rows


def test_stratified_take_equal_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(90)], "doc_id long, lang string"
    )
    out = sampling.stratified_take(df, "lang", "doc_id", 5)
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts == {"a": 5, "b": 5}


def _skewed_frames(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 10)],
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], "k long, attr string"
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    left, right = _skewed_frames(spark)
    plain = left.join(right, ["k"], how).orderBy("k", "payload").collect()
    salted = salted_join(left, right, ["k"], how).orderBy("k", "payload").collect()
    assert salted == plain


def test_salted_join_rejects_outer(spark):
    left, right = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], "full")


def test_plan_skewed_shuffle_uniform_needs_no_salt():
    from thrivefinancedatapipeline_spark.sources.bucketing import (
        plan_skewed_shuffle,
    )

    # 1000 uniform keys x 1 MB against a 128 MB target
    plan = plan_skewed_shuffle(
        1000 * 2**20, {k: 2**20 for k in range(1000)}, 128 * 2**20, cpus=32
    )
    assert not plan.needs_salting
    assert plan.n_partitions == 32  # floor wins: 1000 MB / 128 MB < 32


def test_plan_skewed_shuffle_hot_key_changes_the_plan():
    from thrivefinancedatapipeline_spark.sources.bucketing import (
        plan_skewed_shuffle,
    )

    target = 128 * 2**20
    uniform = {k: 2**20 for k in range(1000)}
    skewed = dict(uniform, hot=30 * 2**30)  # one 30 GB key
    plan = plan_skewed_shuffle(
        sum(skewed.values()), skewed, target, cpus=32
    )
    # the hot key gets spread over ceil(30 GB / 128 MB) = 240 partitions
    assert plan.salt_factors == {"hot": 240}
    # the remainder is planned WITHOUT the hot key's bytes
    assert plan.n_partitions == 32
    base = plan_skewed_shuffle(sum(uniform.values()), uniform, target, 32)
    assert base.salt_factors == {}


def test_plan_from_skew_audit_ppm_table():
    from thrivefinancedatapipeline_spark.sources.bucketing import (
        plan_shuffle_partitions_from_skew,
    )

    # skew audit says one key owns 30% of a 100 GB input
    plan = plan_shuffle_partitions_from_skew(
        100 * 2**30, {"hot": 300_000, "ok": 1_000}, 128, cpus=32
    )
    assert plan.salt_factors == {"hot": 240}  # ceil(30 GB / 128 MB)
    assert plan.n_partitions == 560  # ceil(70 GB / 128 MB)


def test_shuffle_plan_query_matches_planner(spark, sf_dir):
    """The engine query and the Python planner must derive the same
    plan from the same counts (row units, same target)."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sketches import (
        PLAN_CPUS,
        PLAN_TARGET_ROWS,
        q_shuffle_plan_events,
    )
    from thrivefinancedatapipeline_spark.sources.bucketing import (
        plan_skewed_shuffle,
    )

    got = q_shuffle_plan_events(spark, sf_dir).collect()
    assert got
    counts = {
        r.user_id: r.n_rows
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    plan = plan_skewed_shuffle(
        sum(counts.values()), counts, PLAN_TARGET_ROWS, cpus=PLAN_CPUS
    )
    for r in got:
        assert r.salt_factor == plan.salt_factors.get(r.user_id, 1)
        assert r.n_partitions == plan.n_partitions


def test_cms_estimate_dominates_exact_count(spark, sf_dir):
    """CMS can only over-count: est >= exact for every reported key,
    and the sketch is deterministic run-over-run."""
    from thrivefinancedatapipeline_spark.operators.sketches import (
        q_heavy_hitters_cms,
    )

    a = q_heavy_hitters_cms(spark, sf_dir).collect()
    b = q_heavy_hitters_cms(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert a and all(r.cms_est >= r.n_rows for r in a)


def test_kmv_merge_equals_direct_window_sketch(spark, sf_dir):
    """The KMV merge property the rolling query relies on: per window
    end, the k smallest hashes of the union of per-day sketches must
    equal the k smallest hashes over ALL users active in the window
    (any union-top-k hash is necessarily in its own day's top-k)."""
    from pyspark.sql import Window

    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.functions.text import md5_long
    from thrivefinancedatapipeline_spark.operators.sketches import (
        KMV_K,
        q_rolling_distinct_kmv,
    )
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        ROLLING_DAYS,
    )

    got = {
        r.day: (r.n_sketch, r.kth_min_hash)
        for r in q_rolling_distinct_kmv(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("d"),
        md5_long(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    days = [r.d for r in daily.select("d").distinct().collect()]
    direct = {}
    for day in days:
        hashes = sorted(
            r.h
            for r in daily.filter(
                (F.col("d") <= F.lit(day))
                & (F.col("d") >= F.date_sub(F.lit(day), ROLLING_DAYS - 1))
            )
            .select("h")
            .distinct()
            .collect()
        )
        topk = hashes[:KMV_K]
        direct[day.strftime("%Y-%m-%d")] = (len(topk), topk[-1])
    assert got == direct


def test_kmv_rolling_estimate_is_in_band(spark, sf_dir):
    """Sanity on estimator quality: with k=16 the relative standard
    error is ~1/sqrt(k-2) ≈ 27%; assert every full-sketch day lands
    within a generous 4-sigma band of the exact rolling count."""
    from thrivefinancedatapipeline_spark.operators.sketches import (
        KMV_K,
        q_rolling_distinct_kmv,
    )
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        q_events_rolling_distinct_users,
    )

    est = {
        r.day: (r.n_sketch, r.est_users_7d)
        for r in q_rolling_distinct_kmv(spark, sf_dir).collect()
    }
    exact = {
        r.day: r.users_7d
        for r in q_events_rolling_distinct_users(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for day, (n_sketch, e) in est.items():
        x = exact[day]
        if n_sketch < KMV_K:
            assert e == x  # degenerate sketch IS the exact count
        else:
            assert abs(e - x) <= max(4, int(1.1 * x))  # 4σ at 27% rse


def test_histogram_quantile_buckets_contain_exact_values(spark, sf_dir):
    """Each reported [lo, hi] bucket must contain the exact rank-target
    value, and n_below must equal the rows strictly before the
    bucket."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sketches import (
        q_histogram_quantiles,
    )

    got = {r.q: r for r in q_histogram_quantiles(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    cents = sorted(
        r.c for r in ev.select(
            F.round(F.col("value") * 100).cast("long").alias("c")
        ).collect()
    )
    n = len(cents)
    for q, row in got.items():
        target = -((-q * n) // 100)  # ceil(qn/100)
        assert row.target_rank == target
        exact = cents[target - 1]  # rank is 1-based
        assert row.lo_cents <= exact <= row.hi_cents, (q, exact, row)
        assert row.n_below == sum(1 for c in cents if c < row.lo_cents)


def test_equidepth_quantiles_exact_containment_and_refinement(spark, sf_dir):
    """The adaptive sketch keeps the containment contract (each [lo,hi]
    holds the exact rank-target value; n_below counts rows strictly
    below lo) AND refines: every quantile landing in a heavy cell
    reports a bound no wider than ceil(w / EQD_SUB); total bound width
    across quantiles is <= the equi-width sketch's."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sketches import (
        q_equidepth_quantiles,
        q_histogram_quantiles,
    )

    got = {r.q: r for r in q_equidepth_quantiles(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    cents = sorted(
        r.c for r in ev.select(
            F.round(F.col("value") * 100).cast("long").alias("c")
        ).collect()
    )
    n = len(cents)
    for q, row in got.items():
        target = -((-q * n) // 100)
        assert row.target_rank == target
        exact = cents[target - 1]
        assert row.lo_cents <= exact <= row.hi_cents, (q, exact, row)
        assert row.n_below == sum(1 for c in cents if c < row.lo_cents)

    eqw = {r.q: r for r in q_histogram_quantiles(spark, sf_dir).collect()}
    # the adaptivity contract: where a quantile lands in a heavy cell
    # the bound collapses to a sub-cell — ceil(w/EQD_SUB) wide, i.e.
    # up to 16x finer than even the 256-cell equi-width grid (64*64
    # vs 256 effective cells where the mass lives)
    from thrivefinancedatapipeline_spark.operators.sketches import (
        EQD_NB,
        EQD_SUB,
    )

    mn, mx = cents[0], cents[-1]
    w = max(1, (mx - mn + 1 + EQD_NB - 1) // EQD_NB)
    sub_w = max(1, (w + EQD_SUB - 1) // EQD_SUB)
    assert any(r.refined for r in got.values())
    for q, row in got.items():
        if row.refined:
            assert row.hi_cents - row.lo_cents + 1 <= sub_w
            assert (
                row.hi_cents - row.lo_cents
                <= eqw[q].hi_cents - eqw[q].lo_cents
            )
        else:
            assert row.hi_cents - row.lo_cents + 1 <= w


def test_equidepth_cells_merge_equals_direct(spark, sf_dir):
    """Mergeability: refined-histogram cells built on disjoint halves
    under SHARED pass-1 boundaries, added cell-wise, equal the cells
    built directly on the union — the property that lets a 100 TB
    deployment sketch per partition/day and merge."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sketches import (
        equidepth_boundaries,
        equidepth_cells,
    )

    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.col("event_id"),
    )
    stats, heavy = equidepth_boundaries(cents.select("cents"))
    stats = stats.localCheckpoint(eager=True)
    heavy = heavy.localCheckpoint(eager=True)
    half_a = cents.filter("event_id % 2 = 0").select("cents")
    half_b = cents.filter("event_id % 2 = 1").select("cents")
    merged = (
        equidepth_cells(half_a, stats, heavy)
        .unionAll(equidepth_cells(half_b, stats, heavy))
        .groupBy("bucket", "sub")
        .agg(F.sum("c").alias("c"))
    )
    direct = equidepth_cells(cents.select("cents"), stats, heavy)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_join_cardinality_bounds(spark, sf_dir):
    """Sketch inner-product join-size estimate: est >= exact always
    (collisions only add mass), and the min-over-rows stays within
    the expected collision overcount (na*nb/width per row — margin 2x;
    everything is deterministic, so this cannot flake)."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sketches import (
        CMS_WIDTH,
        cms_grid_for,
        cms_join_cardinality,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    exact = ev.join(cu, ev.user_id == cu.c_custkey).count()
    est = cms_join_cardinality(
        cms_grid_for(ev, "user_id"), cms_grid_for(cu, "c_custkey")
    ).collect()[0].est_join_rows
    na, nb = ev.count(), cu.count()
    assert est >= exact
    assert est <= exact + 2 * (na * nb) // CMS_WIDTH

    # self-join sanity: grid against itself estimates the self-join
    ga = cms_grid_for(ev, "user_id")
    self_exact = ev.join(
        ev.withColumnRenamed("user_id", "u2"),
        F.col("user_id") == F.col("u2"),
    ).count()
    self_est = cms_join_cardinality(ga, ga).collect()[0].est_join_rows
    assert self_est >= self_exact
    assert self_est <= self_exact + 2 * (na * na) // CMS_WIDTH


def test_equidepth_by_group_equals_per_subset_global(spark, sf_dir):
    """Per-group sketch parity: for each event_type, the grouped
    two-pass sketch must equal the GLOBAL sketch run on just that
    group's rows — the boundaries are genuinely per-group, computed
    in one shared pair of scans."""
    from thrivefinancedatapipeline_spark.datamodel import load_table
    from thrivefinancedatapipeline_spark.operators.sketches import (
        equidepth_boundaries,
        equidepth_cells,
        EQD_QUANTILES,
        equidepth_quantiles_by_group,
    )
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    got = sorted(
        tuple(r)
        for r in equidepth_quantiles_by_group(keyed, "g", "cents").collect()
    )

    want = []
    for gr in [r.g for r in keyed.select("g").distinct().collect()]:
        cents = keyed.filter(F.col("g") == gr).select("cents")
        stats, heavy = equidepth_boundaries(cents)
        cells = equidepth_cells(cents, stats, heavy)
        wcum = Window.orderBy("bucket", "sub").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        cum = cells.withColumn("cum", F.sum("c").over(wcum))
        qs = F.explode(
            F.array(*[F.lit(q) for q in EQD_QUANTILES])
        ).alias("q")
        targets = stats.select(
            qs, F.expr("(q * n + 99) div 100").alias("target"), "mn", "w"
        )
        hit = (
            cum.join(F.broadcast(targets), F.col("cum") >= F.col("target"))
            .withColumn("cell", F.struct("bucket", "sub", "c", "cum"))
            .groupBy("q", "target")
            .agg(
                F.min_by("cell", F.struct("bucket", "sub")).alias("cell"),
                F.first("mn").alias("mn"),
                F.first("w").alias("w"),
            )
            .join(
                F.broadcast(
                    heavy.select(F.col("bucket").alias("hb"), "sub_w")
                ),
                F.col("cell.bucket") == F.col("hb"),
                "left",
            )
        )
        for r in hit.collect():
            sub_w = r.sub_w
            mn, w = r.mn, r.w
            bkt, sub = r.cell.bucket, r.cell.sub
            if sub_w is None:
                lo, hi = mn + bkt * w, mn + (bkt + 1) * w - 1
            else:
                lo = mn + bkt * w + sub * sub_w
                hi = min(
                    mn + bkt * w + (sub + 1) * sub_w - 1,
                    mn + (bkt + 1) * w - 1,
                )
            want.append(
                (
                    gr, r.q, r.target, bkt, sub, lo, hi,
                    r.cell.cum - r.cell.c, int(sub_w is not None),
                )
            )
    assert got == sorted(want)


def test_benford_audit_vs_duckdb(spark, sf_dir):
    """Pre-registration pin for the Benford first-digit audit: Spark
    == DuckDB oracle at two SFs, plus mass invariants (digit counts
    sum to n_digits; 9 rows per type; obs_ppm sums to ~1e6)."""
    import os

    import duckdb

    from thrivefinancedatapipeline_spark.operators.quality import (
        BENFORD_ORACLE,
        benford_audit,
    )

    for d in (sf_dir, sf_dir.replace("sf0.001", "sf0.01")):
        if not os.path.isdir(d):
            continue
        rows = benford_audit(spark, d).collect()
        got = sorted(
            (r.event_type, r.digit, r.n, r.n_digits, r.obs_ppm,
             r.exp_ppm, r.dev_ppm)
            for r in rows
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        want = sorted(
            tuple(
                x if isinstance(x, str) else int(x) for x in row
            )
            for row in con.execute(BENFORD_ORACLE).fetchall()
        )
        con.close()
        assert got == want, f"benford mismatch at {d}"
        by_type = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        for et, rs in by_type.items():
            assert len(rs) == 9
            assert sum(r.n for r in rs) == rs[0].n_digits
            s = sum(r.obs_ppm for r in rs)
            assert 999_990 <= s <= 1_000_000, (et, s)


def test_aqe_skew_join_splits_hot_partition(spark, tmp_path):
    """AQE's OptimizeSkewedJoin must fire on the hot-key demo: the
    FINAL adaptive plan carries SortMergeJoin(skew=true), results
    equal the plain join, and the confs restore after the scope."""
    import contextlib
    import io

    from thrivefinancedatapipeline_spark.operators.skew import (
        HOT_ROWS,
        aqe_skew_confs,
        skewed_join_frame,
        write_skew_demo_inputs,
    )

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_skew_demo_inputs(spark, lp, rp)
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with aqe_skew_confs(spark):
        df = skewed_join_frame(spark, lp, rp)
        rows = {r.k: (r.n, r.w_sum) for r in df.collect()}
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    assert rows[0] == (HOT_ROWS, 0)
    assert len(rows) == 51
    assert all(rows[k] == (100, 100 * k * 7) for k in range(1, 51))
