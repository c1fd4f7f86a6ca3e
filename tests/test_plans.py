"""Physical-plan audits: the scale properties SURVEY §6 claims must be
visible in `explain` output — pushed filters, pruned scans, broadcast
joins, bounded shuffle counts. These guard against plan regressions
that correctness tests can't see."""

import contextlib
import io

from thrivefinancedatapipeline_spark.plans import advanced, finance_queries, tpch


def explain(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def exchanges(df):
    """Count shuffle nodes. Simple mode lists each node once (formatted
    mode repeats node names in the detail section)."""
    return explain(df, mode="simple").count("Exchange")


def test_q6_filters_reach_the_scan(spark, sf_dir):
    plan = explain(tpch.q_tpch_q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed


def test_q1_scan_prunes_unused_columns(spark, sf_dir):
    plan = explain(tpch.q_tpch_q1_pricing_summary(spark, sf_dir))
    schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_returnflag" in schema and "l_quantity" in schema
    # q1 never touches the join keys — they must not be read
    assert "l_orderkey" not in schema and "l_partkey" not in schema


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    plan = explain(tpch.q_tpch_q5_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    # only the lineitem-orders fact-fact join may shuffle
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_fifo_is_single_shuffle(spark, sf_dir):
    # one Exchange for the per-customer repartition; no join exchanges
    assert exchanges(finance_queries.q_fifo_matching(spark, sf_dir)) == 1


def test_dedup_exact_is_single_shuffle(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import dedup

    assert exchanges(dedup.q_dedup_exact(spark, sf_dir)) == 1


def test_asof_is_single_shuffle(spark, sf_dir):
    df = advanced.q_asof_last_touch(spark, sf_dir)
    # both sides union shuffle-free into ONE window exchange on user_id
    assert "Join" not in explain(df, mode="simple")
    assert exchanges(df) == 1


def test_sample_filter_is_scan_level(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import sampling

    plan = explain(sampling.q_sample_documents_hash(spark, sf_dir))
    assert "Exchange" not in plan  # pure filter+project: no shuffle at all


def test_range_join_is_not_cartesian(spark, sf_dir):
    plan = explain(advanced.q_range_join_touch_counts(spark, sf_dir), "simple")
    # the hour-bucket trick must produce equi-joins, never a
    # nested-loop/cartesian expansion
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_is_shuffle_free(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import dedup

    assert exchanges(dedup.q_dedup_simhash(spark, sf_dir)) == 0


def test_event_filters_push_to_scan(spark, sf_dir):
    plan = explain(advanced.q_asof_last_touch(spark, sf_dir))
    # event_type predicates must reach the parquet scan on both sides
    assert plan.count("PushedFilters: [") >= 1
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pushed


def test_decontaminate_blocklist_broadcasts(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import textops

    plan = explain(textops.q_corpus_decontaminate(spark, sf_dir))
    # the benchmark blocklist must ride a broadcast — the corpus-side
    # probe is shuffle-free; only the per-doc count aggregates
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_mixture_weights_single_data_shuffle(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import textops

    df = textops.q_corpus_mixture_weights(spark, sf_dir)
    # one Exchange aggregates the corpus; the ppm window runs on the
    # tiny (lang, source) aggregate — at most one single-partition
    # exchange on top, never a second pass over the data
    assert exchanges(df) <= 2


def test_ivf_assignment_is_projection_no_crossjoin(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import similarity

    plan = explain(similarity.q_ivf_knn(spark, sf_dir), mode="simple")
    # trained literal centroids: cell assignment/probing are pure
    # projections — the plan must not contain a centroid cross join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_weighted_sample_is_scan_level_no_shuffle(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import sampling

    df = sampling.q_weighted_sample(spark, sf_dir)
    assert exchanges(df) == 0
    schema = explain(df).split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "text" not in schema  # weight uses n_chars, never the body


def test_interval_overlap_is_not_cartesian(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import intervals

    plan = explain(intervals.q_session_error_overlap(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket join is a real equi-join on (user_id, bucket)
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_pack_sequences_offsets_broadcast(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import packing

    plan = explain(packing.q_pack_sequences(spark, sf_dir))
    # per-partition offsets join back broadcast, never a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_gate_single_shuffle(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import quality

    # both windows (rank + count) share the one lang exchange
    assert exchanges(quality.q_quality_gate_by_lang(spark, sf_dir)) == 1


def test_bloom_runtime_filter_lands_in_fact_scan(spark, sf_dir):
    """Under the bloom confs, the optimizer must inject a
    might_contain(bloom_filter_agg(o_orderkey)) predicate into the
    lineitem side of the fact-fact join; with default confs it must
    not (broadcast handles the local scale)."""
    with tpch.bloom_runtime_confs(spark):
        opt = (
            tpch.bloom_join_frame(spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
    assert "might_contain" in opt
    assert "bloom_filter_agg" in opt
    plain = (
        tpch.bloom_join_frame(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "might_contain" not in plain


def test_bloom_confs_restore_after_query(spark, sf_dir):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    tpch.q_bloom_pruned_revenue(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_scd2_is_single_shuffle(spark, sf_dir):
    """The SCD2 dimension build must share one exchange+sort between
    the cumulative sums and the lead() — not re-shuffle the renamed
    history frame."""
    assert exchanges(finance_queries.q_balance_scd2(spark, sf_dir)) == 1


def test_rolling_distinct_fanout_is_bounded(spark, sf_dir):
    """The 7-day rolling distinct must be the bounded-explode plan
    (sequence + explode), never a range self-join of raw events."""
    from thrivefinancedatapipeline_spark.plans import events_queries

    plan = explain(
        events_queries.q_events_rolling_distinct_users(spark, sf_dir),
        mode="simple",
    )
    assert "Generate explode" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def shuffles(df):
    """Count data-movement exchanges only (broadcast exchanges are
    cheap-by-design and counted separately)."""
    p = explain(df, mode="simple")
    return p.count("Exchange hashpartitioning") + p.count(
        "Exchange SinglePartition"
    ) + p.count("Exchange rangepartitioning")


def test_q2_broadcasts_dims_single_window_shuffle(spark, sf_dir):
    """Q2's group-wise min: every dim join is a broadcast; the only
    data movement is the window's part-key shuffle."""
    df = tpch.q_tpch_q2_min_cost_supplier(spark, sf_dir)
    plan = explain(df, mode="simple")
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    assert shuffles(df) == 1


def test_q9_single_fact_fact_shuffle(spark, sf_dir):
    """Q9: part/supplier/nation broadcast; at most the lineitem⋈orders
    join and the final agg move data."""
    df = tpch.q_tpch_q9_product_type_profit(spark, sf_dir)
    plan = explain(df, mode="simple")
    assert plan.count("BroadcastHashJoin") >= 3
    assert shuffles(df) <= 3


def test_q11_total_reuses_per_part_exchange(spark, sf_dir):
    """The grand-total scalar must not rescan lineitem at runtime:
    AQE's ReuseExchange dedupes the two canonically-identical per-part
    aggregate exchanges. Asserted on the FINAL adaptive plan (the
    static plan legitimately prints the subtree twice)."""
    df = tpch.q_tpch_q11_important_stock(spark, sf_dir)
    df.collect()
    plan = explain(df, mode="simple")
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_q16_part_dim_broadcasts(spark, sf_dir):
    df = tpch.q_tpch_q16_supplier_part_counts(spark, sf_dir)
    plan = explain(df, mode="simple")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    # exact countDistinct: group-key exchange + distinct expand, no more
    assert shuffles(df) <= 2


def test_q20_window_runs_on_reduced_pairs(spark, sf_dir):
    """Q20's per-part total must be computed over the (part,supplier)
    aggregate, never a window over raw lineitem: the pair groupBy
    exchange sits below the window exchange."""
    df = tpch.q_tpch_q20_dominant_suppliers(spark, sf_dir)
    plan = explain(df, mode="simple")
    assert "SortMergeJoin" not in plan
    w = plan.index("Window")
    agg = plan.index("Exchange hashpartitioning(l_partkey")
    assert agg > w  # printed tree: the groupBy exchange is BELOW the window


def test_fuzzy_match_has_no_cartesian(spark, sf_dir):
    """The lev join must be a blocked equi-join over the distinct name
    dictionary — never a cross product of parts."""
    from thrivefinancedatapipeline_spark.operators import dedup

    plan = explain(dedup.q_fuzzy_name_match(spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_referential_integrity_broadcasts_dims(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import quality

    plan = explain(quality.q_referential_integrity(spark, sf_dir),
                   mode="simple")
    # 4 declared dim edges → at least 4 broadcast anti-join builds
    assert plan.count("BroadcastHashJoin") >= 4


def test_interpolate_windows_share_one_exchange(spark, sf_dir):
    """Both interpolation bounds (backward + forward windows) must be
    derived in one pass over the original frame: exactly one exchange
    on event_type above the daily aggregate, not one per window."""
    from thrivefinancedatapipeline_spark.plans import events_queries

    df = events_queries.q_events_interpolate_linear(spark, sf_dir)
    plan = explain(df, mode="simple")
    assert plan.count("Exchange hashpartitioning(event_type#") <= 2


def test_chunker_is_zero_shuffle(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import textops

    assert shuffles(textops.q_corpus_chunk(spark, sf_dir)) == 0


def test_chunk_dedup_is_single_shuffle(spark, sf_dir):
    from thrivefinancedatapipeline_spark.operators import textops

    assert shuffles(textops.q_chunk_dedup(spark, sf_dir)) == 1


def test_bpe_apply_vocab_join_broadcasts(spark, sf_dir):
    """Corpus tokenization must be scan + BROADCAST hash join on the
    merged vocabulary — a shuffled join here would re-shuffle every
    token occurrence at 100 TB."""
    from thrivefinancedatapipeline_spark.operators.textops import q_bpe_apply

    plan = explain(q_bpe_apply(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_substring_spans_no_cartesian_and_bounded_shuffles(spark, sf_dir):
    """The >=2-doc gram join must stay an equi-join (no cartesian);
    the whole pipeline needs only the gram distinct/groupBy, the hits
    join, the per-doc window, the span agg and the final doc join —
    bounded shuffle count guards against accidental re-shuffles."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        q_dedup_substring_spans,
    )

    df = q_dedup_substring_spans(spark, sf_dir)
    plan = explain(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert exchanges(df) <= 6


def test_seasonal_decompose_truncates_daily_rollup(spark, sf_dir):
    """One events aggregation feeds trend window, seasonal fit and
    final join: the checkpointed rollup must leave ZERO parquet scans
    in the plan and bound the remaining (tiny-relation) shuffles."""
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        events_seasonal_decompose,
    )

    p = explain(events_seasonal_decompose(spark, sf_dir), mode="simple")
    assert "Scan parquet" not in p and "FileScan" not in p
    assert p.count("Exchange") <= 3


def test_robust_anomalies_truncates_daily_rollup(spark, sf_dir):
    """Median, devs, MAD and the final frame all read ONE
    materialized daily rollup — no repeated events aggregation."""
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        events_robust_anomalies,
    )

    p = explain(events_robust_anomalies(spark, sf_dir), mode="simple")
    assert "Scan parquet" not in p and "FileScan" not in p
    assert p.count("Exchange") <= 6
    assert p.count("BroadcastHashJoin") >= 2  # med + mad broadcast back


def test_bigram_coverage_single_fanout_no_cartesian(spark, sf_dir):
    """The bigram relation fans out per row (no self-join); scoring
    is one bg-key join + one doc groupBy."""
    from thrivefinancedatapipeline_spark.operators.textops import (
        corpus_bigram_coverage,
    )

    df = corpus_bigram_coverage(spark, sf_dir)
    p = explain(df, mode="simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("Exchange") <= 4


def test_pq_adc_scan_shape(spark, sf_dir):
    """The ADC scan is the ONE intended broadcast nested-loop
    (10-row LUT side x narrow codes relation); candidate pool and
    rerank broadcast; no shuffled fact-fact join anywhere."""
    from thrivefinancedatapipeline_spark.operators import similarity

    p = explain(similarity.pq_adc_knn(spark, sf_dir), mode="simple")
    assert p.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") == 0


def test_benford_is_one_events_aggregation(spark, sf_dir):
    """Spine and observed-count branches both read the checkpointed
    cells relation — events is aggregated ONCE (AQE cannot dedupe
    these two exchanges itself: the join's build-side null filter
    makes them non-canonical, measured before the checkpoint was
    added)."""
    from thrivefinancedatapipeline_spark.operators.quality import (
        benford_audit,
    )

    p = explain(benford_audit(spark, sf_dir), mode="simple")
    assert "Scan parquet" not in p and "FileScan" not in p
    assert p.count("Exchange") <= 2


def test_overdraft_is_single_shuffle(spark, sf_dir):
    """prev and post are two frames of ONE window over the original
    transaction columns — the aliased-ledger form measured 2
    exchanges and was rejected."""
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        overdraft_flags,
    )

    assert exchanges(overdraft_flags(spark, sf_dir)) == 1


def test_transition_matrix_single_scan_bounded_shuffles(spark, sf_dir):
    from thrivefinancedatapipeline_spark.plans.events_queries import (
        event_transition_matrix,
    )

    p = explain(event_transition_matrix(spark, sf_dir), mode="simple")
    assert p.count("Scan parquet") == 1
    # lag window + (from,to) groupBy + tiny row-normalization window
    assert p.count("Exchange") <= 3


def test_weighted_median_walks_reduced_cells(spark, sf_dir):
    from thrivefinancedatapipeline_spark.plans.advanced import (
        weighted_median_price,
    )

    df = weighted_median_price(spark, sf_dir)
    p = explain(df, mode="simple")
    assert p.count("Scan parquet") == 1
    # cells groupBy + per-flag window; the cumulative walk must run
    # over the distinct-reduced relation, never raw lineitem
    assert p.count("Exchange") <= 2


def test_snapshot_diff_is_single_shuffle(spark, sf_dir):
    """Both as-of snapshots derive from one ledger pass: window and
    conditional-max_by groupBy share the customerid exchange."""
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        balance_snapshot_diff,
    )

    assert exchanges(balance_snapshot_diff(spark, sf_dir)) == 1


def test_ivfpq_prunes_via_cell_equijoin(spark, sf_dir):
    """The defining IVF property: candidates come from an EQUI-join
    on cell — never the flat-PQ broadcast nested loop, never a
    cartesian."""
    from thrivefinancedatapipeline_spark.operators import similarity

    p = explain(similarity.ivfpq_knn(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_ann_family_final_adaptive_plan_shape(spark, sf_dir):
    """The r13->r14 ANN bench-drift watch, settled as a PIN: the three
    drifting queries' FINAL adaptive plans (isFinalPlan=true, the
    runtime truth AQE actually executed) contain zero sort-merge
    joins, zero cartesian products, and no more data-movement shuffles
    than the recorded PLANPROBE_r14 shape (4 / 2 / 2 hash exchanges at
    sf0.1) — so a future wall-time move on these queries with this
    test green is runner state by construction, and a plan regression
    (broadcast lost to SMJ, a new shuffle) fails loudly here instead
    of surfacing as unexplained bench drift."""
    from thrivefinancedatapipeline_spark.operators import similarity

    budgets = {
        "knn_ivfpq": (similarity.ivfpq_knn, 4),
        "ivf_knn": (similarity.q_ivf_knn, 2),
        "knn_bruteforce_cosine": (similarity.q_knn_bruteforce_cosine, 2),
    }
    for name, (fn, max_shuffles) in budgets.items():
        df = fn(spark, sf_dir)
        df.collect()
        p = explain(df, mode="simple")
        assert "isFinalPlan=true" in p, name
        assert "SortMergeJoin" not in p, name
        assert "CartesianProduct" not in p, name
        moved = (
            p.count("Exchange hashpartitioning")
            + p.count("Exchange SinglePartition")
            + p.count("Exchange rangepartitioning")
        )
        assert moved <= max_shuffles, (name, moved)


def test_dedup_family_final_adaptive_plan_shape(spark, sf_dir):
    """The r18 widening of the plan-attribution pin set (VERDICT r17
    item 5): the three heaviest dedup queries' FINAL adaptive plans
    contain zero sort-merge joins, zero cartesian products, and no
    more data-movement shuffles than the PLANPROBE_r18 shape (7 / 7 /
    0 hash exchanges — identical at sf0.001 and sf0.1, verified both).
    The checkpointed-shingle base severs scan lineage, so exchange and
    join-strategy counts are the pin, not scans."""
    from thrivefinancedatapipeline_spark.operators import dedup

    budgets = {
        "dedup_minhash_lsh": (dedup.q_dedup_minhash_lsh, 7),
        "dedup_containment": (dedup.dedup_containment, 7),
        "dedup_simhash_wide_pairs": (dedup.q_dedup_simhash_wide_pairs, 0),
    }
    for name, (fn, max_shuffles) in budgets.items():
        df = fn(spark, sf_dir)
        df.collect()
        p = explain(df, mode="simple")
        assert "isFinalPlan=true" in p, name
        assert "SortMergeJoin" not in p, name
        assert "CartesianProduct" not in p, name
        moved = (
            p.count("Exchange hashpartitioning")
            + p.count("Exchange SinglePartition")
            + p.count("Exchange rangepartitioning")
        )
        assert moved <= max_shuffles, (name, moved)
