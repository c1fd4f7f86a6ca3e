"""Property tests for the global-window replacements: ranged_scan /
ranged_row_number / ranked_top_k must equal the single-window forms
they replace on arbitrary data — these helpers are load-bearing for a
dozen registered queries, so they get direct adversarial pins beyond
the per-query oracles."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # stream key
        st.integers(min_value=-50, max_value=50),   # order value
        st.integers(min_value=-5, max_value=9),     # summed value
    ),
    min_size=1,
    max_size=60,
)


def _df(spark, rows):
    # a unique id column provides the total-order tiebreak
    return spark.createDataFrame(
        [(g, o, v, i) for i, (g, o, v) in enumerate(rows)],
        "g int, o int, v long, uid int",
    )


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy)
def test_ranged_prefix_sum_equals_window(spark, rows):
    from thrivefinancedatapipeline_spark.operators.packing import (
        ranged_prefix_sum,
    )

    df = _df(spark, rows)
    got = {
        r.uid: r.cum
        for r in ranged_prefix_sum(df, ["g"], ["o", "uid"], "v", "cum")
        .collect()
    }
    # driver-side reference: per-stream running sum in (o, uid) order
    ref = {}
    by_g = {}
    for i, (g, o, v) in enumerate(rows):
        by_g.setdefault(g, []).append((o, i, v))
    for g, items in by_g.items():
        acc = 0
        for o, i, v in sorted(items):
            acc += v
            ref[i] = acc
    assert got == ref


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy)
def test_ranged_row_number_is_global_enumeration(spark, rows):
    from thrivefinancedatapipeline_spark.operators.packing import (
        ranged_row_number,
    )

    df = _df(spark, rows)
    got = {
        r.uid: r.rn
        for r in ranged_row_number(df, ["o", "uid"], "rn").collect()
    }
    order = sorted(
        (o, i) for i, (_g, o, _v) in enumerate(rows)
    )
    ref = {i: pos + 1 for pos, (_o, i) in enumerate(order)}
    assert got == ref


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=8))
def test_ranked_top_k_equals_window_form(spark, rows, k):
    from thrivefinancedatapipeline_spark.functions.windows import (
        ranked_top_k,
    )

    df = _df(spark, rows)
    order = [F.col("v").desc(), F.col("uid")]
    got = sorted(
        (r.rank, r.uid)
        for r in ranked_top_k(df, order, k).collect()
    )
    w = Window.orderBy(*order)
    want = sorted(
        (r.rank, r.uid)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )
    assert got == want
