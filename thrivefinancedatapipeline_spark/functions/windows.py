"""Window-shape helpers: the sanctioned alternatives to a
partition-less global window.

Spark's ``Window.orderBy(...)`` / ``Window.partitionBy()`` with no
partition columns funnels the ENTIRE relation through one task — the
"No Partition Defined" WindowExec warning exists to catch exactly that.
This module encodes the repo's policy for every case where a global
ordering/total is genuinely needed:

1. Relation grows with a data dimension (users, parts, vocab...):
   use ``operators.packing.ranged_row_number`` / ``ranged_scan`` —
   a two-phase ranged scan with no single-partition stage — or, for a
   global SCALAR, a 1-row aggregate ``crossJoin(F.broadcast(...))``-ed
   back (AQE's ReuseExchange dedupes the twice-printed subtree).
2. Global top-k with ranks: ``ranked_top_k`` below — a distributed
   TakeOrderedAndProject (orderBy + limit) followed by a rank window
   over the <= k survivors.
3. Windows over relations bounded BY CONSTRUCTION (fixed histogram
   buckets, enum-domain rollups, <= 24*|types| cells...):
   ``bounded_spec`` below — a DELIBERATE single partition, one pass,
   no second subtree.

``Window.partitionBy(F.lit(0))`` does NOT express case 3: Catalyst
inlines projection aliases into window partition specs and constant-
folds literal keys away, leaving exactly the empty spec the warning
guards (verified against Spark 4.1, including keys materialized via
``withColumn``; 4.1 even simplifies ``attr * 0`` to 0). ``bounded_spec``
therefore partitions on ``pmod(coalesce(length(cast(col as string)),
0), 1)``: it references a real attribute (non-foldable, and no
pmod-by-one simplification rule exists) yet evaluates to 0 for every
row, NULLs included — verified to survive the optimizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def constant_key(df: DataFrame) -> Column:
    """A constant-0 partition key Catalyst cannot fold away (see
    module docstring). Built from the relation's first column;
    evaluates to 0 for every row, including NULLs."""
    c = df.columns[0]
    return F.pmod(
        F.coalesce(F.length(F.col(c).cast("string")), F.lit(0)), F.lit(1)
    )


def bounded_spec(df: DataFrame) -> WindowSpec:
    """A DELIBERATE single-partition window over ``df`` — for
    relations whose row count is bounded by construction (never by
    data volume). Semantically identical to an empty
    ``Window.partitionBy()``: one pass, whole relation in one window
    partition; the non-foldable constant key marks it as a design
    decision. Chain ``.orderBy(...)/.rowsBetween(...)`` as usual. Do
    NOT use over anything that scales with a data dimension — that's
    ``ranged_row_number``'s job."""
    return Window.partitionBy(constant_key(df))


def ranked_top_k(df: DataFrame, order_cols: list, k: int,
                 rank_col: str = "rank") -> DataFrame:
    """Deterministic global top-k with a 1-based ``rank`` column.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — each
    partition keeps its local top-k and only those reach the merge —
    then the rank is a row_number over the <= k survivors (a bounded
    relation, so ``bounded_spec`` applies). Equals the
    ``row_number() OVER (ORDER BY ...) <= k`` global-window form
    row-for-row (the same total order decides both) without streaming
    the full relation through one WindowExec task. ``order_cols`` must
    be a total order (include a unique tiebreak)."""
    topk = df.orderBy(*order_cols).limit(k)
    w = bounded_spec(topk).orderBy(*order_cols)
    return topk.withColumn(rank_col, F.row_number().over(w))
