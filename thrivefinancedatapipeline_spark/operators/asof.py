"""Generic distributed as-of join.

Spark has no native ASOF JOIN (DuckDB/kdb+/Flink do); the scalable
re-expression is the *union-and-window* plan:

1. tag both inputs and union them into one relation,
2. one window over (key, time, side) carries the latest right-side
   payload forward with ``last(..., ignorenulls=True)``,
3. keep the left rows.

Cost: ONE shuffle on the join key (the union is shuffle-free), no
range explosion, skew behaves like any window over the key. This is
the plan a 100 TB as-of join wants — the naive
``join + filter + row_number`` form materializes every (left, right)
time pair first.

Semantics: for each left row, the right row with the greatest
``right_ts <= left_ts`` for the same key (ASOF ``<=``; a same-instant
right row matches). Right rows must be unique per (key, time): either
pre-aggregate ties, or pass ``right_tiebreak`` (keep the max of that
column) — the tiebreak rides the same window sort, so it costs no
extra shuffle where a pre-aggregation would.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join `left` to the latest `right` row at-or-before it
    (direction='backward', the default) or the earliest at-or-after
    (direction='forward' — e.g. time-to-next-event analyses).

    Returns all left columns plus every non-key right column (null
    when no right row precedes/follows the left row). Non-key column
    names must not collide between the two inputs. With
    `right_tiebreak`, equal-time right rows resolve to the max
    (backward) / min (forward) of that column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    on = list(on)
    lpay = [c for c in left.columns if c not in on]
    rpay = [c for c in right.columns if c not in on]
    overlap = set(lpay) & set(rpay)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    l_struct = F.struct(*lpay)
    r_struct = F.struct(*rpay)
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType

    backward = direction == "backward"
    # backward: right sorts BEFORE left at equal __t (ASOF `<=`) and
    # the window looks back; forward: right sorts AFTER left (`>=`)
    # and the window looks ahead.
    left_side, right_side = (1, 0) if backward else (0, 1)
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(left_side).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(right_side).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    order = [F.col("__t"), F.col("__side")]
    if right_tiebreak is not None:
        # backward: ascending → max-tiebreak row sorts last and wins
        # (last());  forward: ascending → min-tiebreak wins (first())
        order.append(F.col("__r")[right_tiebreak])
    w = Window.partitionBy(*on).orderBy(*order)
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__r", ignorenulls=True)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__r", ignorenulls=True)
    return (
        tagged_left.unionByName(tagged_right)
        .withColumn("__rm", pick.over(w))
        .filter(F.col("__side") == left_side)
        .select(
            *on,
            *[F.col("__l")[c].alias(c) for c in lpay],
            *[F.col("__rm")[c].alias(c) for c in rpay],
        )
    )
