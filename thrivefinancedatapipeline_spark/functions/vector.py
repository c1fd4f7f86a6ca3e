"""Vector column expressions (pure built-ins, whole-stage codegen).

Shared by operators/similarity.py and operators/dedup.py. Everything
here is a higher-order-function expression over `array<double>` — no
UDF, no Python worker. The DuckDB twin of `dot` is
`list_dot_product`; both fold the array in index order, so cosine
comparisons and rank orderings agree bit-for-bit across engines (the
property every oracle-checked kNN/dedup query relies on).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(c: Column) -> Column:
    """float array → double array (exact widening)."""
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms (never recompute norms inside a
    join — they belong on the row before the fan-out)."""
    return dot(a, b) / (norm_a * norm_b)
