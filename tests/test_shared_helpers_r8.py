"""Direct unit pins for the r8 shared helpers — synthetic inputs vs
exact Python references, independent of the LSH/transaction chains
that exercise them end-to-end."""

import duckdb
import pytest
from pyspark.sql import functions as F


def test_pair_rate_matrix_python_reference(spark):
    """pair_rate_matrix on a hand-built label/pair set equals the
    exact Python rollup — including the C(n,2) same-label diagonal,
    cross-label products, canonicalization, and ppm floor-div."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        pair_rate_matrix,
    )

    labels = [(i, "a" if i < 5 else ("b" if i < 8 else "c"))
              for i in range(10)]
    pairs = [(0, 1), (1, 2), (0, 6), (6, 0), (5, 9), (2, 7), (8, 9)]
    # note (6, 0): doc_id order reversed vs (0, 6) — canonicalization
    # by label least/greatest must land both in the same cell
    ldf = spark.createDataFrame(labels, "doc_id long, lab string")
    pdf = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    got = sorted(
        tuple(r)
        for r in pair_rate_matrix(pdf, ldf, "lab", "rate_ppm").collect()
    )

    lab = dict(labels)
    n = {"a": 5, "b": 3, "c": 2}
    from collections import Counter

    cells = Counter()
    for x, y in pairs:
        a, b = sorted((lab[x], lab[y]))
        cells[(a, b)] += 1
    want = []
    for (a, b), c in sorted(cells.items()):
        poss = n[a] * (n[a] - 1) // 2 if a == b else n[a] * n[b]
        want.append(
            (a, b, c, n[a], n[b], poss, c * 1_000_000 // poss)
        )
    assert got == sorted(want)


def test_pair_rate_matrix_sql_twin_on_synthetic_tables(spark, tmp_path):
    """The SQL template equals the Spark helper on the same synthetic
    relations (labels via a parquet `documents` view; the pair oracle
    slot filled with a literal VALUES list)."""
    from thrivefinancedatapipeline_spark.operators.dedup import (
        pair_rate_matrix,
        pair_rate_matrix_sql,
    )

    labels = [(i, "x" if i % 3 else "y") for i in range(12)]
    pairs = [(0, 3), (1, 2), (4, 8), (5, 10), (9, 11), (3, 6)]
    ldf = spark.createDataFrame(labels, "doc_id long, source string")
    pdf = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    got = sorted(
        tuple(r)
        for r in pair_rate_matrix(pdf, ldf, "source", "dup_ppm").collect()
    )

    sql = pair_rate_matrix_sql(
        "SELECT doc_id, source FROM documents", "source", "dup_ppm"
    )
    # swap the nested minhash oracle for the literal pair list — the
    # template's FROM (...) p slot is exactly the pair relation
    start = sql.index("FROM (") + len("FROM (")
    depth = 1
    i = start
    while depth:
        depth += {"(": 1, ")": -1}.get(sql[i], 0)
        i += 1
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    inner = (
        f"SELECT * FROM (VALUES {vals}) AS v(doc_id_1, doc_id_2)"
    )
    sql2 = sql[:start] + inner + sql[i - 1:]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}')" for i, s in labels)
        + ") AS t(doc_id, source)"
    )
    want = sorted(tuple(r) for r in con.execute(sql2).fetchall())
    con.close()
    assert got == want


@pytest.mark.parametrize(
    "amount",
    [0.005, 0.015, 1.005, 2.675, 123.455, 0.0, 17.0, 99.994, 99.995],
)
def test_delta_cents_parity_on_rounding_boundaries(spark, amount):
    """delta_cents_col == DELTA_CENTS_SQL on .xx5 half-up boundary
    amounts for both signs — the bit-parity the four finance
    operators' oracles all lean on."""
    from thrivefinancedatapipeline_spark.plans.finance_queries import (
        DELTA_CENTS_SQL,
        delta_cents_col,
    )

    rows = [("earned", amount), ("spent", amount), ("expired", amount)]
    df = spark.createDataFrame(rows, "tctype string, amount double")
    got = [
        r.d for r in df.select(delta_cents_col().alias("d")).collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT " + DELTA_CENTS_SQL + " FROM (VALUES "
            + ", ".join(f"('{t}', {a}::DOUBLE)" for t, a in rows)
            + ") AS txns(tctype, amount)"
        ).fetchall()
    ]
    con.close()
    assert got == want
    assert got[0] > 0 > got[1] and got[1] == got[2] or amount == 0.0
