"""Similarity search over the `embeddings` table.

- knn_bruteforce_cosine: exact top-k per query vector. The query set is
  tiny and broadcast; the candidate side streams — at 100 TB this is
  one pass over the corpus with a per-partition top-k (Spark's window
  rank pushes a partial TopK under AQE).
- knn_lsh: random-hyperplane LSH, MULTI-TABLE form: L independent
  hash tables of k planes each. Single-table sign-LSH has recall
  p^k per neighbor (p = 1 - θ/π); with L tables it is 1-(1-p^k)^L —
  the standard recall lever (k controls precision/bucket size, L
  controls recall). Hyperplane sign matrices are deterministic
  module-level literals (md5-seeded), embedded in BOTH the Spark
  plan and the DuckDB oracle, so even the approximate path is
  bit-exactly checkable. Bucket join keys are (table, signature) —
  L * 2^k buckets, uniform for random-ish vectors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datamodel import load_table
from ..functions.vector import as_double_vec, dot as _dot_v, norm as _norm_v

N_QUERIES = 10   # query set: vec_id < 10
TOP_K = 10
DIM = 64
K_PLANES = 4     # planes per hash table (bucket selectivity)
L_TABLES = 4     # independent tables (recall amplification)


def _plane_sign(j: int, i: int) -> float:
    """Deterministic ±1.0 from md5 — public construction, same value
    embedded in the SQL oracle."""
    h = hashlib.md5(f"plane{j}dim{i}".encode()).digest()[0]
    return 1.0 if h & 1 else -1.0


#: PLANES[t][j] = plane j of table t
PLANES = [
    [[_plane_sign(t * K_PLANES + j, i) for i in range(DIM)] for j in range(K_PLANES)]
    for t in range(L_TABLES)
]


def _vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double_vec(F.col("embedding"))
    return emb.select("vec_id", v.alias("v"), _norm_v(v).alias("nrm"))


def _dot(a, b):
    return _dot_v(a, b)


def q_knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: rank for each query vector (vec_id < N)."""
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


def _table_bucket_expr(t: int):
    """Sign-bit signature of hash table t against its k planes."""
    bucket = None
    for j, plane in enumerate(PLANES[t]):
        lit_plane = F.array(*[F.lit(s) for s in plane])
        proj = _dot(F.col("v"), lit_plane)
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def _bucketed(e: DataFrame) -> DataFrame:
    """(vec_id, v, nrm) -> one row per hash table: (..., table, bucket)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"), _table_bucket_expr(t).alias("bucket")
            )
            for t in range(L_TABLES)
        ]
    )
    return e.select(
        "vec_id", "v", "nrm", F.explode(entries).alias("tb")
    ).select(
        "vec_id", "v", "nrm",
        F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"),
    )


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates are the union of the query's
    bucket across the L hash tables, deduped, re-ranked by exact
    cosine. Multi-table is the recall lever single-bucket LSH lacks:
    1-(1-p^k)^L vs p^k per true neighbor."""
    b = _bucketed(_vectors(spark, sf_dir))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "table", "bucket",
    )
    c = b.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "table", "bucket",
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    e = _vectors(spark, sf_dir)
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    return (
        F.broadcast(q.select("query_id", "table", "bucket"))
        .join(c.select("neighbor_id", "table", "bucket"), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair can collide in several tables - count it once
        .select("query_id", "neighbor_id")
        .distinct()
        .join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


def _centroid_cols():
    """Element-wise mean of the embedding per group WITHOUT exploding:
    64 partial-aggregable avg expressions — the shuffle carries one
    64-double agg state per (group, partition), not dim× row blowup.
    Rounded to 6 decimals so downstream assignment is bit-identical
    across engines."""
    return [
        F.round(F.avg(F.element_at(F.col("embedding"), i + 1).cast("double")), 6)
        for i in range(DIM)
    ]


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, flat (label, dim, centroid, n)."""
    emb = load_table(spark, sf_dir, "embeddings")
    agg = emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.array(*_centroid_cols()).alias("cv"),
    )
    return agg.select(
        "label", "n_vectors", F.posexplode("cv").alias("dim", "centroid")
    ).select("label", F.col("dim").cast("int").alias("dim"), "centroid", "n_vectors")


N_PROBE = 2


def _scored_cells(spark, sf_dir):
    """(vectors, vector×centroid scores): centroids per label are the
    deterministic stand-in for a k-means coarse quantizer (at scale:
    k-means||, same downstream plan)."""
    e = _vectors(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.groupBy("label").agg(F.array(*_centroid_cols()).alias("cv"))
    cent = cent.select(
        F.col("label").alias("cell"), "cv",
        F.sqrt(_dot(F.col("cv"), F.col("cv"))).alias("cnrm"),
    )
    scored = e.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))
    )
    return e, scored


def q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: vectors assigned to their nearest centroid cell;
    each query probes its N_PROBE nearest cells and exact-ranks only
    those candidates. One broadcast of the (tiny) centroid set, one
    shuffle on cell — the 100 TB shape for billion-vector search.

    Cell assignment is a `max_by` aggregation (partial-aggregable, no
    per-vector sort); only the tiny query set pays a ranking window
    for its N_PROBE cells. The scored relation feeds both the
    assignment and the probe; recomputing it beats caching — the
    relation is dominated by 64-double array columns, and columnar
    cache materialization of wide arrays costs more than the
    (pipelined, pruned) recompute. Measured, not assumed."""
    e, scored = _scored_cells(spark, sf_dir)
    # argmax by (ccos, then lowest cell) — struct comparison is
    # lexicographic, so max(struct(ccos, -cell)) == the window's
    # (ccos DESC, cell ASC) first row
    asg = scored.groupBy("vec_id").agg(
        F.max_by(
            "cell", F.struct(F.col("ccos"), (-F.col("cell")).alias("negc"))
        ).alias("cell")
    ).select(F.col("vec_id").alias("neighbor_id"), "cell")
    probe = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("ccos").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(probe)
        .join(asg, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


QUERIES = {
    "knn_bruteforce_cosine": q_knn_bruteforce_cosine,
    "knn_lsh": q_knn_lsh,
    "embedding_centroids": q_embedding_centroids,
    "ivf_knn": q_ivf_knn,
}


def _plane_sql(t: int, j: int) -> str:
    vals = ", ".join(str(s) for s in PLANES[t][j])
    return f"list_dot_product(v, [{vals}])"


def table_bucket_sql(t: int) -> str:
    """DuckDB twin of _table_bucket_expr(t) (shared with dedup)."""
    return " + ".join(
        f"(CASE WHEN {_plane_sql(t, j)} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(K_PLANES)
    )


#: (vec_id, table, bucket) across all L tables, given a CTE exposing v
BANDS_SQL = "\nUNION ALL\n".join(
    f"SELECT vec_id, {t} AS table_id, CAST({table_bucket_sql(t)} AS INT)"
    f" AS bucket FROM e"
    for t in range(L_TABLES)
)

_VEC_CTE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings)
""".strip()

_CENT_CTES = """
cexp AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS el,
                generate_subscripts(embedding, 1) AS pos
         FROM embeddings),
cagg AS (SELECT label, pos, ROUND(AVG(el), 6) AS c
         FROM cexp GROUP BY label, pos)
""".strip()

ORACLES = {
    "embedding_centroids": f"""
WITH {_CENT_CTES},
n AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT cagg.label, CAST(pos - 1 AS INT) AS dim, c AS centroid, n.n_vectors
FROM cagg JOIN n ON cagg.label = n.label""",
    "ivf_knn": f"""
WITH {_VEC_CTE},
{_CENT_CTES},
cent AS (SELECT label AS cell, list(c ORDER BY pos) AS cv
         FROM cagg GROUP BY label),
cent2 AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM cent),
ranked AS (
  SELECT e.vec_id, c.cell,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.v, c.cv) / (e.nrm * c.cnrm) DESC,
                    c.cell) AS rn
  FROM e CROSS JOIN cent2 c),
asg AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rn = 1),
probe AS (SELECT vec_id AS query_id, cell FROM ranked
          WHERE vec_id < {N_QUERIES} AND rn <= {N_PROBE}),
cand AS (SELECT p.query_id, a.neighbor_id
         FROM probe p JOIN asg a USING (cell)
         WHERE p.query_id <> a.neighbor_id)
SELECT cand.query_id, cand.neighbor_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY cand.query_id
         ORDER BY list_dot_product(q.v, nb.v) / (q.nrm * nb.nrm) DESC,
                  cand.neighbor_id) AS INT) AS rank
FROM cand
JOIN e q ON q.vec_id = cand.query_id
JOIN e nb ON nb.vec_id = cand.neighbor_id
QUALIFY rank <= {TOP_K}""",
    "knn_bruteforce_cosine": f"""
WITH {_VEC_CTE}
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                  c.vec_id) AS INT) AS rank
FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
QUALIFY rank <= {TOP_K}""",
    "knn_lsh": f"""
WITH {_VEC_CTE},
bands AS ({BANDS_SQL}),
cand AS (
  SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS neighbor_id
  FROM bands bq JOIN bands bc
    ON bq.table_id = bc.table_id AND bq.bucket = bc.bucket
  WHERE bq.vec_id < {N_QUERIES} AND bq.vec_id <> bc.vec_id)
SELECT cand.query_id, cand.neighbor_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY cand.query_id
         ORDER BY list_dot_product(q.v, nb.v) / (q.nrm * nb.nrm) DESC,
                  cand.neighbor_id) AS INT) AS rank
FROM cand
JOIN e q ON q.vec_id = cand.query_id
JOIN e nb ON nb.vec_id = cand.neighbor_id
QUALIFY rank <= {TOP_K}""",
}
