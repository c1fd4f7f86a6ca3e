"""Sequence packing: assign documents to fixed token-budget packs.

Pretraining pipelines concatenate documents per stream (language,
source, ...) into fixed-length context windows; the assignment each
doc needs is WHERE ITS FIRST TOKEN LANDS in the stream's running token
count — a per-stream prefix sum. The naive Spark form is a window
``SUM() OVER (PARTITION BY stream ORDER BY doc_id)``, which funnels an
entire stream through ONE task: a 40-TB English stream in a 100-TB
corpus is a single-reducer hotspot, the classic window-skew failure.

``ranged_prefix_sum`` is the scalable re-expression — the textbook
two-phase distributed scan:

1. range-repartition by (stream, order) and pin the layout with one
   localCheckpoint (partition ids must be STABLE between the two
   passes — range boundaries come from sampling, so computing the
   relation twice could disagree),
2. per-partition totals per stream — a tiny aggregate (#partitions x
   #streams rows) joined back broadcast as each partition's offset,
3. a window partitioned by (stream, partition-id): hundreds of
   bounded-size tasks instead of one per stream.

The OUTPUT equals the single-window form row-for-row (offsets
reconstruct the global scan regardless of where the range boundaries
fell), so the DuckDB oracle stays the plain window SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datamodel import load_table
from ..functions.text import tokens, norm_sql

#: tokens per pack (a context-window's worth)
PACK_BUDGET = 2_048


def ranged_scan(
    df: DataFrame,
    stream_cols: list[str],
    order_cols: list[str],
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Inclusive running sums of several value columns per stream in
    (stream, order) order, without a per-stream single-reducer window.
    ``pairs`` is a list of (value_col, out_col). Ordering must be a
    total order within each stream (include a unique tiebreak column).
    One ranged repartition + one checkpoint regardless of how many
    running sums are derived — cum-revenue and rank (value 1) share
    the same two-phase scan."""
    keys = [*stream_cols, *order_cols]
    d = (
        df.repartitionByRange(*keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin sampled range boundaries
    )
    totals = d.groupBy(*stream_cols, "_pid").agg(
        *[F.sum(v).alias(f"_pt_{o}") for v, o in pairs]
    )
    # each partition's offset = sum of earlier partitions' totals for
    # the same stream — a window over the TINY totals relation
    w_off = (
        Window.partitionBy(*stream_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *stream_cols,
        "_pid",
        *[
            F.coalesce(F.sum(f"_pt_{o}").over(w_off), F.lit(0)).alias(
                f"_off_{o}"
            )
            for _, o in pairs
        ],
    )
    w_local = (
        Window.partitionBy(*stream_cols, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = d.join(F.broadcast(offsets), [*stream_cols, "_pid"])
    for v, o in pairs:
        out = out.withColumn(o, F.sum(v).over(w_local) + F.col(f"_off_{o}"))
    return out.drop("_pid", *[f"_off_{o}" for _, o in pairs])


def ranged_prefix_sum(
    df: DataFrame,
    stream_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Inclusive running sum of `value_col` per stream — the one-value
    form of ``ranged_scan``."""
    return ranged_scan(df, stream_cols, order_cols, [(value_col, out_col)])


def ranged_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "_rn",
) -> DataFrame:
    """Global 1-based row number under the ASCENDING total order of
    ``order_cols`` (include a unique tiebreak; for a descending key,
    negate it), with NO single-partition window — the same two-phase
    ranged scan as ``ranged_prefix_sum`` with a unit value and one
    global stream. The constant stream key keeps every window's
    partition spec non-empty (the tiny offsets window included), so
    no plan stage funnels the relation through one task.

    This is the scale-safe replacement for
    ``row_number()/ntile()/percent_rank() OVER (ORDER BY ...)``:
    at 10^8+ rows the global-window form is a single-task sort, while
    this form is hundreds of bounded range partitions plus one
    broadcast of per-partition counts."""
    d = df.withColumn("_g", F.lit(0)).withColumn("_one", F.lit(1))
    out = ranged_prefix_sum(d, ["_g"], list(order_cols), "_one", out_col)
    return out.drop("_g", "_one")


def pack_assignments(
    docs: DataFrame,
    stream_cols: list[str],
    order_cols: list[str],
    n_tokens_col: str,
    budget: int = PACK_BUDGET,
) -> DataFrame:
    """pack_id / pack_offset per document: the pack where the doc's
    first token lands when the stream is concatenated in order and
    chunked every `budget` tokens (documents may straddle packs — the
    standard pretraining packing, not bin-packing)."""
    cum = ranged_prefix_sum(
        docs, stream_cols, order_cols, n_tokens_col, "_cum"
    )
    before = F.col("_cum") - F.col(n_tokens_col)
    return cum.select(
        *stream_cols,
        *order_cols,
        n_tokens_col,
        F.floor(before / budget).alias("pack_id"),
        (before % budget).alias("pack_offset"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sequence packing of the documents corpus into
    2048-token packs, ordered by doc_id within each language."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return pack_assignments(docs, ["lang"], ["doc_id"], "n_tokens")


QUERIES = {
    "pack_sequences": q_pack_sequences,
}

ORACLES = {
    # the oracle IS the single-window form the distributed scan equals
    "pack_sequences": f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split({norm_sql("text")}, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS before
  FROM toks
)
SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(CAST(before AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST(before % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM cum""",
}


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk-level packing plan — the composition a pretraining
    data build actually runs: chunk documents into overlapping token
    windows (`corpus_chunk`), drop cross-document duplicate chunks
    (`chunk_dedup` survivors), then assign each surviving chunk its
    context-window pack per language stream via the same ranged
    prefix sum as document packing (no per-stream single-reducer
    window). Order within a stream is (doc_id, chunk_idx) — document
    order with chunks kept contiguous."""
    from .textops import q_chunk_dedup

    chunks = q_chunk_dedup(spark, sf_dir).select(
        "doc_id", "chunk_idx", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    lang = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = chunks.join(lang, "doc_id")
    return pack_assignments(
        j, ["lang"], ["doc_id", "chunk_idx"], "n_tokens"
    )


QUERIES["pack_chunks"] = q_pack_chunks


def _pack_chunks_oracle() -> str:
    from .textops import CHUNK_H_CTES, CHUNK_SURVIVORS_SQL

    return f"""
WITH {CHUNK_H_CTES},
{CHUNK_SURVIVORS_SQL},
j AS (
  SELECT d2.lang, surv.doc_id, surv.chunk_idx,
         CAST(surv.n_tokens AS BIGINT) AS n_tokens
  FROM surv JOIN documents d2 ON d2.doc_id = surv.doc_id),
cum AS (
  SELECT lang, doc_id, chunk_idx, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang
                             ORDER BY doc_id, chunk_idx
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS before
  FROM j)
SELECT lang, doc_id, chunk_idx, n_tokens,
       CAST(before // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(before % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM cum"""


ORACLES["pack_chunks"] = _pack_chunks_oracle()


# ---------------------------------------------------------------------------
# PREBUILT (r7-staged, NOT yet registered — tools/check_prebuilt.py).
# ---------------------------------------------------------------------------

def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit a pretraining data build runs AFTER packing: per
    language — pack count, token fill ratio of the allocated
    capacity (integer ppm), and how many documents straddle a pack
    boundary (boundary-crossers are the rows whose attention masks
    need document-boundary resets; a packing plan is judged by high
    fill and few crossers). Derived entirely from the proven
    pack_sequences assignment, so the audit and the plan can never
    disagree. Prebuilt r7 (tools/check_prebuilt.py).

    Scale shape: one per-language rollup over the packing output —
    the assignment's ranged prefix sum remains the only heavy pass."""
    p = q_pack_sequences(spark, sf_dir)
    # packs CONSUMED = ceil(total/budget): the last doc's tokens spill
    # past the last start-position pack, and that tail capacity is
    # real (max(pack_id)+1 undercounts it — caught by the fill<=1e6
    # invariant test)
    agg = p.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.expr(
            f"CAST((sum(n_tokens) + {PACK_BUDGET} - 1)"
            f" div {PACK_BUDGET} AS BIGINT)"
        ).alias("n_packs"),
        F.sum(
            (
                F.col("pack_offset") + F.col("n_tokens") > PACK_BUDGET
            ).cast("long")
        ).alias("n_split_docs"),
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("n_packs").cast("long").alias("n_packs"),
        F.col("n_split_docs").cast("long").alias("n_split_docs"),
        F.expr(
            "CAST(CAST(total_tokens AS DECIMAL(38,0)) * 1000000"
            f" div (n_packs * {PACK_BUDGET}) AS BIGINT)"
        ).alias("fill_ppm"),
    )


PACKING_EFFICIENCY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split({norm_sql("text")}, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS before
  FROM toks
),
asg AS (
  SELECT lang, n_tokens,
         CAST(FLOOR(CAST(before AS DOUBLE) / {PACK_BUDGET}) AS BIGINT)
           AS pack_id,
         CAST(before % {PACK_BUDGET} AS BIGINT) AS pack_offset
  FROM cum
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tokens) + {PACK_BUDGET} - 1) // {PACK_BUDGET}
            AS BIGINT) AS n_packs,
       CAST(COUNT(CASE WHEN pack_offset + n_tokens > {PACK_BUDGET}
                       THEN 1 END) AS BIGINT) AS n_split_docs,
       CAST(CAST(SUM(n_tokens) AS HUGEINT) * 1000000
            // (((SUM(n_tokens) + {PACK_BUDGET} - 1) // {PACK_BUDGET})
                * {PACK_BUDGET}) AS BIGINT) AS fill_ppm
FROM asg GROUP BY lang"""


# Registered r8 (staged r7 behind tools/check_prebuilt.py, gate-green
# and two-SF pinned in tests/test_prebuilt_r8.py before promotion).
QUERIES["packing_efficiency"] = packing_efficiency
ORACLES["packing_efficiency"] = PACKING_EFFICIENCY_ORACLE


# ---------------------------------------------------------------------------
# r9-staged prebuilds, registered in round 10.
# ---------------------------------------------------------------------------

#: (window, stride) points of the token-cost curve: each window with
#: and without the production overlap (window - stride context carry)
TOKEN_COST_GRID = ((64, 56), (64, 64), (128, 112), (128, 128),
                   (256, 224), (256, 256))


def source_token_cost_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokens shipped per source at every (window, stride) chunking
    point, through packing — the data-buyer's cost model (r8 VERDICT
    item 4): overlap chunking multiplies raw tokens by the context
    carry (`blowup_ppm`), packing pads the chunk stream to whole
    2048-token packs (`fill_ppm`), and the curve prices each
    configuration per source before anyone pays to train on it. The
    chunk arithmetic is exactly `textops.chunk_documents`' start/size
    rule (equivalence at the production (64, 56) point is
    test-pinned), evaluated in closed form from token counts.

    Scale shape — the reason this is NOT chunk-and-count six times:
    chunk starts and sizes depend only on a document's token count,
    so the curve needs one pass computing (source, n_tokens) CELLS
    (map-side combinable; cells are bounded by |sources| x max doc
    length, ~10^5 rows at 100 TB) and then evaluates the per-cell
    chunk fan-out for all six grid points over cell rows only. The
    corpus-scale explode the real chunker pays never happens here.

    Integer-exact throughout: per-cell totals fold over the start
    sequence (one interpreted pass over <= n/stride elements per
    cell), rollups widen to DECIMAL(38,0) before count x token
    products (the ANSI-overflow rule)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens(F.col("text"))).alias("n")
    )
    cells = docs.groupBy("source", "n").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(w).alias("win_tokens"),
                    F.lit(s).alias("stride_tokens"),
                )
                for w, s in TOKEN_COST_GRID
            ]
        )
    ).alias("g")
    pts = cells.select("source", "n", "cnt", grid).select(
        "source", "n", "cnt",
        F.col("g.win_tokens").alias("win_tokens"),
        F.col("g.stride_tokens").alias("stride_tokens"),
    )
    # chunk_documents' start rule: s = 0, stride, 2*stride, ... kept
    # while the chunk covers new tokens; chunk size = min(win, n - s)
    per = pts.select(
        "source", "cnt", "win_tokens", "stride_tokens",
        F.col("n").cast("long").alias("n"),
        F.expr(
            "filter(sequence(0, greatest(n - 1, 0), stride_tokens),"
            " s -> s = 0 OR s + (win_tokens - stride_tokens) < n)"
        ).alias("starts"),
    ).select(
        "source", "cnt", "win_tokens", "stride_tokens", "n",
        F.size("starts").cast("long").alias("nch"),
        F.expr(
            "aggregate(starts, CAST(0 AS BIGINT),"
            " (acc, s) -> acc + least(CAST(win_tokens AS BIGINT), n - s))"
        ).alias("ctoks"),
    )
    agg = per.groupBy("source", "win_tokens", "stride_tokens").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.expr(
            "CAST(sum(CAST(cnt AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("raw_tokens"),
        F.expr(
            "CAST(sum(CAST(cnt AS DECIMAL(38,0)) * nch) AS BIGINT)"
        ).alias("n_chunks"),
        F.expr(
            "CAST(sum(CAST(cnt AS DECIMAL(38,0)) * ctoks) AS BIGINT)"
        ).alias("chunk_tokens"),
    )
    return agg.select(
        "source",
        F.col("win_tokens").cast("int").alias("win_tokens"),
        F.col("stride_tokens").cast("int").alias("stride_tokens"),
        "n_docs",
        "raw_tokens",
        "n_chunks",
        "chunk_tokens",
        F.expr(
            f"CAST((chunk_tokens + {PACK_BUDGET} - 1)"
            f" div {PACK_BUDGET} AS BIGINT)"
        ).alias("n_packs"),
        F.expr(
            "CAST(CAST(chunk_tokens AS DECIMAL(38,0)) * 1000000"
            " div raw_tokens AS BIGINT)"
        ).alias("blowup_ppm"),
        F.expr(
            "CAST(CAST(chunk_tokens AS DECIMAL(38,0)) * 1000000"
            f" div (((chunk_tokens + {PACK_BUDGET} - 1)"
            f" div {PACK_BUDGET}) * {PACK_BUDGET}) AS BIGINT)"
        ).alias("fill_ppm"),
    )


_TCC_GRID_VALUES = ", ".join(f"({w}, {s})" for w, s in TOKEN_COST_GRID)

SOURCE_TOKEN_COST_CURVE_ORACLE = f"""
WITH toks AS (
  SELECT source, len(string_split({norm_sql("text")}, ' ')) AS n
  FROM documents),
cells AS (
  SELECT source, n, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2),
grid(win_tokens, stride_tokens) AS (VALUES {_TCC_GRID_VALUES}),
st AS (
  SELECT c.source, c.n, c.cnt, g.win_tokens, g.stride_tokens, u.s
  FROM cells c CROSS JOIN grid g,
       unnest(range(0, greatest(c.n, 1), g.stride_tokens)) AS u(s)
  WHERE u.s = 0 OR u.s + (g.win_tokens - g.stride_tokens) < c.n),
percell AS (
  SELECT source, win_tokens, stride_tokens, n, cnt,
         CAST(COUNT(*) AS BIGINT) AS nch,
         CAST(SUM(least(win_tokens, n - s)) AS BIGINT) AS ctoks
  FROM st GROUP BY 1, 2, 3, 4, 5),
agg AS (
  SELECT source, win_tokens, stride_tokens,
         CAST(SUM(cnt) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(cnt AS HUGEINT) * n) AS BIGINT) AS raw_tokens,
         CAST(SUM(CAST(cnt AS HUGEINT) * nch) AS BIGINT) AS n_chunks,
         CAST(SUM(CAST(cnt AS HUGEINT) * ctoks) AS BIGINT)
           AS chunk_tokens
  FROM percell GROUP BY 1, 2, 3)
SELECT source,
       CAST(win_tokens AS INT) AS win_tokens,
       CAST(stride_tokens AS INT) AS stride_tokens,
       n_docs, raw_tokens, n_chunks, chunk_tokens,
       CAST((chunk_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET}
            AS BIGINT) AS n_packs,
       CAST(CAST(chunk_tokens AS HUGEINT) * 1000000 // raw_tokens
            AS BIGINT) AS blowup_ppm,
       CAST(CAST(chunk_tokens AS HUGEINT) * 1000000
            // (((chunk_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET})
                * {PACK_BUDGET}) AS BIGINT) AS fill_ppm
FROM agg"""


def source_token_cost_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Period-over-period TOKEN-COST drift per source at the
    production chunking point — the budget companion of
    source_jaccard_drift (content) and source_familiarity_drift
    (distribution): a provider silently doubling its shipped volume
    (or shrinking it) moves the buyer's bill before it moves any
    quality metric. Arrival periods come from the ingest event
    stream (event_id = doc_id, the drift convention); per period the
    closed-form chunk arithmetic of source_token_cost_curve prices
    the shipped tokens at (CHUNK_TOKENS, CHUNK_STRIDE); consecutive
    periods compare as an exact integer RATIO (cur x 1e6 div prev —
    a signed delta would floor differently across engines below
    zero; a ratio is always positive).

    Scale: one (source, period, n_tokens)-cell reduce is the only
    corpus-scale pass (map-side combinable); chunk arithmetic and
    the lag run over cell/period rows."""
    from .textops import CHUNK_STRIDE, CHUNK_TOKENS

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n")
    )
    ingest = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("doc_id"),
        F.expr(
            "datediff(to_date(ts), DATE '1970-01-01')"
        ).alias("epoch_day"),
    )
    cells = (
        docs.join(ingest, "doc_id")
        .groupBy("source", "epoch_day", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w, st = CHUNK_TOKENS, CHUNK_STRIDE
    per = cells.select(
        "source", "epoch_day", "cnt",
        F.col("n").cast("long").alias("n"),
        F.expr(
            f"filter(sequence(0, greatest(n - 1, 0), {st}),"
            f" s -> s = 0 OR s + {w - st} < n)"
        ).alias("starts"),
    ).select(
        "source", "epoch_day", "cnt",
        F.expr(
            "aggregate(starts, CAST(0 AS BIGINT),"
            f" (acc, s) -> acc + least(CAST({w} AS BIGINT), n - s))"
        ).alias("ctoks"),
    )
    perday = per.groupBy("source", "epoch_day").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.expr(
            "CAST(sum(CAST(cnt AS DECIMAL(38,0)) * ctoks) AS BIGINT)"
        ).alias("chunk_tokens"),
    )
    wlag = Window.partitionBy("source").orderBy("epoch_day")
    lagged = perday.select(
        "source",
        F.col("epoch_day").cast("long").alias("epoch_day"),
        "n_docs",
        "chunk_tokens",
        F.lag("epoch_day").over(wlag).cast("long").alias("prev_day"),
        F.lag("chunk_tokens").over(wlag).alias("prev_tokens"),
    ).filter(F.col("prev_day").isNotNull())
    return lagged.select(
        "source", "epoch_day", "prev_day", "n_docs", "chunk_tokens",
        F.col("prev_tokens").cast("long").alias("prev_tokens"),
        F.expr(
            "CAST(CAST(chunk_tokens AS DECIMAL(38,0)) * 1000000"
            " div prev_tokens AS BIGINT)"
        ).alias("ratio_ppm"),
    )


def _token_cost_drift_oracle() -> str:
    from .textops import CHUNK_STRIDE, CHUNK_TOKENS

    w, st = CHUNK_TOKENS, CHUNK_STRIDE
    return f"""
WITH docs AS (
  SELECT d.source,
         datediff('day', DATE '1970-01-01', CAST(e.ts AS DATE))
           AS epoch_day,
         len(string_split({norm_sql("d.text")}, ' ')) AS n
  FROM documents d JOIN events e ON e.event_id = d.doc_id),
cells AS (
  SELECT source, epoch_day, n, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM docs GROUP BY 1, 2, 3),
st AS (
  SELECT source, epoch_day, n, cnt, u.s
  FROM cells, unnest(range(0, greatest(n, 1), {st})) AS u(s)
  WHERE u.s = 0 OR u.s + {w - st} < n),
percell AS (
  SELECT source, epoch_day, n, cnt,
         CAST(SUM(least({w}, n - s)) AS BIGINT) AS ctoks
  FROM st GROUP BY 1, 2, 3, 4),
perday AS (
  SELECT source, CAST(epoch_day AS BIGINT) AS epoch_day,
         CAST(SUM(cnt) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(cnt AS HUGEINT) * ctoks) AS BIGINT)
           AS chunk_tokens
  FROM percell GROUP BY 1, 2),
lagged AS (
  SELECT source, epoch_day, n_docs, chunk_tokens,
         LAG(epoch_day) OVER w AS prev_day,
         LAG(chunk_tokens) OVER w AS prev_tokens
  FROM perday
  WINDOW w AS (PARTITION BY source ORDER BY epoch_day))
SELECT source, epoch_day, CAST(prev_day AS BIGINT) AS prev_day,
       n_docs, chunk_tokens,
       CAST(prev_tokens AS BIGINT) AS prev_tokens,
       CAST(CAST(chunk_tokens AS HUGEINT) * 1000000 // prev_tokens
            AS BIGINT) AS ratio_ppm
FROM lagged WHERE prev_day IS NOT NULL"""


TOKEN_COST_DRIFT_ORACLE = _token_cost_drift_oracle()

QUERIES["source_token_cost_curve"] = source_token_cost_curve
ORACLES["source_token_cost_curve"] = SOURCE_TOKEN_COST_CURVE_ORACLE
QUERIES["source_token_cost_drift"] = source_token_cost_drift
ORACLES["source_token_cost_drift"] = TOKEN_COST_DRIFT_ORACLE


# ---------------------------------------------------------------------------
# PREBUILT (r11-staged, NOT yet registered — tools/check_prebuilt.py).
# ---------------------------------------------------------------------------

#: context-window budgets swept by pack_budget_sweep — the registered
#: PACK_BUDGET (2048) bracketed by a 4x shorter and a 4x longer
#: window, the question every context-length change actually asks of
#: the data pipeline ("what does 8k context do to fill and document
#: splitting?").
PACK_SWEEP_BUDGETS = (512, 2_048, 8_192)


def pack_budget_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """packing_efficiency evaluated at every context-window budget in
    {PACK_SWEEP_BUDGETS}, per language stream: pack count, token fill
    of the allocated capacity (integer ppm), and how many documents
    straddle a pack boundary. Longer windows raise fill and split
    more documents (more attention-mask resets); the 3-point curve is
    what a context-length migration reads before re-packing 100 TB.

    Scale posture: the cumulative token position (`before`) does NOT
    depend on the budget, so the ranged prefix sum — the only heavy
    pass — runs ONCE; the sweep is a 3-way explode over an integer
    column of an existing row, then one groupBy on <= |budgets| x
    |langs| cells. Sweeping costs nothing but the rollup."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    cum = ranged_prefix_sum(docs, ["lang"], ["doc_id"], "n_tokens", "_cum")
    sweep = cum.select(
        "lang",
        "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("before"),
        F.explode(
            F.array(*[F.lit(b) for b in PACK_SWEEP_BUDGETS])
        ).alias("budget"),
    )
    agg = sweep.groupBy("budget", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(
            (F.col("before") % F.col("budget") + F.col("n_tokens")
             > F.col("budget")).cast("long")
        ).alias("n_split_docs"),
    )
    return agg.select(
        F.col("budget").cast("int").alias("budget"),
        "lang",
        "n_docs",
        "total_tokens",
        F.expr(
            "CAST((total_tokens + budget - 1) div budget AS BIGINT)"
        ).alias("n_packs"),
        "n_split_docs",
        F.expr(
            "CAST(CAST(total_tokens AS DECIMAL(38,0)) * 1000000"
            " div (((total_tokens + budget - 1) div budget) * budget)"
            " AS BIGINT)"
        ).alias("fill_ppm"),
    )


PACK_BUDGET_SWEEP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split({norm_sql("text")}, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS before
  FROM toks
),
sp AS (SELECT unnest({list(PACK_SWEEP_BUDGETS)}) AS budget),
asg AS (
  SELECT sp.budget, lang, n_tokens,
         CASE WHEN before % sp.budget + n_tokens > sp.budget
              THEN 1 END AS splits
  FROM cum, sp
)
SELECT CAST(budget AS INT) AS budget, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tokens) + budget - 1) // budget AS BIGINT)
         AS n_packs,
       CAST(COUNT(splits) AS BIGINT) AS n_split_docs,
       CAST(CAST(SUM(n_tokens) AS HUGEINT) * 1000000
            // (((SUM(n_tokens) + budget - 1) // budget) * budget)
            AS BIGINT) AS fill_ppm
FROM asg GROUP BY budget, lang"""

QUERIES["pack_budget_sweep"] = pack_budget_sweep
ORACLES["pack_budget_sweep"] = PACK_BUDGET_SWEEP_ORACLE
