"""Text-analysis operators over the `documents` table.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting — the per-document scoring passes a
training-data pipeline runs before filtering/dedup. All pure column
expressions (whole-stage codegen); integer outputs wherever possible so
the DuckDB oracles are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import load_table
from ..functions.text import md5_long, md5_long_sql, norm_sql, normalize, tokens

STOPLISTS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "del"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "fr": ["le", "les", "des", "et", "une", "est", "dans", "pour", "que", "sur"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie preference

PUNCT_CLASS = "[^.,;:!?]"
DIGIT_CLASS = "[^0-9]"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


#: BPE-ish pre-tokenizer over normalized text: letter runs, digit
#: runs, and single non-alphanumeric marks — the GPT-2-style split
#: that approximates subword-tokenizer input counts. Plain character
#: classes only, so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    norm = normalize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length(norm).alias("n_chars_norm"),
    )


def _stop_hits(t, lang: str):
    return F.size(
        F.array_intersect(
            F.array_distinct(t), F.array(*[F.lit(w) for w in STOPLISTS[lang]])
        )
    )


def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer quality components + a rule-based bucket.

    Mirrors the reference pipeline's validate-then-score posture
    (reference src/thrive_cash_processing_dag.py:639 validates rows;
    here we score documents for pipeline filtering).
    """
    docs = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    n_tokens = F.size(t)
    stop_hits = _stop_hits(t, "en")
    punct = F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, ""))
    digits = F.length(F.regexp_replace(F.col("text"), DIGIT_CLASS, ""))
    bucket = (
        F.when((n_tokens >= 30) & (stop_hits >= 2), "high")
        .when(n_tokens >= 15, "medium")
        .otherwise("low")
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct.alias("n_punct"),
        digits.alias("n_digits"),
        stop_hits.alias("en_stop_hits"),
        bucket.alias("quality_bucket"),
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with deterministic preference order;
    'und' when no stoplist matches."""
    docs = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    hits = {lang: _stop_hits(t, lang) for lang in LANG_ORDER}
    best = None
    pred = F.lit("und")
    # build CASE from last preference to first so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        others = [hits[o] for o in LANG_ORDER if o != lang]
        cond = (hits[lang] > 0)
        for o in others:
            cond = cond & (hits[lang] >= o)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = lang
    # earlier langs override later ones on ties because outer When wins
    return docs.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in LANG_ORDER],
        pred.alias("pred_lang"),
    )


def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of predicted vs labeled language — the
    eval-harness query that quantifies the heuristic's accuracy on a
    labeled corpus (one extra groupBy over lang_id's output)."""
    pred = q_text_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        docs.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit content fingerprint of the normalized text."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        md5_long(normalize(F.col("text"))).alias("fingerprint"),
    )


QUERIES = {
    "text_token_count": q_text_token_count,
    "text_quality_score": q_text_quality_score,
    "text_lang_id": q_text_lang_id,
    "text_lang_confusion": q_text_lang_confusion,
    "text_fingerprint": q_text_fingerprint,
}

_NORM = norm_sql("text")
_TOKS = f"string_split({_NORM}, ' ')"


def _stop_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPLISTS[lang])
    return f"len(list_intersect(list_distinct(toks), [{words}]))"


_LANG_CASE = "CASE "
for _lang in LANG_ORDER:
    _conds = [f"hits_{_lang} > 0"] + [
        f"hits_{_lang} >= hits_{o}" for o in LANG_ORDER if o != _lang
    ]
    _LANG_CASE += f"WHEN {' AND '.join(_conds)} THEN '{_lang}' "
_LANG_CASE += "ELSE 'und' END"

ORACLES = {
    "text_token_count": f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks, {_NORM} AS norm FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       CAST(len(regexp_extract_all(norm, '{BPE_PATTERN}')) AS INT)
         AS n_bpe_tokens,
       CAST(length(norm) AS INT) AS n_chars_norm
FROM d""",
    "text_quality_score": f"""
WITH d AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id, text, toks,
             CAST(len(toks) AS INT) AS n_tokens,
             CAST({_stop_sql('en')} AS INT) AS en_stop_hits
      FROM d)
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       n_tokens,
       CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS INT) AS n_punct,
       CAST(length(regexp_replace(text, '{DIGIT_CLASS}', '', 'g')) AS INT) AS n_digits,
       en_stop_hits,
       CASE WHEN n_tokens >= 30 AND en_stop_hits >= 2 THEN 'high'
            WHEN n_tokens >= 15 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM c""",
    "text_lang_id": f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
h AS (SELECT doc_id,
             {", ".join(f"CAST({_stop_sql(lang)} AS INT) AS hits_{lang}" for lang in LANG_ORDER)}
      FROM d)
SELECT doc_id, {", ".join(f"hits_{lang}" for lang in LANG_ORDER)},
       {_LANG_CASE} AS pred_lang
FROM h""",
    "text_fingerprint": f"""
SELECT doc_id, {md5_long_sql(_NORM)} AS fingerprint FROM documents""",
    "text_lang_confusion": f"""
WITH d AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
h AS (SELECT doc_id, lang,
             {", ".join(f"CAST({_stop_sql(lang)} AS INT) AS hits_{lang}" for lang in LANG_ORDER)}
      FROM d),
p AS (SELECT doc_id, lang, {_LANG_CASE} AS pred_lang FROM h)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM p GROUP BY lang, pred_lang""",
}
