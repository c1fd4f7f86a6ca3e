"""Weekly-grain source_jaccard_drift on a synthetic multi-week
corpus — the production cadence (DRIFT_PERIOD_DAYS=7) exercised for
real, not just parameterized (r8 VERDICT item 3).

The synthetic corpus puts every ingest day exactly on a week
boundary (days 0, 7, 14, 21, 28), so the weekly cells contain
exactly the daily cells' content and the drift SERIES must be
identical at both grains — a definition pin no single grain can
give. Spark-vs-DuckDB parity is asserted at the weekly grain via
the same oracle builder the registered daily query uses."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

import duckdb

SOURCES = ("alpha", "beta", "gamma")
WEEKS = 5
DOCS_PER_CELL = 8
TOKENS_PER_DOC = 12


def _vocab(src: str, week: int) -> list[str]:
    # sliding window: consecutive weeks share 9 of 12 tokens; gamma's
    # week 3 jumps to a disjoint range (a provider silently swapping
    # its content mix — the event drift exists to catch)
    base = week * 3 + (1000 if src == "gamma" and week == 3 else 0)
    return [f"t{src}{base + i}" for i in range(TOKENS_PER_DOC)]


def _corpus(tmp_path):
    doc_ids, srcs, texts, ev_ids, tss = [], [], [], [], []
    did = 0
    for src in SOURCES:
        for w in range(WEEKS):
            vocab = _vocab(src, w)
            for j in range(DOCS_PER_CELL):
                did += 1
                toks = [
                    vocab[(j + t) % len(vocab)]
                    for t in range(TOKENS_PER_DOC)
                ]
                doc_ids.append(did)
                srcs.append(src)
                texts.append(" ".join(toks))
                ev_ids.append(did)
                tss.append(
                    datetime.datetime(1970, 1, 1, 3, j)
                    + datetime.timedelta(days=7 * w)
                )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "source": pa.array(srcs, pa.string()),
             "text": pa.array(texts, pa.string())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {"event_id": pa.array(ev_ids, pa.int64()),
             "ts": pa.array(tss, pa.timestamp("us"))}
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def _series(rows):
    """source -> [(k_used, n_both, ppm)] ordered by epoch."""
    out = {}
    for src, day, _prev, k_used, n_both, ppm in sorted(rows):
        out.setdefault(src, []).append((k_used, n_both, ppm))
    return out


def test_weekly_drift_parity_and_grain_equivalence(spark, tmp_path):
    from thrivefinancedatapipeline_spark.operators.sketches import (
        source_jaccard_drift,
        source_jaccard_drift_oracle,
    )

    d = _corpus(tmp_path)
    weekly = [
        tuple(r)
        for r in source_jaccard_drift(spark, d, period_days=7).collect()
    ]
    daily = [
        tuple(r)
        for r in source_jaccard_drift(spark, d, period_days=1).collect()
    ]

    # Spark == DuckDB at the WEEKLY grain (same oracle builder the
    # registered daily query uses, at period_days=7)
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    want = [tuple(r) for r in con.execute(
        source_jaccard_drift_oracle(period_days=7)).fetchall()]
    con.close()
    assert sorted(weekly) == sorted(want)

    # every source has WEEKS-1 consecutive-week comparisons, and the
    # weekly epochs are the day epochs div 7 (days sit on boundaries)
    assert len(weekly) == len(SOURCES) * (WEEKS - 1)
    assert {(r[0], r[1], r[2]) for r in weekly} == {
        (r[0], r[1] // 7, r[2] // 7) for r in daily
    }

    # grain equivalence: with one ingest day per week the weekly
    # cells hold exactly the daily cells' content, so the per-source
    # (k_used, n_both, ppm) series are identical
    assert _series(weekly) == _series(daily)

    # drift detection: gamma's disjoint week-3 vocab zeroes BOTH
    # transitions around it; every other consecutive-week jaccard is
    # strictly positive (9 of 12 vocab tokens shared)
    for src, day, prev, _k, _n, ppm in weekly:
        if src == "gamma" and day in (3, 4):
            assert ppm == 0, (src, prev, day, ppm)
        else:
            assert ppm > 0, (src, prev, day, ppm)
