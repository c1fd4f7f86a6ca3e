"""Property tests for quota_select: on arbitrary tiny corpora the
Spark plan must agree with a direct Python simulation of the spec
(fair-share quota, greedy hash-order prefix) — the hypothesis
discipline the as-of/CC operators use, applied to the assembly
sampler before it registers."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from thrivefinancedatapipeline_spark.operators.sampling import (
    QUOTA_DENOM,
    QUOTA_NS,
    quota_select,
)

doc = st.tuples(
    st.sampled_from(["a", "b", "c"]),          # source
    st.text(
        alphabet="xy z",                        # spaces → token splits
        min_size=0,
        max_size=24,
    ),
)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> int:
    # functions.text.tokens: split(normalize, ' ') — normalize trims
    # and collapses whitespace; split('') yields [''] i.e. size 1
    norm = " ".join(text.split()).lower()
    return len(norm.split(" ")) if norm else 1


def _simulate(rows):
    """rows: [(doc_id, source, text)] -> set of selected doc_ids."""
    per = {}
    for did, src, text in rows:
        per.setdefault(src, []).append(
            (_md5_long(f"{QUOTA_NS}{did}"), did, _tokens(text))
        )
    total = sum(nt for docs in per.values() for _h, _d, nt in docs)
    fair = (total // QUOTA_DENOM) // len(per)
    selected = set()
    for src, docs in per.items():
        quota = min(sum(nt for _h, _d, nt in docs), fair)
        cum = 0
        for h, did, nt in sorted(docs):
            if cum < quota:
                selected.add(did)
            cum += nt
    return selected


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc, min_size=1, max_size=16))
def test_quota_select_matches_python_simulation(spark, docs):
    rows = [(i + 1, src, text) for i, (src, text) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = {r.doc_id for r in quota_select(df).select("doc_id").collect()}
    assert got == _simulate(rows)
