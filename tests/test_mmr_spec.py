"""knn_mmr_diversified against a FROM-SPEC recompute on a synthetic
embedding corpus — a third implementation (next to the applyInPandas
kernel and the unrolled DuckDB oracle) so kernel/oracle co-drift has
something independent to disagree with. The corpus is engineered
with duplicate-direction vectors so diversification MUST deviate
from pure relevance (non-vacuous lambda)."""

import hashlib
import math
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from thrivefinancedatapipeline_spark.operators.similarity import (
    MICRO,
    MMR_DIV_W,
    MMR_K,
    MMR_POOL,
    MMR_REL_W,
    N_QUERIES,
    knn_mmr_diversified,
)

DIM = 6
N_VECS = 40


def _vec(i: int) -> list[float]:
    if i >= N_QUERIES and i % 3 == 0:
        # clone an earlier direction: near-duplicates the MMR must
        # refuse to stack
        return _vec(i // 3)
    h = hashlib.md5(f"mmrvec:{i}".encode()).digest()
    return [((b % 13) - 6) / 4.0 for b in h[:DIM]]


def _corpus(tmp_path):
    vecs = [_vec(i) for i in range(N_VECS)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(
                    [i % 4 for i in range(N_VECS)], pa.int64()
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path), vecs


def _half_up_micro(x: float) -> int:
    # Spark ROUND(<double> * 1e6, 0): HALF_UP, away from zero
    f32 = struct.unpack("f", struct.pack("f", x))[0]
    v = f32 * MICRO
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def _spec(vecs):
    """Pure-Python MMR from the definition, exact integers over the
    same float32-storage micros the Spark path derives."""
    ints = [[_half_up_micro(x) for x in v] for v in vecs]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    out = []
    for q in range(N_QUERIES):
        rel = {
            c: dot(ints[q], ints[c])
            for c in range(len(ints))
            if c != q
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_POOL]
        sel = []
        for rank in range(1, MMR_K + 1):
            best = None
            for c in pool:
                if c in sel:
                    continue
                dv = (
                    max(dot(ints[c], ints[s]) for s in sel)
                    if sel
                    else 0
                )
                score = MMR_REL_W * rel[c] - MMR_DIV_W * dv
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, dv)
            _k, c, dv = best
            sel.append(c)
            out.append((q, c, rank, rel[c], dv))
    return sorted(out)


def test_mmr_matches_from_spec_recompute(spark, tmp_path):
    d, vecs = _corpus(tmp_path)
    got = sorted(
        tuple(r) for r in knn_mmr_diversified(spark, d).collect()
    )
    assert got == _spec(vecs)
    # the cloned directions make the tradeoff real for every query
    for q in range(N_QUERIES):
        assert any(
            dv > 0 for qq, _c, _r, _rel, dv in got if qq == q
        ), f"query {q} never paid a diversity cost"
