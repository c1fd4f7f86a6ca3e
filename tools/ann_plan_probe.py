"""Settle the r13 ANN bench-drift watch with EVIDENCE (VERDICT r13
item 2): capture the FINAL adaptive plans (isFinalPlan=true) of the
three drifting queries — knn_ivfpq, ivf_knn, knn_bruteforce_cosine —
at sf0.1, count their exchanges / scans / join strategies, and record
solo timings, so "unchanged code, moving wall-time" can be attributed
to runner state (identical plans) or bisected (changed plans).

r18 (VERDICT r17 item 5) widens the pinned set to the three heaviest
dedup queries — dedup_minhash_lsh, dedup_containment,
dedup_simhash_wide_pairs — so the dedup family carries the same
byte-identical-plan attribution evidence the ANN trio has.

    python tools/ann_plan_probe.py            # writes PLANPROBE_r14.json
    BENCH_ROUND=15 python tools/ann_plan_probe.py

The artifact records, per query:
  - plan feature counts from the post-execution adaptive plan
    (explain mode="simple" — formatted prints every node twice)
  - n timed runs after one untimed warmup (codegen absorption), with
    the min/median/max and the one-trim-per-side mean the bench-spread
    rule prescribes at 5+ samples
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("BENCH_ROUND", "14")
NAMES = [
    "knn_ivfpq",
    "ivf_knn",
    "knn_bruteforce_cosine",
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_simhash_wide_pairs",
]
RUNS = 5

FEATURES = [
    "Exchange hashpartitioning",
    "Exchange SinglePartition",
    "Exchange rangepartitioning",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "Scan parquet",
    "ReusedExchange",
    "CartesianProduct",
]


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


# Shared with the bench (r20, ADVICE: the two verbatim copies would
# drift): the repo root is already on sys.path above.
from bench import _host_sample  # noqa: E402


def main() -> int:
    import __spark_entry__ as entrymod

    from thrivefinancedatapipeline_spark.session import get_spark

    spark = get_spark("ann-plan-probe")
    qs = entrymod.queries()
    out: dict[str, dict] = {"sf_dir": SF_DIR, "queries": {}}
    for name in NAMES:
        # untimed warmup absorbs Janino/codegen first-run compilation
        df = qs[name](spark, SF_DIR)
        df.collect()
        plan = _plan(df)
        counts = {f: plan.count(f) for f in FEATURES}
        counts["isFinalPlan"] = "isFinalPlan=true" in plan
        times = []
        h0 = _host_sample()
        for _ in range(RUNS):
            df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.collect()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        h1 = _host_sample()
        hq = {"load1": h1.get("load1")}
        for k in ("psi_cpu_some_us", "psi_io_some_us", "steal_ticks"):
            if k in h0 and k in h1:
                hq[k.replace("_us", "_d_us").replace(
                    "_ticks", "_d_ticks")] = h1[k] - h0[k]
        trimmed = sorted(times)[1:-1]
        out["queries"][name] = {
            "plan_counts": counts,
            "host": hq,
            "runs_sec": times,
            "min": min(times),
            "median": statistics.median(times),
            "max": max(times),
            "trimmed_mean": round(sum(trimmed) / len(trimmed), 3),
        }
        print(name, json.dumps(out["queries"][name]["plan_counts"]),
              "times", times)
    path = f"PLANPROBE_r{ROUND}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
