"""Capture `.explain("formatted")` for headline queries into
plans/r{N}/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (judge checks plan claims against these files).

    python tools/capture_plans.py before            # all headline queries
    python tools/capture_plans.py after q1 q2 ...   # a subset

Round dir from $BENCH_ROUND (default 19). Explain output is the STATIC
plan (isFinalPlan=false) — plan-shape claims about AQE finals cite
PLANPROBE artifacts instead; this captures scan pushdown, join
strategies, exchange placement and Python-eval nodes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("BENCH_ROUND", "19")


def main() -> int:
    import bench
    import __spark_entry__ as entrymod

    from thrivefinancedatapipeline_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", f"r{ROUND}",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
