"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares
row-count, column set, and an order-insensitive value hash against the
DuckDB oracle. Usage:  python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

#: the driver checks at sf0.01; override for off-nominal sweeps
#: (sf0.001 exercises empty/degenerate cells, sf0.1 the scale shapes)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        # Fixed decimal places, NOT %.6g significant digits: %.6g drops
        # cent precision once a money value exceeds 6 integer digits,
        # letting the local hash pass where the driver's fails. 6
        # decimals is strictly finer than any query's declared rounding
        # (max 4). +0.0 folds -0.0 into 0.0.
        return f"{v + 0.0:.6f}" if v == v else "nan"
    if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
        return "<NULL>"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        "|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> list:
    """The driver's t2 compare: row count + column set + value hash.

    Single source of truth for this tool, check_prebuilt, and
    scaleup_gate (they used to carry hand-rolled copies that drifted
    in when the hash check was skipped). The hash is only skipped when
    the column sets differ — rows can't be aligned for hashing then.
    """
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rows {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
        )
    elif frame_hash(sdf) != frame_hash(odf):
        problems.append("value-hash mismatch")
    return problems


def main() -> int:
    import __spark_entry__ as e
    from thrivefinancedatapipeline_spark.session import get_spark

    # Private warehouse: a concurrent pytest run on the same checkout
    # must not race this sweep on the persisted index tables (the r9
    # LOCATION_ALREADY_EXISTS / stamp-TOCTOU incidents). Index-probe
    # queries self-heal by rebuilding into the tempdir.
    import atexit
    import shutil
    import tempfile

    wh = tempfile.mkdtemp(prefix="tfdp-wh-")
    atexit.register(shutil.rmtree, wh, ignore_errors=True)
    spark = get_spark("correctness-check", warehouse_dir=wh)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    import time

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:
        # a typo'd (or unregistered) name must NOT report
        # green-by-vacuity — the check_prebuilt guard, here too
        print(f"ERROR: not in the registered catalog: {sorted(unknown)}")
        return 1
    failures = 0
    t_start = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_q = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: rows={len(sdf)} "
                  f"({time.perf_counter() - t_q:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare_frames(sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and len(sdf) == len(odf):
                cols = sorted(sdf.columns)
                a = sdf[cols].copy()
                b = odf[cols].copy()
                a["__h"] = ["|".join(norm_cell(v) for v in r) for r in a.itertuples(index=False)]
                b["__h"] = ["|".join(norm_cell(v) for v in r) for r in b.itertuples(index=False)]
                only_a = set(a["__h"]) - set(b["__h"])
                only_b = set(b["__h"]) - set(a["__h"])
                for s in list(only_a)[:3]:
                    print(f"    spark-only: {s}")
                for s in list(only_b)[:3]:
                    print(f"    oracle-only: {s}")
        else:
            print(f"ok   {name}: rows={len(sdf)} "
                  f"({time.perf_counter() - t_q:.1f}s)")
    print(f"\n{failures} failures "
          f"(total {time.perf_counter() - t_start:.0f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
