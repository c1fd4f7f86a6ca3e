"""Aggregate the per-module query/oracle catalogs for the driver.

Module order is deliberate and load-bearing: the correctness driver
checks `queries()` entries in iteration order under a bounded budget
(round 1 stopped after 50), so the families that have never received a
driver correctness row — dedup / similarity / text / quality /
sampling / multimodal — come FIRST, followed by the queries whose
output schema changed this round (events) and advanced's previously
unchecked tail. The finance/TPC-H families, all driver-proven in
CORRECTNESS_r01.json, come last.

Imports are unconditional: every module exists in-repo, and a blanket
``except ImportError`` would silently drop a whole query family from
the correctness gate if one of them ever failed to import (e.g. a
SyntaxError chained through an ImportError in a transitive import).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from .multimodal import binary_ops
    from .operators import (
        dedup,
        quality,
        sampling,
        similarity,
        sketches,
        textops,
    )
    from .plans import advanced, events_queries, finance_queries, tpch

    return [
        # never driver-checked in round 1 — first in line
        dedup,
        similarity,
        textops,
        quality,
        sampling,
        sketches,
        binary_ops,
        # schema changed this round (moving_avg/anomalies) — recheck
        events_queries,
        # untested tail ordered first inside the module's QUERIES dict
        advanced,
        # fully driver-proven in CORRECTNESS_r01.json
        finance_queries,
        tpch,
    ]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
