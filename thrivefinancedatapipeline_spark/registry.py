"""Aggregate the per-module query/oracle catalogs for the driver."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from .plans import finance_queries

    mods = [finance_queries]
    for name in ("tpch", "events_queries", "advanced"):
        try:
            mods.append(__import__(f"{__package__}.plans.{name}", fromlist=[name]))
        except ImportError:
            pass
    for name in ("dedup", "similarity", "textops", "quality", "sampling"):
        try:
            mods.append(__import__(f"{__package__}.operators.{name}", fromlist=[name]))
        except ImportError:
            pass
    try:
        from .multimodal import binary_ops

        mods.append(binary_ops)
    except ImportError:
        pass
    return mods


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
