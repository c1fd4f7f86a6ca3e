"""The registry's iteration order is load-bearing: the correctness
driver checks a bounded prefix of queries(), so least-proven queries
must sort first and the oracle dict must iterate in the same order
(the driver zips them by name, but humans diff them by position)."""

from thrivefinancedatapipeline_spark import registry


def test_never_proven_precede_proven():
    qs = list(registry.all_queries())
    proven = registry._proven_rounds()
    oracled = set(registry.all_oracles())

    def tier(name):
        # permanently unprovable (rows-only) park LAST: the driver's
        # rows-only check is weaker than the pytest coverage the same
        # kernels get, so they must not burn bounded-window slots
        if name not in oracled:
            return 3
        hit = proven.get(name)
        if hit is None:
            return 0
        return 1 if not hit[1] else 2

    tiers = [tier(n) for n in qs]
    assert tiers == sorted(tiers), "queries() not ordered by proof tier"


def test_oracles_follow_query_order():
    qs = list(registry.all_queries())
    ors = list(registry.all_oracles())
    assert [n for n in qs if n in ors] == ors
    assert set(ors) <= set(qs)


def test_every_query_resolves():
    qs = registry.all_queries()
    assert len(qs) >= 97
    assert all(callable(fn) for fn in qs.values())


def test_force_recheck_names_exist():
    # a typo'd name in _FORCE_RECHECK_SINCE would silently no-op
    names = set(registry.all_queries())
    missing = set(registry._FORCE_RECHECK_SINCE) - names
    assert not missing, f"unknown names in _FORCE_RECHECK_SINCE: {missing}"


def test_bench_and_probe_names_resolve():
    import re
    import pathlib

    names = set(registry.all_queries())
    bench = pathlib.Path(__file__).parent.parent / "bench.py"
    head = re.findall(r'"([a-z0-9_]+)",', bench.read_text().split("HEADLINE")[1].split("]")[0])
    assert head and not set(head) - names
    probe = pathlib.Path(__file__).parent.parent / "tools" / "scale_probe.py"
    dflt = re.findall(r'"([a-z0-9_]+)",', probe.read_text().split("DEFAULT")[1].split("]")[0])
    assert dflt and not set(dflt) - names
