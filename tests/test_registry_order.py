"""The registry's iteration order is load-bearing: the correctness
driver checks a bounded prefix of queries(), so least-proven queries
must sort first and the oracle dict must iterate in the same order
(the driver zips them by name, but humans diff them by position)."""

from thrivefinancedatapipeline_spark import registry


def test_never_proven_precede_proven():
    qs = list(registry.all_queries())
    proven = registry._proven_rounds()

    def tier(name):
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
