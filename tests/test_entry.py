"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

import __spark_entry__ as e


def test_entry_runs(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert "current_balance" in df.columns


def test_catalog_consistency(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    assert len(qs) >= 15


def test_queries_run_smoke(spark, sf_dir):
    qs = e.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
