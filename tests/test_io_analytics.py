"""Source/sink and report-builder tests."""

import os
import shutil
import tempfile

import pytest

from thrivefinancedatapipeline_spark.analytics import build_report
from thrivefinancedatapipeline_spark.datamodel import load_table
from thrivefinancedatapipeline_spark.operators.balance import (
    balance_history,
    current_balances,
)
from thrivefinancedatapipeline_spark.sources import io
from thrivefinancedatapipeline_spark.sources.ingest import (
    transactions_from_events,
)


def test_csv_roundtrip(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="io_csv_")
    try:
        nation = load_table(spark, sf_dir, "nation")
        io.write_csv(nation, f"{tmp}/nation", single_file=True)
        back = io.read_csv(
            spark, f"{tmp}/nation",
            "n_nationkey int, n_name string, n_regionkey int",
        )
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_json_roundtrip(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="io_json_")
    try:
        region = load_table(spark, sf_dir, "region")
        io.write_json(region, f"{tmp}/region")
        back = io.read_json(
            spark, f"{tmp}/region", "r_regionkey int, r_name string"
        )
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, region.collect())
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_excel_reader(spark, sf_dir):
    pytest.importorskip("openpyxl")
    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="io_xlsx_")
    try:
        path = os.path.join(tmp, "book.xlsx")
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_excel(
            path, sheet_name="TC_Data", index=False
        )
        df = io.read_excel_sheet(spark, path, "TC_Data")
        assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y")]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_partitioned_parquet_sink(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="io_pq_")
    try:
        ev = transactions_from_events(load_table(spark, sf_dir, "events"))
        io.write_partitioned_parquet(
            ev, f"{tmp}/txns", partition_by=["tctype"], target_partitions=2
        )
        dirs = {d for d in os.listdir(f"{tmp}/txns") if d.startswith("tctype=")}
        assert dirs == {"tctype=earned", "tctype=spent", "tctype=expired"}
        back = spark.read.parquet(f"{tmp}/txns")
        assert back.count() == ev.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_build_report_shape(spark, sf_dir):
    txns = transactions_from_events(load_table(spark, sf_dir, "events"))
    balances = current_balances(balance_history(txns))
    report = build_report(txns, balances)
    m = report["summary_metrics"]
    assert m["total_customers"] > 0
    assert m["earned_transaction_count"] + m["spent_transaction_count"] + m[
        "expired_transaction_count"
    ] == txns.count()
    assert len(report["top_customers_by_balance"]) == min(
        10, m["total_customers"]
    )
    tops = [r["current_balance"] for r in report["top_customers_by_balance"]]
    assert tops == sorted(tops, reverse=True)


def test_orc_roundtrip_with_pushdown(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="io_orc_")
    try:
        cust = load_table(spark, sf_dir, "customer")
        io.write_orc(cust, f"{tmp}/customer")
        back = io.read_orc(spark, f"{tmp}/customer")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, cust.collect())
        )
        # ORC scans take predicate pushdown like parquet
        import contextlib
        import io as _io

        buf = _io.StringIO()
        flt = back.filter(back.c_custkey < 10).select("c_custkey")
        with contextlib.redirect_stdout(buf):
            flt.explain(mode="formatted")
        plan = buf.getvalue()
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "LessThan(c_custkey" in pushed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
