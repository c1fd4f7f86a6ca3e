"""The pandas baseline (tools/baseline_pandas.py) must agree with the
Spark engine — otherwise its wall-clock numbers in BASELINE.md compare
different computations. Checked at sf0.001: identical FIFO redeemid
assignment and identical current balances."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from baseline_pandas import (  # noqa: E402
    balance_history_pandas,
    current_balances_pandas,
    fifo_match_pandas,
    load_transactions,
)
from thrivefinancedatapipeline_spark.datamodel import load_table  # noqa: E402
from thrivefinancedatapipeline_spark.operators.fifo import fifo_match  # noqa: E402
from thrivefinancedatapipeline_spark.sources.ingest import (  # noqa: E402
    transactions_from_events,
)

SF_DIR = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_pandas_fifo_matches_spark(spark):
    txns = load_transactions(SF_DIR)
    pd_matched = fifo_match_pandas(txns)
    pd_map = {
        int(r.trans_id): int(r.redeemid)
        for r in pd_matched.itertuples()
        if r.redeemid == r.redeemid  # not NaN
    }

    spark_matched = fifo_match(
        transactions_from_events(load_table(spark, SF_DIR, "events"))
    )
    sp_map = {
        r["trans_id"]: r["redeemid"]
        for r in spark_matched.where("redeemid IS NOT NULL").collect()
    }
    assert pd_map == sp_map
    assert len(pd_matched) == spark_matched.count()


def test_pandas_balances_match_spark(spark):
    cur = current_balances_pandas(
        balance_history_pandas(fifo_match_pandas(load_transactions(SF_DIR)))
    )
    pd_bal = {
        int(r.customerid): round(float(r.balance), 2) for r in cur.itertuples()
    }

    txns = transactions_from_events(load_table(spark, SF_DIR, "events"))
    sp_bal = {
        r["customerid"]: round(r["balance"], 2)
        for r in txns.groupBy("customerid")
        .agg({"amount": "sum"})
        .withColumnRenamed("sum(amount)", "balance")
        .collect()
    }
    assert pd_bal == sp_bal
