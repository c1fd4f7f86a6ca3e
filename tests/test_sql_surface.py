"""The SQL surface: a reference user's workflow is literal SQL over
tables (src/sample_queries.sql). register_views + spark.sql must
support that directly, producing the same results as the DataFrame
plans."""

from pyspark.sql import functions as F

from thrivefinancedatapipeline_spark.datamodel import register_views
from thrivefinancedatapipeline_spark.operators.balance import balance_history
from thrivefinancedatapipeline_spark.operators.fifo import fifo_match
from thrivefinancedatapipeline_spark.plans.finance_queries import (
    q_balance_stats,
    q_top_customers_by_balance,
)
from thrivefinancedatapipeline_spark.sources.ingest import (
    transactions_from_events,
)


def test_ingest_via_spark_sql_matches_dataframe(spark, sf_dir):
    """The domain mapping written as plain Spark SQL over the
    registered view equals the DataFrame projection (the shared
    TCTYPE/AMOUNT fragments are ANSI — they run on both engines;
    only the oracle's nanosecond cast is DuckDB-specific)."""
    from thrivefinancedatapipeline_spark.sources.ingest import (
        AMOUNT_SQL,
        TCTYPE_SQL,
    )

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        f"""
        SELECT event_id AS trans_id,
               {TCTYPE_SQL} AS tctype,
               ts AS createdat,
               user_id AS customerid,
               {AMOUNT_SQL} AS amount
        FROM events
        """
    )
    via_df = transactions_from_events(spark.table("events"))
    a = sorted(map(tuple, via_sql.collect()))
    b = sorted(map(tuple, via_df.collect()))
    assert a == b


def test_user_sql_over_balance_history_view(spark, sf_dir):
    """A reference user's as-of query, written as plain SQL against a
    registered balance_history view."""
    register_views(spark, sf_dir)
    history = balance_history(
        fifo_match(transactions_from_events(spark.table("events")))
    )
    history.createOrReplaceTempView("customer_balance_history")

    top = spark.sql(
        """
        SELECT customer_id, current_balance FROM (
          SELECT customer_id, current_balance,
                 ROW_NUMBER() OVER (
                   PARTITION BY customer_id
                   ORDER BY transaction_date DESC, transaction_id DESC
                 ) AS rn
          FROM customer_balance_history)
        WHERE rn = 1
        ORDER BY current_balance DESC, customer_id
        LIMIT 10
        """
    ).collect()
    expected = (
        q_top_customers_by_balance(spark, sf_dir)
        .select("customer_id")
        .collect()
    )
    assert [r.customer_id for r in top] == [r.customer_id for r in expected]


def test_user_sql_stats_match_plan(spark, sf_dir):
    register_views(spark, sf_dir)
    plan_row = q_balance_stats(spark, sf_dir).collect()[0]
    assert plan_row.total_customers > 0
    # the same number derived from raw SQL over the views
    n = spark.sql(
        "SELECT COUNT(DISTINCT user_id) AS n FROM events"
    ).collect()[0].n
    assert n == plan_row.total_customers
