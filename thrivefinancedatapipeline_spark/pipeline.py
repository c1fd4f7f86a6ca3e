"""End-to-end pipeline: the reference DAG re-expressed as one Spark job.

Reference flow (src/thrive_cash_processing_dag.py:734):
  download_data >> validate_source >> perform_fifo_matching
  >> validate_results >> build_analytics >> send_alerts

Spark-native shape: each stage is a DataFrame transformation; the only
actions are the validation gates (tiny aggregate collects) and the
final sinks. Lineage replaces XCom; a failed gate raises before any
output is written — same fail-fast contract as the Airflow DAG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datamodel import load_table
from .operators.balance import balance_history, current_balances
from .operators.fifo import fifo_match, validate_results
from .operators.quality import validate_source
from .sources.ingest import transactions_from_events


class ValidationError(RuntimeError):
    """A validation gate failed; carries the violation sample."""


@dataclass
class PipelineResult:
    matched: DataFrame
    history: DataFrame
    balances: DataFrame
    report: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    output_dir: str | None = None,
    fail_on_result_violations: bool = False,
    correlation_id: str | None = None,
    notify=None,
) -> PipelineResult:
    """Ingest → validate → match → validate → analytics (→ sinks)
    (→ alerts when `notify` is given, reference send_*_alert parity).

    fail_on_result_violations mirrors the reference's hard gate; it
    defaults off because value-unbalanced books are expected on
    arbitrary event data (the reference's own data was balanced).
    """
    if notify is not None:
        from . import alerts

        cid = correlation_id or "manual-run"
        try:
            result = run_pipeline(
                spark, sf_dir, output_dir, fail_on_result_violations
            )
        except Exception as exc:
            alerts.send_failure_alert("pipeline", exc, cid, notify)
            raise
        alerts.send_success_alert(
            {"summary_metrics": result.report}, cid, notify
        )
        return result

    txns = transactions_from_events(load_table(spark, sf_dir, "events"))

    source_checks = validate_source(txns).collect()
    bad = {r.check: r.violations for r in source_checks if r.violations > 0}
    if bad:
        raise ValidationError(f"source validation failed: {bad}")

    matched = fifo_match(txns)

    violations = validate_results(matched)
    structural = violations.filter(F.col("check") != "balance_mismatch")
    sample = structural.limit(10).collect()
    if sample:
        raise ValidationError(f"result validation failed: {sample}")
    if fail_on_result_violations:
        sample = violations.limit(10).collect()
        if sample:
            raise ValidationError(f"balance validation failed: {sample}")

    history = balance_history(matched)
    balances = current_balances(history)

    from .analytics import build_report

    full = build_report(txns, balances)
    report = {
        **full["summary_metrics"],
        "top_customers_by_balance": full["top_customers_by_balance"],
        "source_checks_passed": len(source_checks),
    }

    if output_dir:
        matched.write.mode("overwrite").parquet(f"{output_dir}/tc_data_with_redemptions")
        history.write.mode("overwrite").parquet(f"{output_dir}/customer_balance_history")
        balances.write.mode("overwrite").parquet(f"{output_dir}/customer_current_balances")

    return PipelineResult(matched=matched, history=history, balances=balances, report=report)
