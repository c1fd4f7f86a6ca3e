"""Alerting (reference send_success_alert / send_failure_alert parity,
src/thrive_cash_processing_dag.py:563 and :601).

The reference formats a summary message from the analytics report and
hands it to a notification service; failures carry the failed stage
and correlation id. Same capability here, engine-agnostic: pure
message builders plus a pluggable `notify` callable (default: log) —
no Airflow context, the correlation id is the caller's run identifier.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

logger = logging.getLogger(__name__)

Notifier = Callable[[str, str], None]  # (subject, message)


def _log_notifier(subject: str, message: str) -> None:
    logger.info("%s\n%s", subject, message)


def success_message(report: dict, correlation_id: str) -> str:
    """Human-readable run summary from `analytics.build_report` output
    (same fields the reference's success alert reports)."""
    m = report["summary_metrics"]
    lines = [
        "FIFO matching completed successfully",
        f"Correlation ID: {correlation_id}",
        "",
        f"Total earned:  ${m['total_earned']:,.2f}",
        f"Total spent:   ${m['total_spent']:,.2f}",
        f"Total expired: ${m['total_expired']:,.2f}",
        f"Total current balance: ${m['total_current_balance']:,.2f}",
        "",
        f"Transactions: {m['earned_transaction_count']} earned / "
        f"{m['spent_transaction_count']} spent / "
        f"{m['expired_transaction_count']} expired",
        f"Customers: {m['total_customers']} total, "
        f"{m['customers_with_positive_balance']} with positive balance",
    ]
    return "\n".join(lines)


def failure_message(stage: str, error: Exception, correlation_id: str) -> str:
    return "\n".join(
        [
            "FIFO matching FAILED",
            f"Correlation ID: {correlation_id}",
            f"Failed stage: {stage}",
            f"Error: {type(error).__name__}: {error}",
        ]
    )


def send_success_alert(
    report: dict, correlation_id: str, notify: Notifier = _log_notifier
) -> dict:
    msg = success_message(report, correlation_id)
    notify("thrive-pipeline success", msg)
    return {"status": "alert_sent", "message": msg}


def send_failure_alert(
    stage: str,
    error: Exception,
    correlation_id: str,
    notify: Notifier = _log_notifier,
) -> dict:
    msg = failure_message(stage, error, correlation_id)
    notify("thrive-pipeline FAILURE", msg)
    return {"status": "alert_sent", "message": msg}
