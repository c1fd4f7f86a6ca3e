"""Alert parity: success alert carries the reference's summary fields;
failure alert fires on a failed gate and re-raises."""

import pytest

from thrivefinancedatapipeline_spark import alerts
from thrivefinancedatapipeline_spark.pipeline import ValidationError, run_pipeline


def test_pipeline_success_alert(spark, sf_dir):
    sent = []
    result = run_pipeline(
        spark, sf_dir, correlation_id="run-1",
        notify=lambda subj, msg: sent.append((subj, msg)),
    )
    assert len(sent) == 1
    subj, msg = sent[0]
    assert "success" in subj
    assert "run-1" in msg and "Total earned" in msg
    assert result.report["total_customers"] > 0
    assert "total_earned" in result.report


def test_failure_alert_message():
    out = alerts.send_failure_alert(
        "validate_source", ValueError("boom"), "run-9", lambda s, m: None
    )
    assert out["status"] == "alert_sent"
    assert "validate_source" in out["message"]
    assert "ValueError: boom" in out["message"]


def test_pipeline_failure_sends_alert(spark, sf_dir, monkeypatch):
    sent = []
    from thrivefinancedatapipeline_spark import pipeline as pl

    def bad_validate(txns):
        raise ValidationError("forced failure")

    monkeypatch.setattr(pl, "validate_source", bad_validate)
    with pytest.raises(ValidationError):
        run_pipeline(
            spark, sf_dir, correlation_id="run-2",
            notify=lambda subj, msg: sent.append((subj, msg)),
        )
    assert len(sent) == 1
    assert "FAILURE" in sent[0][0]
    assert "forced failure" in sent[0][1]
