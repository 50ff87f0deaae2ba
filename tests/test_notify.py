"""Notification rendering + run-report tests (operators/notify.py)."""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.notify import (
    notify_alerts,
    render_alert_body,
    render_batch_summary,
    render_run_report,
    render_subject,
)


def _alerts(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "rule_id": ["R2", "R1", "R3"],
                "severity": ["P2", "P0", "P2"],
                "title": ["late", "toxic", "short"],
                "hit_count": [5, 2, 7],
                "trigger_id_field": ["conv_id"] * 3,
                "trigger_ids": ["a,b", "c", "d"],
            }
        )
    )


def test_urgent_per_alert_rest_batched(spark):
    sent = []
    n = notify_alerts(_alerts(spark), lambda s, b: sent.append((s, b)), "b9")
    assert n == 2  # one urgent P0 + one batch summary for the two P2s
    urgent = sent[0]
    assert urgent[0] == "[URGENT] Data Governance Alert - R1"
    assert "hits     : 2" in urgent[1] and "batch    : b9" in urgent[1]
    batch_subject, batch_body = sent[1]
    assert "2 alerts" in batch_subject
    # deterministic ordering by (severity, rule_id)
    assert batch_body.index("R2") < batch_body.index("R3")


def test_body_falls_back_to_json_on_missing_fields():
    body = render_alert_body({"rule_id": "RX"}, "b1")
    assert body.startswith("{")  # degrade path: sorted JSON
    assert '"rule_id": "RX"' in body
    assert render_subject({"rule_id": "RX"}) == "[ALERT] Data Governance Alert - RX"
    subject, _ = render_batch_summary([], "b1")
    assert "0 alerts" in subject


def test_run_report_markdown(spark, tmp_path):
    from dataquality_box_spark.operators.rules import Rule, run_rules
    from dataquality_box_spark.plans.report import rule_results_rows, run_summary_row

    df = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3]}))
    rules = [
        Rule.from_dict(
            {"meta": {"rule_id": "A", "severity": "P2"},
             "logic": {"type": "filter", "filter_expr": "col('x') > 1"}}
        ),
        Rule.from_dict(
            {"meta": {"rule_id": "B", "severity": "P0"},
             "logic": {"type": "filter", "filter_expr": "col('nope') > 0"}}
        ),
    ]
    results = run_rules(rules, df, count_hits=True)
    report = render_run_report(
        rule_results_rows(spark, rules, results, "b1"),
        run_summary_row(spark, results, "b1"),
    )
    assert "# Data quality run report - b1" in report
    assert "**Status: SUCCESS**" in report  # SKIPPED doesn't fail the run
    assert "| A | P2 | filter | SUCCESS | 2 |" in report
    assert "| B | P0 | filter | SKIPPED |" in report


def test_global_failure_reporter_window_and_consolidation():
    from dataquality_box_spark.operators.notify import (
        render_consolidated_alert,
        scan_failed_entries,
    )
    from dataquality_box_spark.plans.ledger import LedgerEntry

    now = 1_000_000.0
    entries = [
        LedgerEntry("scrub", "p1", "FAILED", rows_in=10, finished_at=now - 60),
        LedgerEntry("scrub", "p2", "SUCCESS", finished_at=now - 60),  # not failed
        LedgerEntry("scrub", "p3", "FAILED", finished_at=now - 7200),  # too old
        LedgerEntry("ingest", "p0", "FAILED", finished_at=0.0),  # malformed -> skip
        LedgerEntry(
            "agg", "p9", "FAILED",
            drop_reason_counts={"too_short": 3}, finished_at=now - 120,
        ),
    ]
    failures = scan_failed_entries(entries, now, lookback_minutes=65)
    assert [(f["stage"], f["partition_id"]) for f in failures] == [
        ("agg", "p9"), ("scrub", "p1"),
    ]
    subject, body = render_consolidated_alert(failures)
    assert subject == "[Quality Alert] 2 Data Quality Checks Failed"
    assert "too_short=3" in body and "partition=p1" in body
    assert render_consolidated_alert([]) is None
