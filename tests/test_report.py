"""Per-rule reporting + run summary (plans/report.py): counts, status
classification, and idempotent replay through the MERGE sink."""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.rules import Rule, run_rules
from dataquality_box_spark.plans.report import (
    rule_results_rows,
    run_summary_row,
    write_report,
)
from dataquality_box_spark.sources.tableio import TableIO


def _frame(spark):
    return spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a", "a", "b"], "n_tokens": [1, 50, 2]})
    )


def _rules():
    mk = lambda rid, expr: Rule.from_dict(
        {
            "meta": {"rule_id": rid, "severity": "P2"},
            "logic": {"type": "filter", "filter_expr": expr},
        }
    )
    return [
        mk("R_OK", "col('n_tokens') < 3"),  # 2 hits
        mk("R_ZERO", "col('n_tokens') > 999"),  # 0 hits
        mk("R_BAD", "nonexistent_function('x')"),  # FAILED (bad expr)
        mk("R_MISSING", "col('no_such_col') > 0"),  # SKIPPED (missing column)
    ]


def test_rule_results_counts_and_statuses(spark):
    results = run_rules(_rules(), _frame(spark), count_hits=True)
    rows = (
        rule_results_rows(spark, _rules(), results, "b1")
        .toPandas()
        .set_index("rule_id")
    )
    assert rows.loc["R_OK", "status"] == "SUCCESS"
    assert rows.loc["R_OK", "hit_count"] == 2
    assert rows.loc["R_OK", "execution_time_sec"] > 0
    assert rows.loc["R_ZERO", "hit_count"] == 0
    assert rows.loc["R_BAD", "status"] == "FAILED"
    assert isinstance(rows.loc["R_BAD", "error_message"], str)
    assert rows.loc["R_MISSING", "status"] == "SKIPPED"
    assert rows.loc["R_OK", "logic_type"] == "filter"


def test_run_summary_classification(spark):
    results = run_rules(_rules(), _frame(spark), count_hits=True)
    summary = run_summary_row(spark, results, "b1").collect()[0]
    assert summary["status"] == "PARTIAL_FAILURE"  # 1 FAILED of 4
    assert summary["total_rules"] == 4
    assert summary["success_rules"] == 2
    assert summary["skipped_rules"] == 1
    assert summary["total_hits"] == 2
    # all-failed -> FAILED; none-failed -> SUCCESS
    only_bad = [r for r in results if r.status == "FAILED"]
    assert run_summary_row(spark, only_bad, "b").collect()[0]["status"] == "FAILED"
    ok = [r for r in results if r.status != "FAILED"]
    assert run_summary_row(spark, ok, "b").collect()[0]["status"] == "SUCCESS"


def test_write_report_replay_is_idempotent(spark, tmp_path):
    io = TableIO(str(tmp_path))
    results = run_rules(_rules(), _frame(spark), count_hits=True)
    write_report(spark, io, _rules(), results, "b1")
    first = (
        io.read(spark, "rule_results")
        .select("batch_id", "rule_id", "status", "hit_count")
        .toPandas()
        .sort_values(["batch_id", "rule_id"])
        .reset_index(drop=True)
    )
    # replay the same batch, then add a second batch
    write_report(spark, io, _rules(), results, "b1")
    write_report(spark, io, _rules(), results, "b2")
    after = (
        io.read(spark, "rule_results")
        .select("batch_id", "rule_id", "status", "hit_count")
        .toPandas()
        .sort_values(["batch_id", "rule_id"])
        .reset_index(drop=True)
    )
    assert len(after) == 2 * len(first)  # b1 replaced, not duplicated
    pd.testing.assert_frame_equal(after[after.batch_id == "b1"].reset_index(drop=True), first)
    summary = io.read(spark, "run_summary").toPandas()
    assert sorted(summary["batch_id"]) == ["b1", "b2"]
