"""Per-rule result reporting + run summary, persisted idempotently.

Re-expression of the reference ReportWriter (reference: plugins/operators/
report_writer.py:106-171 governance_rule_results upsert, :177-265
governance_run_summary with the FAILED / PARTIAL_FAILURE / SUCCESS
classification). The MySQL ``INSERT ... ON DUPLICATE KEY UPDATE`` becomes
a MERGE on the TableIO seam keyed by (batch_id, rule_id) — re-running the
same batch replaces its rows instead of duplicating them.

The report tables are one row per rule / one row per run: building them
driver-side is the same tiny-table exception as the drop-reason
histogram, and the hit counts themselves were computed distributed by
``run_rules(count_hits=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.rules import Rule, RuleResult
from ..sources.merge import merge_upsert
from ..sources.tableio import TableIO

RULE_RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("rule_id", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("logic_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("hit_count", T.LongType()),
        T.StructField("execution_time_sec", T.DoubleType()),
        T.StructField("error_message", T.StringType()),
    ]
)

RUN_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("total_rules", T.LongType()),
        T.StructField("success_rules", T.LongType()),
        T.StructField("failed_rules", T.LongType()),
        T.StructField("skipped_rules", T.LongType()),
        T.StructField("total_hits", T.LongType()),
    ]
)


def rule_results_rows(
    spark: SparkSession,
    rules: list[Rule],
    results: list[RuleResult],
    batch_id: str = "batch0",
) -> DataFrame:
    """One report row per evaluated rule."""
    by_id = {r.rule_id: r for r in rules}
    rows = [
        (
            batch_id,
            res.rule_id,
            by_id[res.rule_id].severity if res.rule_id in by_id else None,
            by_id[res.rule_id].logic.get("type") if res.rule_id in by_id else None,
            res.status,
            res.hit_count,
            res.execution_time_sec,
            res.reason,
        )
        for res in results
    ]
    return spark.createDataFrame(rows, RULE_RESULTS_SCHEMA)


def run_summary_row(
    spark: SparkSession, results: list[RuleResult], batch_id: str = "batch0"
) -> DataFrame:
    """Run-level rollup with the reference's status classification:
    all FAILED -> FAILED; any FAILED -> PARTIAL_FAILURE; else SUCCESS
    (report_writer.py:218-222)."""
    total = len(results)
    failed = sum(1 for r in results if r.status == "FAILED")
    success = sum(1 for r in results if r.status == "SUCCESS")
    skipped = sum(1 for r in results if r.status == "SKIPPED")
    hits = sum(r.hit_count or 0 for r in results)
    if total > 0 and failed == total:
        status = "FAILED"
    elif failed > 0:
        status = "PARTIAL_FAILURE"
    else:
        status = "SUCCESS"
    row = [(batch_id, status, total, success, failed, skipped, hits)]
    return spark.createDataFrame(row, RUN_SUMMARY_SCHEMA)


def write_report(
    spark: SparkSession,
    io: TableIO,
    rules: list[Rule],
    results: list[RuleResult],
    batch_id: str = "batch0",
) -> None:
    """Idempotent MERGE of rule rows (key batch_id+rule_id) and the run
    summary (key batch_id). Replaying a batch rewrites its rows exactly."""
    merge_upsert(
        spark,
        io,
        rule_results_rows(spark, rules, results, batch_id),
        "rule_results",
        keys=["batch_id", "rule_id"],
    )
    merge_upsert(
        spark,
        io,
        run_summary_row(spark, results, batch_id),
        "run_summary",
        keys=["batch_id"],
    )
