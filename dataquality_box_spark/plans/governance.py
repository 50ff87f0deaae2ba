"""The full governance lifecycle as ONE plan: rules -> alerts/assets ->
report -> dispatch.

Re-expression of the reference's flagship dynamic-governance DAG
(SURVEY.md §3.1: UniversalLoader -> DomainAdapter -> rule TaskGroup ->
ContextAggregator -> ReportWriter -> Dispatcher, each an Airflow task
process exchanging parquet+XCom — reference: plugins/orchestration/
dag_factory.py:222-536). Here the stages are function calls over
DataFrames inside one Spark job; the only persisted artifacts are the
governance tables (alerts / assets / rule_results / run_summary), each
written idempotently through the MERGE sink keyed by batch.

The per-rule hit DataFrames stay lazy until the emission/report actions;
nothing round-trips through the driver except the tiny digest rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.alerts import dispatch, emit_from_results
from ..operators.rules import Rule, RuleResult, run_rules
from ..sources.merge import merge_upsert
from ..sources.tableio import TableIO
from .report import write_report


def run_governance(
    spark: SparkSession,
    df: DataFrame,
    rules: list[Rule],
    io: TableIO,
    batch_id: str = "batch0",
    others: dict[str, DataFrame] | None = None,
    send: Callable[[str, str], None] | None = None,
    report: bool = True,
) -> list[RuleResult]:
    """Evaluate rules, route severities, persist everything, dispatch.

    Persisted tables (all idempotent per batch_id):
      alerts        one row per alerting rule (P0 + post-exemption P2)
      assets        one row per P1 hit via field_mapping
      rule_results  per-rule status/hit_count/duration  (report=True)
      run_summary   one row, SUCCESS / PARTIAL_FAILURE / FAILED (report=True)
    Returns the RuleResults for further wiring.
    """
    results = run_rules(rules, df, others, count_hits=True)
    # hits are persisted by count_hits mode — every downstream consumer
    # (alert/asset MERGE writes, dispatch digest) reuses the one
    # materialization instead of re-running each rule pipeline
    try:
        alerts, assets = emit_from_results(rules, results, batch_id)
        if alerts is not None:
            alerts_b = alerts.withColumn("batch_id", F.lit(batch_id))
            merge_upsert(spark, io, alerts_b, "alerts", keys=["batch_id", "rule_id"])
        if assets is not None:
            assets_b = assets.withColumn("batch_id", F.lit(batch_id))
            merge_upsert(
                spark, io, assets_b, "assets", keys=["batch_id", "rule_id", "asset_id"]
            )
        if report:
            write_report(spark, io, rules, results, batch_id)
        if alerts is not None:
            dispatch(alerts, send=send)
    finally:
        RuleResult.unpersist_all(results)
    return results
