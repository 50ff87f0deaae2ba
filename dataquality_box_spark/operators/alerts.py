"""Severity-routed alert/asset emission + dispatch digests.

Spark-first re-expression of the reference's ContextAggregator +
Dispatcher surface:

  P0 alerts      (reference: plugins/operators/aggregator.py:178-241)
      one alert row per rule with hits: hit_count + a deterministic
      trigger-id sample (sorted collect_set capped at 50, matching the
      reference's 50-sample-id convention) — a single groupBy, no
      driver-side id extraction.
  P1 assets      (reference: aggregator.py:247-334)
      declarative field_mapping {target: source_col} projected as
      columns plus asset_type/tags/target_path — the reference's per-row
      ``iter_rows`` Python loop becomes one select.
  P2 violations  (reference: aggregator.py:340-435)
      whitelist exemption re-expressed as a broadcast LEFT ANTI join
      against the P1 asset ids instead of a driver-side Python set, so
      the whitelist can be arbitrarily large.
  dispatch       (reference: plugins/operators/dispatcher.py:46-81)
      alerts grouped by severity into one digest row each; the actual
      send is a callback seam (no mail/HTTP in this engine).

Rule YAML additions read from ``Rule.meta``:
    alert:     {trigger_id_field: col, title: str}
    asset:     {enabled: bool, field_mapping: {target: source_col},
                asset_type: str, tags: [..],
                target_path_template: "corner_case/{batch_id}/{asset_id}/"}
    exemption: {exempt_field: col}
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rules import Rule, RuleConfigError, RuleResult

SAMPLE_CAP = 50

_PLACEHOLDER_RE = re.compile(r"\{(batch_id|rule_id|asset_id|vehicle_id)\}")


def _path_col(template: str, batch_id: str, rule_id: str, mapping: dict[str, str]):
    """Compile a target_path_template into one concat Column: literal
    segments stay literals; {asset_id}/{vehicle_id} resolve to the mapped
    source columns; {batch_id}/{rule_id} are constants at build time."""
    parts = []
    last = 0
    for m in _PLACEHOLDER_RE.finditer(template):
        if m.start() > last:
            parts.append(F.lit(template[last : m.start()]))
        name = m.group(1)
        if name == "batch_id":
            parts.append(F.lit(batch_id))
        elif name == "rule_id":
            parts.append(F.lit(rule_id))
        else:
            parts.append(F.col(mapping.get(name, name)).cast("string"))
        last = m.end()
    if last < len(template):
        parts.append(F.lit(template[last:]))
    return F.concat(*parts)


def _alert_row(rule: Rule, hits: DataFrame, severity: str) -> DataFrame:
    """One aggregate row for a rule's hits: hit_count + sorted, capped
    trigger-id sample (deterministic — no collect order dependence).

    A trigger_id_field absent from the hit frame degrades to a count-only
    row (empty trigger_ids) instead of escaping an AnalysisException at
    action time, OUTSIDE evaluate_rule's SKIPPED mapping — one rule's
    config typo must not fail the whole governance run (mirror of the P2
    exemption path, which already skips silently when exempt_field is
    absent)."""
    alert_cfg = rule.meta.get("alert") or {}
    trigger = alert_cfg.get("trigger_id_field", "conv_id")
    title = alert_cfg.get("title", f"[{severity}] data quality - {rule.rule_id}")
    sample = (
        F.array_join(
            F.slice(
                F.array_sort(F.collect_set(F.col(trigger).cast("string"))),
                1,
                SAMPLE_CAP,
            ),
            ",",
        )
        if trigger in hits.columns
        else F.first(F.lit(""))
    )
    return (
        hits.agg(
            F.count("*").alias("hit_count"),
            sample.alias("trigger_ids"),
        )
        .filter(F.col("hit_count") > 0)
        .select(
            F.lit(rule.rule_id).alias("rule_id"),
            F.lit(severity).alias("severity"),
            F.lit(title).alias("title"),
            "hit_count",
            F.lit(trigger).alias("trigger_id_field"),
            "trigger_ids",
        )
    )


def build_assets(
    rule: Rule, hits: DataFrame, batch_id: str = "batch0"
) -> DataFrame | None:
    """P1 asset rows via declarative field_mapping (None if disabled)."""
    asset_cfg = rule.meta.get("asset") or {}
    if not asset_cfg.get("enabled", True):
        return None
    mapping = asset_cfg.get("field_mapping") or {"asset_id": "conv_id"}
    if "asset_id" not in mapping:
        # asset_id is the MERGE/whitelist key: a mapping without it would
        # union as null keys downstream — null keys never match in the
        # idempotent upsert (rows re-append every replay) and never enter
        # the P2 exemption whitelist. Fail loudly at plan time instead.
        raise RuleConfigError(
            f"rule {rule.rule_id}: asset field_mapping must map 'asset_id'"
        )
    asset_type = asset_cfg.get("asset_type", "HIGH_VALUE_SCENARIO")
    tags = asset_cfg.get("tags") or []
    template = asset_cfg.get(
        "target_path_template", "corner_case/{batch_id}/{asset_id}/"
    )
    cols = [
        F.col(src).cast("string").alias(target) for target, src in mapping.items()
    ]
    return hits.select(
        *cols,
        F.lit(asset_type).alias("asset_type"),
        F.lit(rule.rule_id).alias("rule_id"),
        F.array(*[F.lit(t) for t in tags]).alias("tags"),
        _path_col(template, batch_id, rule.rule_id, mapping).alias("target_path"),
    )


def emit_alerts_and_assets(
    evaluated: list[tuple[Rule, DataFrame]], batch_id: str = "batch0"
) -> tuple[DataFrame, DataFrame | None]:
    """Full severity routing: P0 alert rows, P1 asset rows, P2 violation
    alert rows with the P1-asset-whitelist exemption.

    Returns (alerts, assets); assets is None when no P1 rule emitted.
    Alert rows: rule_id, severity, title, hit_count, trigger_id_field,
    trigger_ids (sorted CSV sample).
    """
    assets = None
    for rule, hits in evaluated:
        if rule.severity != "P1" or hits is None:
            continue
        rows = build_assets(rule, hits, batch_id)
        if rows is not None:
            # different P1 rules may declare different field_mapping
            # keys — union by name with missing columns as nulls, the
            # same relaxed shape merge.py uses
            assets = (
                rows
                if assets is None
                else assets.unionByName(rows, allowMissingColumns=True)
            )

    whitelist = (
        assets.select(F.col("asset_id").alias("__exempt_id")).distinct()
        if assets is not None and "asset_id" in assets.columns
        else None
    )

    alerts = None
    for rule, hits in evaluated:
        if hits is None:
            continue
        if rule.severity == "P0":
            row = _alert_row(rule, hits, "P0")
        elif rule.severity == "P2":
            exempt_field = (rule.meta.get("exemption") or {}).get(
                "exempt_field", "conv_id"
            )
            final = hits
            if whitelist is not None and exempt_field in hits.columns:
                final = hits.join(
                    F.broadcast(whitelist),
                    hits[exempt_field].cast("string") == F.col("__exempt_id"),
                    "left_anti",
                )
            row = _alert_row(rule, final, "P2")
        else:
            continue
        alerts = row if alerts is None else alerts.unionByName(row)

    return alerts, assets


def emit_from_results(
    rules: list[Rule], results: list[RuleResult], batch_id: str = "batch0"
) -> tuple[DataFrame | None, DataFrame | None]:
    """Convenience wiring from the rule engine's RuleResults (skips
    FAILED/SKIPPED rules, reference: aggregator hit_count>0 gate)."""
    by_id = {r.rule_id: r for r in results}
    evaluated = [
        (rule, by_id[rule.rule_id].hits)
        for rule in rules
        if rule.rule_id in by_id
        and by_id[rule.rule_id].status == "SUCCESS"
        and by_id[rule.rule_id].hits is not None
    ]
    return emit_alerts_and_assets(evaluated, batch_id)


def dispatch_digest(alerts: DataFrame) -> DataFrame:
    """Severity-grouped dispatch digests (reference: dispatcher.py:46-81
    groups P0 / P2 / other and batches one message per group)."""
    line = F.format_string(
        "[%s] %s: %d hits", F.col("rule_id"), F.col("title"), F.col("hit_count")
    )
    return (
        alerts.withColumn("__line", line)
        .groupBy("severity")
        .agg(
            F.count("*").alias("n_alerts"),
            F.sum("hit_count").alias("total_hits"),
            F.array_join(F.array_sort(F.collect_list("__line")), "\n").alias("digest"),
        )
    )


def dispatch(
    alerts: DataFrame, send: Callable[[str, str], None] | None = None
) -> int:
    """Render digests and hand each to ``send(severity, text)``. The
    digest table is at most one row per severity — collecting it is the
    same tiny-table exception as the drop-reason histogram."""
    rows = dispatch_digest(alerts).collect()
    for row in rows:
        if send is not None:
            send(row["severity"], row["digest"])
    return len(rows)
