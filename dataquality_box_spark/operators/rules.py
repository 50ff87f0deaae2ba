"""Declarative YAML rule engine: expression DSL + filter/aggregate/cross_entity.

Re-expression of the reference's rule engine (reference: plugins/operators/
rule_engine.py:17-26 rule model, :246-285 pre_compute, :291-364
filter/aggregate logic, :404-478 cross_entity, :512-535 sandboxed eval;
rule YAML shapes: plugins/configs/rules/p0_R01.yaml,
p0_RC02_mileage_cross_check.yaml). The sandbox exposes pyspark column
builders instead of Polars expressions; rule files stay declarative.

Rule YAML shape:
    meta: {rule_id: R01, severity: P0, entity: transcripts}
    logic:
      type: filter | aggregate | cross_entity
      pre_compute: [{name: c, expr: "col('a') + col('b')"}]   # optional
      # filter:
      filter_expr: "col('n_tokens') < 3"
      # aggregate:
      group_by: [conv_id]
      aggregations: [{name: n, expr: "count('*')"}]
      having_expr: "col('n') > 5"
      # cross_entity:
      right_entity: other
      operation: anti_join | compare
      join_keys: [k]
      left_pre_agg / right_pre_agg: {group_by: [...], aggregations: [...]}
      assertion: "col('a') != col('b')"   # compare: rows violating

Error contract mirrors the reference (rule_engine.py:187-210): business
errors (missing column, bad expression) mark the rule FAILED/SKIPPED and
do not raise; system errors propagate.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class RuleConfigError(ValueError):
    pass


_ALLOWED = {
    "col": F.col,
    "lit": F.lit,
    "when": F.when,
    "F": F,
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "countDistinct": F.countDistinct,
    "abs": F.abs,
    "coalesce": F.coalesce,
    "length": F.length,
    "upper": F.upper,
    "lower": F.lower,
}


def parse_expr(expr: str) -> Column:
    """Sandboxed expression -> Column (reference: rule_engine.py:512-535).

    ``__builtins__`` is emptied; only the whitelisted column builders are
    visible. Expressions are data, not code — same stance as the reference.
    """
    if not isinstance(expr, str) or not expr.strip():
        raise RuleConfigError(f"empty expression: {expr!r}")
    if "__" in expr:
        raise RuleConfigError(f"forbidden token in expression: {expr!r}")
    try:
        # whitelist goes in globals (not locals) so lambdas in expressions
        # can resolve the names at call time
        return eval(expr, {"__builtins__": {}, **_ALLOWED})  # noqa: S307
    except RuleConfigError:
        raise
    except Exception as ex:
        raise RuleConfigError(f"bad expression {expr!r}: {ex}") from ex


@dataclass
class Rule:
    rule_id: str
    severity: str
    logic: dict[str, Any]
    entity: str = "transcripts"
    meta: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Rule:
        meta = d.get("meta") or {}
        logic = d.get("logic") or {}
        if "rule_id" not in meta or "type" not in logic:
            raise RuleConfigError(f"rule missing meta.rule_id or logic.type: {d}")
        if logic["type"] not in ("filter", "aggregate", "cross_entity"):
            raise RuleConfigError(f"unknown logic.type {logic['type']!r}")
        return cls(
            rule_id=meta["rule_id"],
            severity=meta.get("severity", "P2"),
            logic=logic,
            entity=meta.get("entity", "transcripts"),
            meta=meta,
        )


@dataclass
class RuleResult:
    rule_id: str
    status: str  # SUCCESS | FAILED | SKIPPED
    hits: DataFrame | None
    hit_count: int | None = None
    reason: str | None = None
    execution_time_sec: float | None = None

    @staticmethod
    def unpersist_all(results: list["RuleResult"]) -> None:
        """Release hit frames persisted by count_hits mode."""
        for r in results:
            if r.hits is not None:
                r.hits.unpersist()


def toposort_rules(rules: list[Rule]) -> list[Rule]:
    """Order rules so every ``meta.depends_on`` predecessor comes first
    (reference: rule_scanner.py topological sort + cycle rejection).
    Unknown dependencies and cycles are config errors. Kahn's algorithm
    with lexicographic tie-breaks keeps the order deterministic."""
    by_id = {r.rule_id: r for r in rules}
    deps: dict[str, set[str]] = {}
    for r in rules:
        declared = r.meta.get("depends_on") or []
        missing = [d for d in declared if d not in by_id]
        if missing:
            raise RuleConfigError(
                f"rule {r.rule_id!r} depends on unknown rule(s): {missing}"
            )
        deps[r.rule_id] = set(declared)
    ordered: list[Rule] = []
    remaining = dict(deps)
    while remaining:
        ready = sorted(rid for rid, d in remaining.items() if not d)
        if not ready:
            raise RuleConfigError(
                f"dependency cycle among rules: {sorted(remaining)}"
            )
        for rid in ready:
            ordered.append(by_id[rid])
            del remaining[rid]
        for d in remaining.values():
            d.difference_update(ready)
    return ordered


def load_rules(path: str) -> list[Rule]:
    """Load all rule YAMLs in a directory, topologically sorted by
    ``meta.depends_on`` (reference: rule_scanner.py:52-101)."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("pyyaml unavailable")
    rules = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith((".yaml", ".yml")):
            continue
        with open(os.path.join(path, fname)) as f:
            loaded = yaml.safe_load(f)
        if loaded is None:  # empty file: skipped, not an error
            continue  # (reference: rule_scanner.py:165-167)
        rules.append(Rule.from_dict(loaded))
    ids = [r.rule_id for r in rules]
    if len(ids) != len(set(ids)):
        raise RuleConfigError(f"duplicate rule_ids: {ids}")
    return toposort_rules(rules)


def _apply_pre_compute(df: DataFrame, logic: dict[str, Any]) -> DataFrame:
    for item in logic.get("pre_compute") or []:
        df = df.withColumn(item["name"], parse_expr(item["expr"]))
    return df


def _agg_exprs(items: list[dict[str, str]]) -> list[Column]:
    return [parse_expr(i["expr"]).alias(i["name"]) for i in items]


def evaluate_rule(
    rule: Rule,
    df: DataFrame,
    others: dict[str, DataFrame] | None = None,
    count_hits: bool = False,
) -> RuleResult:
    """Evaluate one rule; returns hits + status without raising on
    business errors (reference: rule_engine.py:91-210).

    ``count_hits=True`` additionally materializes hit_count and the wall
    time — one extra count action per rule, used by the reporting stage
    (reference: report_writer.py:106-171 per-rule rows). Leave it False
    on the hot path so plans stay lazy.
    """
    import time

    t0 = time.time()
    try:
        hits = _evaluate(rule, df, others or {})
        if count_hits:
            # reporting mode consumes hits several times downstream
            # (count here, alert/asset aggregation, dispatch digest) —
            # persist so the rule pipeline runs once, not once per
            # consumer; callers release via RuleResult.unpersist_all
            hits = hits.persist()
            try:
                n = hits.count()
            except BaseException:
                # the frame never reaches a RuleResult, so release the
                # cache registration here or it pins for the session
                hits.unpersist()
                raise
        else:
            n = None
        return RuleResult(
            rule.rule_id, "SUCCESS", hits, hit_count=n,
            execution_time_sec=(time.time() - t0) if count_hits else None,
        )
    except RuleConfigError as ex:
        return RuleResult(
            rule.rule_id, "FAILED", None, reason=str(ex),
            execution_time_sec=time.time() - t0,
        )
    except Exception as ex:  # analysis errors -> missing column etc.
        name = type(ex).__name__
        if "AnalysisException" in name or "UNRESOLVED" in str(ex):
            return RuleResult(
                rule.rule_id, "SKIPPED", None, reason=f"{name}: {ex}",
                execution_time_sec=time.time() - t0,
            )
        raise


def _evaluate(rule: Rule, df: DataFrame, others: dict[str, DataFrame]) -> DataFrame:
    logic = rule.logic
    kind = logic["type"]
    df = _apply_pre_compute(df, logic)
    sev = F.lit(rule.severity).alias("_severity")
    rid = F.lit(rule.rule_id).alias("_rule_id")

    if kind == "filter":
        hits = df.filter(parse_expr(logic["filter_expr"]))
        return hits.select("*", sev, rid)

    if kind == "aggregate":
        group = logic.get("group_by") or []
        agged = df.groupBy(*group).agg(*_agg_exprs(logic["aggregations"]))
        having = logic.get("having_expr")
        if having:
            agged = agged.filter(parse_expr(having))
        return agged.select("*", sev, rid)

    # cross_entity
    right_name = logic.get("right_entity")
    if right_name not in others:
        raise RuleConfigError(f"right_entity {right_name!r} not provided")
    right = _apply_pre_compute(others[right_name], {"pre_compute": logic.get("right_pre_compute")})
    left = df
    for side, key in (("left_pre_agg", "left"), ("right_pre_agg", "right")):
        spec = logic.get(side)
        if spec:
            target = left if key == "left" else right
            agged = target.groupBy(*spec["group_by"]).agg(*_agg_exprs(spec["aggregations"]))
            if key == "left":
                left = agged
            else:
                right = agged
    keys = logic["join_keys"]
    op = logic.get("operation", "compare")
    if op == "anti_join":
        hits = left.join(right, on=keys, how="left_anti")
        return hits.select("*", sev, rid)
    joined = left.join(right, on=keys, how="left")
    assertion = logic.get("assertion")
    if assertion:
        joined = joined.filter(parse_expr(assertion))
    return joined.select("*", sev, rid)


def run_rules(
    rules: list[Rule],
    df: DataFrame,
    others: dict[str, DataFrame] | None = None,
    count_hits: bool = False,
) -> list[RuleResult]:
    return [evaluate_rule(r, df, others, count_hits=count_hits) for r in rules]
