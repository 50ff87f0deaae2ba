"""Declarative raw -> entity domain adapter.

Re-expression of the reference DomainAdapterOperator (reference:
plugins/operators/adapter.py:30-233): a YAML-shaped config declares a
primary source, a chain of joins, and a field mapping of sandboxed
expressions; the adapter emits ONLY the target fields. The Polars join
semantics are preserved exactly:

* the right-side join key column is consumed by the join (not kept),
* right-side columns that collide with an existing left column get the
  configured ``suffix`` (default ``_right``),
* fields are evaluated through the same sandboxed expression DSL the
  rule engine uses (operators/rules.parse_expr — empty __builtins__,
  whitelisted builders only, reference adapter.py:193-233).

Scale posture: the adapter is a plain declarative select over a chain of
equi-joins — Catalyst reorders/broadcasts them like any hand-written
join, and the final projection prunes every non-target column out of
the scan."""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame

from .rules import RuleConfigError, parse_expr

REQUIRED_KEYS = ("target_entity", "output_key", "input_schema", "fields")


def validate_adapter_config(config: Mapping[str, Any]) -> None:
    """Reject configs missing required keys at plan time (reference
    BaseGovernanceOperator._validate_config contract)."""
    missing = [k for k in REQUIRED_KEYS if k not in config]
    if missing:
        raise RuleConfigError(f"adapter config missing keys: {missing}")


def adapt_entity(
    config: Mapping[str, Any],
    sources: Mapping[str, DataFrame],
) -> DataFrame:
    """Load the primary source, apply the join chain, project the field
    mapping. ``sources`` plays the reference's GovernanceContext role
    (key -> DataFrame)."""
    validate_adapter_config(config)
    schema = config["input_schema"]
    df = sources[schema["primary_source"]]
    for join_cfg in schema.get("joins", []):
        right = sources[join_cfg["join_source"]]
        how = join_cfg.get("type", "left")
        left_on, right_on = join_cfg["left_on"], join_cfg["right_on"]
        suffix = join_cfg.get("suffix", "_right")
        # Polars-compatible column handling: suffix colliding right
        # columns, consume the right key.
        tmp_key = f"__adapter_right_key_{right_on}"
        renames = {right_on: tmp_key}
        for c in right.columns:
            if c != right_on and c in df.columns:
                renames[c] = c + suffix
        right = right.withColumnsRenamed(renames)
        df = df.join(right, df[left_on] == right[tmp_key], how).drop(tmp_key)
    targets = [
        parse_expr(f["source_expr"]).alias(f["target"]) for f in config["fields"]
    ]
    return df.select(*targets)
