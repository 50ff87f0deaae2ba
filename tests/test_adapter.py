"""Declarative entity adapter (operators/adapter.py)."""

from __future__ import annotations

import pytest

from dataquality_box_spark.operators.adapter import (
    adapt_entity,
    validate_adapter_config,
)
from dataquality_box_spark.operators.rules import RuleConfigError


@pytest.fixture
def sources(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    right = spark.createDataFrame(
        [(1, "x", 100), (2, "y", 200)], "rid long, name string, w long"
    )
    return {"raw_left": left, "raw_right": right}


def _config(fields, joins=None):
    return {
        "target_entity": "E",
        "output_key": "entity_e",
        "input_schema": {"primary_source": "raw_left", "joins": joins or []},
        "fields": fields,
    }


def test_join_suffix_and_key_consumption(spark, sources):
    cfg = _config(
        fields=[
            {"target": "id", "source_expr": "col('id')"},
            {"target": "left_name", "source_expr": "col('name')"},
            {"target": "right_name", "source_expr": "col('name_r')"},
            {"target": "total", "source_expr": "col('v') + coalesce(col('w'), lit(0))"},
        ],
        joins=[
            {
                "join_source": "raw_right",
                "type": "left",
                "left_on": "id",
                "right_on": "rid",
                "suffix": "_r",
            }
        ],
    )
    out = adapt_entity(cfg, sources)
    # the right key column is consumed, colliding 'name' got the suffix
    rows = {r["id"]: (r["left_name"], r["right_name"], r["total"]) for r in out.collect()}
    assert rows == {1: ("a", "x", 110), 2: ("b", "y", 220), 3: ("c", None, 30)}


def test_projection_keeps_only_targets(spark, sources):
    cfg = _config(fields=[{"target": "only", "source_expr": "col('v') * lit(2)"}])
    out = adapt_entity(cfg, sources)
    assert out.columns == ["only"]


def test_missing_config_keys_rejected():
    with pytest.raises(RuleConfigError, match="missing keys"):
        validate_adapter_config({"target_entity": "E"})


def test_bad_field_expression_rejected(spark, sources):
    cfg = _config(fields=[{"target": "bad", "source_expr": "__import__('os')"}])
    with pytest.raises(RuleConfigError):
        adapt_entity(cfg, sources)
