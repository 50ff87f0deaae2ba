"""End-to-end governance lifecycle (plans/governance.py): rules ->
alerts/assets -> report -> dispatch, persisted idempotently per batch."""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.rules import Rule
from dataquality_box_spark.plans.governance import run_governance
from dataquality_box_spark.sources.tableio import TableIO


def _frame(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["a", "a", "b", "c"],
                "turn_idx": [0, 1, 0, 0],
                "toxic": [True, False, False, True],
                "gold": [False, True, True, False],
                "short": [True, True, False, True],
            }
        )
    )


def _rules():
    return [
        Rule.from_dict(
            {
                "meta": {
                    "rule_id": "R_P0",
                    "severity": "P0",
                    "alert": {"trigger_id_field": "conv_id", "title": "toxic"},
                },
                "logic": {"type": "filter", "filter_expr": "col('toxic')"},
            }
        ),
        Rule.from_dict(
            {
                "meta": {
                    "rule_id": "R_P1",
                    "severity": "P1",
                    "asset": {"field_mapping": {"asset_id": "conv_id"}},
                },
                "logic": {"type": "filter", "filter_expr": "col('gold')"},
            }
        ),
        Rule.from_dict(
            {
                "meta": {
                    "rule_id": "R_P2",
                    "severity": "P2",
                    "alert": {"trigger_id_field": "conv_id"},
                    "exemption": {"exempt_field": "conv_id"},
                },
                "logic": {"type": "filter", "filter_expr": "col('short')"},
            }
        ),
    ]


def test_governance_end_to_end_and_idempotent(spark, tmp_path):
    io = TableIO(str(tmp_path))
    sent = []
    results = run_governance(
        spark, _frame(spark), _rules(), io, "b1",
        send=lambda sev, text: sent.append(sev),
    )
    assert [r.status for r in results] == ["SUCCESS"] * 3
    alerts = io.read(spark, "alerts").toPandas().set_index("rule_id")
    assert alerts.loc["R_P0", "hit_count"] == 2
    # P2 'short' hits a(x2), c; whitelist = gold convs {a, b} -> only c left
    assert alerts.loc["R_P2", "hit_count"] == 1
    assert alerts.loc["R_P2", "trigger_ids"] == "c"
    assets = io.read(spark, "assets").toPandas()
    assert sorted(assets["asset_id"]) == ["a", "b"]
    rr = io.read(spark, "rule_results").toPandas()
    assert len(rr) == 3 and set(rr["status"]) == {"SUCCESS"}
    summary = io.read(spark, "run_summary").toPandas()
    assert summary.iloc[0]["status"] == "SUCCESS"
    assert sorted(sent) == ["P0", "P2"]

    # replay the batch: tables replaced, not duplicated
    run_governance(spark, _frame(spark), _rules(), io, "b1")
    assert len(io.read(spark, "alerts").toPandas()) == 2
    assert len(io.read(spark, "assets").toPandas()) == 2
    assert len(io.read(spark, "run_summary").toPandas()) == 1
