"""Unit tests for severity-routed alert/asset emission (operators/alerts.py).

Planted cases: P0 hits -> one alert row with sorted capped trigger sample;
P1 hits -> asset rows via field_mapping + path template; P2 hits with the
asset-whitelist exemption; empty-hit rules emit nothing; dispatch groups
by severity.
"""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.alerts import (
    build_assets,
    dispatch,
    dispatch_digest,
    emit_alerts_and_assets,
)
from dataquality_box_spark.operators.rules import Rule


def _rule(rule_id, severity, meta_extra=None):
    meta = {"rule_id": rule_id, "severity": severity, **(meta_extra or {})}
    return Rule.from_dict(
        {"meta": meta, "logic": {"type": "filter", "filter_expr": "lit(True)"}}
    )


def _hits(spark, ids):
    return spark.createDataFrame(
        pd.DataFrame({"conv_id": ids, "turn_idx": range(len(ids))})
    )


def test_p0_alert_row_sorted_sample(spark):
    r = _rule("R1", "P0", {"alert": {"trigger_id_field": "conv_id", "title": "t"}})
    hits = _hits(spark, ["c9", "c1", "c5", "c1"])  # dup collapses via set
    alerts, assets = emit_alerts_and_assets([(r, hits)])
    row = alerts.collect()[0]
    assert row["severity"] == "P0" and row["hit_count"] == 4
    assert row["trigger_ids"] == "c1,c5,c9"  # sorted, distinct
    assert assets is None


def test_empty_hits_emit_no_alert(spark):
    r = _rule("R1", "P0", {"alert": {"trigger_id_field": "conv_id"}})
    hits = _hits(spark, ["c0"]).limit(0)  # typed empty frame
    alerts, _ = emit_alerts_and_assets([(r, hits)])
    assert alerts.count() == 0


def test_p1_assets_field_mapping_and_path(spark):
    r = _rule(
        "R2",
        "P1",
        {
            "asset": {
                "field_mapping": {"asset_id": "conv_id", "src_turn": "turn_idx"},
                "asset_type": "T",
                "tags": ["a", "b"],
                "target_path_template": "x/{batch_id}/{rule_id}/{asset_id}/",
            }
        },
    )
    hits = _hits(spark, ["c1", "c2"])
    rows = build_assets(r, hits, batch_id="b7").orderBy("asset_id").collect()
    assert [r_["asset_id"] for r_ in rows] == ["c1", "c2"]
    assert rows[0]["src_turn"] == "0" and rows[0]["asset_type"] == "T"
    assert rows[0]["tags"] == ["a", "b"]
    assert rows[0]["target_path"] == "x/b7/R2/c1/"


def test_asset_disabled_emits_none(spark):
    r = _rule("R2", "P1", {"asset": {"enabled": False}})
    assert build_assets(r, _hits(spark, ["c1"])) is None


def test_p2_whitelist_exemption(spark):
    p1 = _rule(
        "R2", "P1", {"asset": {"field_mapping": {"asset_id": "conv_id"}}}
    )
    p2 = _rule(
        "R3",
        "P2",
        {
            "alert": {"trigger_id_field": "conv_id"},
            "exemption": {"exempt_field": "conv_id"},
        },
    )
    p1_hits = _hits(spark, ["c1"])  # whitelist = {c1}
    p2_hits = _hits(spark, ["c1", "c2", "c3"])
    alerts, assets = emit_alerts_and_assets([(p1, p1_hits), (p2, p2_hits)])
    row = alerts.filter("severity = 'P2'").collect()[0]
    assert row["hit_count"] == 2  # c1 exempted
    assert row["trigger_ids"] == "c2,c3"
    assert assets.count() == 1


def test_dispatch_groups_by_severity(spark):
    p0 = _rule("R1", "P0", {"alert": {"trigger_id_field": "conv_id"}})
    p2 = _rule("R3", "P2", {"alert": {"trigger_id_field": "conv_id"}})
    alerts, _ = emit_alerts_and_assets(
        [(p0, _hits(spark, ["a"])), (p2, _hits(spark, ["b", "c"]))]
    )
    digest = {
        r["severity"]: r for r in dispatch_digest(alerts).collect()
    }
    assert digest["P0"]["n_alerts"] == 1 and digest["P0"]["total_hits"] == 1
    assert digest["P2"]["total_hits"] == 2
    sent = []
    n = dispatch(alerts, send=lambda sev, text: sent.append((sev, text)))
    assert n == 2 and {s for s, _ in sent} == {"P0", "P2"}
    assert any("R1" in t for _, t in sent)


def test_p1_rules_with_different_field_mappings_union(spark):
    from dataquality_box_spark.operators.alerts import emit_alerts_and_assets
    from dataquality_box_spark.operators.rules import Rule

    hits = spark.createDataFrame(
        [("c1", 3), ("c2", 7)], "conv_id string, turn_idx int"
    )
    r_small = Rule(
        "p1_small", "P1", {"type": "filter", "expr": "lit(True)"},
        meta={"asset": {"field_mapping": {"asset_id": "conv_id"}}},
    )
    r_wide = Rule(
        "p1_wide", "P1", {"type": "filter", "expr": "lit(True)"},
        meta={
            "asset": {
                "field_mapping": {"asset_id": "conv_id", "src_turn": "turn_idx"}
            }
        },
    )
    alerts, assets = emit_alerts_and_assets([(r_small, hits), (r_wide, hits)])
    pdf = assets.toPandas()
    # different field_mapping shapes union with nulls, not AnalysisException
    assert "src_turn" in pdf.columns
    small = pdf[pdf["rule_id"] == "p1_small"]
    assert small["src_turn"].isna().all()
    assert len(pdf) == 4


def test_asset_mapping_without_asset_id_rejected(spark):
    import pytest

    from dataquality_box_spark.operators.alerts import build_assets
    from dataquality_box_spark.operators.rules import Rule, RuleConfigError

    hits = spark.createDataFrame([("c1", 1)], "conv_id string, turn_idx int")
    r = Rule(
        "p1_bad", "P1", {"type": "filter", "expr": "lit(True)"},
        meta={"asset": {"field_mapping": {"src_turn": "turn_idx"}}},
    )
    # a mapping without the MERGE/whitelist key must fail loudly at plan
    # time, not union as null keys downstream
    with pytest.raises(RuleConfigError, match="asset_id"):
        build_assets(r, hits)


def test_missing_trigger_field_degrades_to_count_only(spark):
    # a trigger_id_field absent from the hit frame must not escape as an
    # AnalysisException at action time and fail the governance run — it
    # degrades to a count-only alert row (ADVICE r2)
    r = _rule("R9", "P0", {"alert": {"trigger_id_field": "no_such_col"}})
    hits = _hits(spark, ["c1", "c2"])
    alerts, _ = emit_alerts_and_assets([(r, hits)])
    row = alerts.collect()[0]
    assert row["hit_count"] == 2
    assert row["trigger_ids"] == ""
    assert row["trigger_id_field"] == "no_such_col"
