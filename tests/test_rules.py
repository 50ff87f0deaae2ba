"""YAML rule engine tests (reference contract: rule_engine.py:91-210)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataquality_box_spark.operators.rules import (
    Rule,
    RuleConfigError,
    evaluate_rule,
    load_rules,
    parse_expr,
    run_rules,
)


def test_load_rules_dir():
    rules = load_rules("rules")
    ids = [r.rule_id for r in rules]
    assert set(ids) == {
        "R01_too_short", "R02_role_enum", "R03_empty_assistant",
        "R04_tool_without_name", "R09_conv_volume", "R16_symbol_ratio",
        "R18_ts_range", "R20_toxicity_alert", "R21_gold_assets",
        "R22_short_violations", "RC02_missing_convs",
        "RC03_turn_count_cross_check",
    }
    # depends_on toposort: the P1 asset rule precedes its P2 dependent
    assert ids.index("R21_gold_assets") < ids.index("R22_short_violations")


def test_yaml_rules_drive_governance(spark, transcripts_df, tmp_path):
    """The alert/asset/exemption blocks loaded from YAML run the full
    emission stage end-to-end (rules -> routed alerts + assets)."""
    from dataquality_box_spark.operators.alerts import emit_from_results

    wanted = {"R20_toxicity_alert", "R21_gold_assets", "R22_short_violations"}
    rules = [r for r in load_rules("rules") if r.rule_id in wanted]
    results = run_rules(rules, transcripts_df)
    alerts, assets = emit_from_results(rules, results)
    a = alerts.toPandas().set_index("rule_id")
    assert a.loc["R20_toxicity_alert", "severity"] == "P0"
    assert a.loc["R20_toxicity_alert", "hit_count"] > 0
    assert a.loc["R22_short_violations", "severity"] == "P2"
    asset_pdf = assets.toPandas()
    assert (asset_pdf["asset_type"] == "TOOL_DEMO").all()
    assert asset_pdf["target_path"].str.startswith("corner_case/batch0/R21_gold_assets/").all()
    # exemption: no P2 trigger conv appears in the asset whitelist
    p2_trigger = set(a.loc["R22_short_violations", "trigger_ids"].split(","))
    assert not (p2_trigger & set(asset_pdf["asset_id"]))


def test_parse_expr_sandbox_blocks_dunder():
    with pytest.raises(RuleConfigError):
        parse_expr("().__class__")
    with pytest.raises(RuleConfigError):
        parse_expr("open('/etc/passwd')")


def test_filter_and_aggregate_rules(spark, transcripts_df):
    rules = load_rules("rules")
    registry = (
        transcripts_df.select("conv_id")
        .distinct()
        .limit(50)
        # expected_turns deliberately one off so RC03's compare flags them
        .withColumn("expected_turns", F.lit(-1).cast("long"))
    )
    results = run_rules(rules, transcripts_df, {"conv_registry": registry})
    by_id = {r.rule_id: r for r in results}
    assert by_id["R01_too_short"].status == "SUCCESS"
    n_short = by_id["R01_too_short"].hits.count()
    # every hit satisfies the predicate and carries severity + rule id
    row = by_id["R01_too_short"].hits.select("_severity", "_rule_id").first()
    assert (row["_severity"], row["_rule_id"]) == ("P0", "R01_too_short")
    assert n_short > 0
    assert by_id["R02_role_enum"].hits.count() == 0  # enum is clean
    assert by_id["R09_conv_volume"].status == "SUCCESS"
    # anti-join: conversations missing from the 50-conv registry
    anti = by_id["RC02_missing_convs"]
    assert anti.status == "SUCCESS"
    n_convs = transcripts_df.select("conv_id").distinct().count()
    assert anti.hits.count() == n_convs - 50
    # reference predicate-library analogs (SURVEY §2.2 P6)
    assert by_id["R04_tool_without_name"].status == "SUCCESS"
    tool_hits = by_id["R04_tool_without_name"].hits
    assert tool_hits.filter(F.col("role") != "tool").count() == 0
    assert by_id["R16_symbol_ratio"].status == "SUCCESS"
    assert by_id["R18_ts_range"].hits.count() == 0  # synth ts are in range
    # compare cross-check: every registry conv mismatches expected_turns=-1
    rc03 = by_id["RC03_turn_count_cross_check"]
    assert rc03.status == "SUCCESS"
    assert rc03.hits.count() == 50


def test_missing_column_is_skipped(spark, transcripts_df):
    rule = Rule.from_dict(
        {
            "meta": {"rule_id": "bad", "severity": "P0"},
            "logic": {"type": "filter", "filter_expr": "col('no_such_column') > lit(1)"},
        }
    )
    res = evaluate_rule(rule, transcripts_df)
    # business error: SKIPPED (or FAILED), never raises
    assert res.status in ("SKIPPED", "FAILED")
    assert res.hits is None


def test_compare_cross_entity(spark, transcripts_df):
    rule = Rule.from_dict(
        {
            "meta": {"rule_id": "cmp", "severity": "P1"},
            "logic": {
                "type": "cross_entity",
                "right_entity": "conv_stats",
                "operation": "compare",
                "join_keys": ["conv_id"],
                "left_pre_agg": {
                    "group_by": ["conv_id"],
                    "aggregations": [{"name": "n", "expr": "count(lit(1))"}],
                },
                "assertion": "col('n') != col('expected_n')",
            },
        }
    )
    stats = transcripts_df.groupBy("conv_id").agg(F.count("*").alias("expected_n"))
    res = evaluate_rule(rule, transcripts_df, {"conv_stats": stats})
    assert res.status == "SUCCESS"
    assert res.hits.count() == 0  # self-derived stats always agree


def _dep_rule(rid, depends_on=None):
    meta = {"rule_id": rid, "severity": "P2"}
    if depends_on:
        meta["depends_on"] = depends_on
    return Rule.from_dict(
        {"meta": meta, "logic": {"type": "filter", "filter_expr": "lit(True)"}}
    )


def test_toposort_dependency_chain():
    from dataquality_box_spark.operators.rules import toposort_rules

    # declared out of order: C -> B -> A plus an independent D
    rules = [
        _dep_rule("C", ["B"]),
        _dep_rule("D"),
        _dep_rule("B", ["A"]),
        _dep_rule("A"),
    ]
    ordered = [r.rule_id for r in toposort_rules(rules)]
    assert ordered.index("A") < ordered.index("B") < ordered.index("C")
    assert set(ordered) == {"A", "B", "C", "D"}


def test_toposort_rejects_cycle():
    from dataquality_box_spark.operators.rules import toposort_rules

    rules = [_dep_rule("A", ["B"]), _dep_rule("B", ["A"])]
    with pytest.raises(RuleConfigError, match="cycle"):
        toposort_rules(rules)


def test_toposort_rejects_unknown_dependency():
    from dataquality_box_spark.operators.rules import toposort_rules

    with pytest.raises(RuleConfigError, match="unknown"):
        toposort_rules([_dep_rule("A", ["GHOST"])])


def test_load_rules_skips_empty_yaml(tmp_path):
    import os
    import shutil

    from dataquality_box_spark.operators.rules import load_rules

    src = os.path.join(os.path.dirname(__file__), "..", "rules")
    for f in sorted(os.listdir(src))[:2]:
        shutil.copy(os.path.join(src, f), tmp_path / f)
    (tmp_path / "zz_empty.yaml").write_text("")  # reference skips, not errors
    (tmp_path / "notes.txt").write_text("ignored")
    rules = load_rules(str(tmp_path))
    assert len(rules) == 2


def test_symbol_ratio_translate_matches_regex_form(spark):
    """symbol_ratio's translate() rewrite must stay value-identical to the
    frozen oracle's regexp_replace char-class delete — including on
    non-ASCII, surrogate-pair, empty and NULL text (r6 optimization)."""
    from dataquality_box_spark.functions.text import symbol_ratio

    rows = [
        ("",), ("abc",), ("a!b?c",), ("   ",), ("\t\n\r",),
        ("a€b☃",), ("ééé",), ("K x",),
        ("\U0001f642\U0001f642",), ("mixed 123 !!! ~#\t\n",), (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    regex_form = F.when(
        F.coalesce(F.length("text"), F.lit(0)) > 0,
        F.length(F.regexp_replace("text", "[A-Za-z0-9 \\t\\n\\r]", ""))
        / F.coalesce(F.length("text"), F.lit(0)),
    ).otherwise(F.lit(0.0))
    got = df.select(
        symbol_ratio(F.col("text")).alias("t"), regex_form.alias("r")
    ).collect()
    for row in got:
        assert row["t"] == row["r"], (row["t"], row["r"])
