"""Physical-plan regression tests: the scale properties docs/SCALE.md claims.

If a refactor adds a shuffle or a second Arrow pass to the flagship
pipeline, or breaks scan pushdown, these fail — plan shape IS part of the
contract at 10^12 turns.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dataquality_box_spark.config import DEFAULT_CONFIG
from dataquality_box_spark.plans.pipeline import conversation_metrics, run_pipeline


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_has_single_shuffle_and_single_arrow_pass(spark, transcripts_df):
    result = run_pipeline(transcripts_df, DEFAULT_CONFIG)
    plan = _plan(result)
    assert plan.count("Exchange") == 1, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_metrics_reuse_conv_partitioning(spark, transcripts_df):
    result = run_pipeline(transcripts_df, DEFAULT_CONFIG)
    plan = _plan(conversation_metrics(result))
    # the groupBy(conv_id) must not introduce a second full shuffle on top
    # of the window's conv_id exchange
    assert plan.count("Exchange") <= 1, plan


def test_filter_and_projection_pushdown(spark, tmp_path):
    # pushdown is only visible on a file scan (not an in-memory frame)
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("c1", 0, "user", "hello world text", None, None)],
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    q = df.filter(F.col("conv_id") == "c1").select("conv_id", "turn_idx")
    plan = _plan(q)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "EqualTo(conv_id,c1)" in m.group(1), plan
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs and "text" not in rs.group(1), "projection not pruned: " + rs.group(1)


def test_observe_totals_rides_the_write_action(spark, transcripts_df, tmp_path):
    """CollectMetrics totals from the single write action equal a direct
    aggregation — no second pass over the pipeline output."""
    from dataquality_box_spark.config import DEFAULT_CONFIG
    from dataquality_box_spark.plans.pipeline import (
        kept_turns,
        observe_totals,
        run_pipeline,
    )

    result = run_pipeline(transcripts_df, DEFAULT_CONFIG)
    observed, obs = observe_totals(result, name="t_obs")
    kept_turns(observed).write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    expect = result.select(
        F.count("*").alias("rows_in"), F.sum(F.col("keep").cast("long")).alias("rows_kept")
    ).first()
    assert int(got["rows_in"]) == int(expect["rows_in"])
    assert int(got["rows_kept"]) == int(expect["rows_kept"])
    assert int(got["rows_kept"]) < int(got["rows_in"])  # some turns dropped
