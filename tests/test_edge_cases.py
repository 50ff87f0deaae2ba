"""Edge-case parity: nulls, empties, unicode, whales — Spark == reference.

Pins the reference's null-tolerant semantics (reference: strict=False
casts and typed empty frames, plugins/dq_lib/reconciliation.py:29-44,
plugins/services/data_quality_runner.py:875-878): dirty rows never throw,
they get dropped with reasons.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from dataquality_box_spark.config import DEFAULT_CONFIG
from dataquality_box_spark.plans.pipeline import run_pipeline
from dataquality_box_spark.reference_impl import reference_labels
from dataquality_box_spark.schema import TRANSCRIPT_SCHEMA


def _edge_pdf() -> pd.DataFrame:
    rows = [
        # conv with null text / empty text / null role / null ts
        ("c1", 0, "user", None, None, dt.datetime(2024, 1, 1, 0, 0, 0)),
        ("c1", 1, None, "", None, dt.datetime(2024, 1, 1, 0, 0, 1)),
        ("c1", 2, "assistant", "a perfectly normal reply with enough words here", None,
         dt.datetime(2024, 1, 1, 0, 0, 2)),
        ("c1", 3, "user", "x", None, None),
        # single-turn conversation
        ("c2", 0, "user", "only one turn in this conversation but it is fine", None,
         dt.datetime(2024, 1, 1, 1, 0, 0)),
        # unicode: emoji + CJK + accents
        ("c3", 0, "user", "héllo wörld 你好 🙂 this text has unicode but plenty words",
         None, dt.datetime(2024, 1, 2, 0, 0, 0)),
        ("c3", 1, "assistant", "数据 模型 查询 表格 答案 问题 系统 结果 数值 请问",
         None, dt.datetime(2024, 1, 2, 0, 0, 5)),
        # tool turn directly after user (broken chain)
        ("c4", 0, "user", "please run the tool for me right now thanks", None,
         dt.datetime(2024, 1, 3, 0, 0, 0)),
        ("c4", 1, "tool", "tool output content goes here with some words", "tool_1",
         dt.datetime(2024, 1, 3, 0, 0, 1)),
        # duplicate turn_idx (ts breaks the tie)
        ("c5", 0, "user", "first message in the duplicate index conversation", None,
         dt.datetime(2024, 1, 4, 0, 0, 0)),
        ("c5", 0, "assistant", "second message sharing the same turn index value", None,
         dt.datetime(2024, 1, 4, 0, 0, 1)),
    ]
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})


def test_edge_rows_never_throw_and_match_reference(spark):
    pdf = _edge_pdf()
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    got = (
        run_pipeline(df, DEFAULT_CONFIG)
        .select("conv_id", "turn_idx", "ts", "keep", "drop_reasons", "scrubbed_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = reference_labels(pdf, DEFAULT_CONFIG)
    assert (got["keep"].to_numpy() == exp["keep"].to_numpy()).all()
    assert [list(r) for r in got["drop_reasons"]] == [list(r) for r in exp["drop_reasons"]]
    gs = got["scrubbed_text"].fillna("\0")
    es = exp["scrubbed_text"].fillna("\0")
    assert (gs.to_numpy() == es.to_numpy()).all()
    # specific pins
    def row(conv, idx):
        m = got[(got["conv_id"] == conv) & (got["turn_idx"] == idx)]
        return m.iloc[0]

    assert not row("c1", 0)["keep"]  # null text -> dropped, no crash
    assert "broken_tool_chain" in list(row("c4", 1)["drop_reasons"])
    assert bool(row("c2", 0)["keep"])  # single-turn conv is fine


def test_empty_dataframe_flows_through(spark):
    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    out = run_pipeline(empty, DEFAULT_CONFIG)
    assert out.count() == 0
    assert "keep" in out.columns and "scrubbed_text" in out.columns


def test_whale_conversation_window_correct(spark):
    n = 3000
    pdf = pd.DataFrame(
        {
            "conv_id": ["whale"] * n,
            "turn_idx": range(n),
            "role": ["user" if i % 2 == 0 else "assistant" for i in range(n)],
            "text": [f"turn number {i} with a reasonable amount of text words" for i in range(n)],
            "tool": [None] * n,
            "ts": [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i) for i in range(n)],
        }
    ).astype({"turn_idx": "int32"})
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    out = run_pipeline(df, DEFAULT_CONFIG, repartition_to=4)
    pd_out = out.select("turn_idx", "keep", "drop_reasons").toPandas()
    # perfect alternation: no role-sequence violations anywhere
    assert not pd_out["drop_reasons"].map(lambda r: "bad_role_sequence" in list(r)).any()
    assert pd_out["keep"].all()
