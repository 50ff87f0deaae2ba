"""Agent-trace operator tests (operators/agentic.py) on engineered
conversations where the expected loops/repeats/artifacts are known."""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.agentic import (
    adjacent_artifacts,
    conversation_pair_jaccard,
    self_repetition,
    tool_loops,
)


def _conv(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf)


def test_tool_loops_finds_adjacent_runs_only(spark):
    df = _conv(
        spark,
        [
            # c1: tool_a called on turns 1,2,3 (run of 3) then once at 7
            ("c1", 0, "user", "q", None),
            ("c1", 1, "tool", "r1", "tool_a"),
            ("c1", 2, "tool", "r2", "tool_a"),
            ("c1", 3, "tool", "r3", "tool_a"),
            ("c1", 4, "assistant", "a", None),
            ("c1", 7, "tool", "r4", "tool_a"),  # gap -> separate island
            # c2: alternating tools, no run
            ("c2", 0, "tool", "x", "tool_a"),
            ("c2", 1, "tool", "y", "tool_b"),
            ("c2", 2, "tool", "z", "tool_a"),
        ],
    )
    runs = tool_loops(df, min_run=2).collect()
    assert len(runs) == 1
    r = runs[0]
    assert (r["conv_id"], r["tool_sig"], r["run_start"], r["run_len"]) == (
        "c1",
        "tool_a",
        1,
        3,
    )


def test_tool_loops_groups_non_tool_turns_by_role(spark):
    # three adjacent assistant turns form a role run (tool_sig = '')
    df = _conv(
        spark,
        [
            ("c1", 0, "assistant", "a", None),
            ("c1", 1, "assistant", "b", None),
            ("c1", 2, "assistant", "c", None),
            ("c1", 3, "user", "d", None),
        ],
    )
    runs = {(r["role"], r["run_len"]) for r in tool_loops(df, min_run=3).collect()}
    assert runs == {("assistant", 3)}


def test_self_repetition_same_role_lag(spark):
    df = _conv(
        spark,
        [
            # assistant restates itself across an intervening user turn:
            # the lag is per (conv_id, role), so turns 1 and 3 compare
            ("c1", 0, "user", "hello there", None),
            ("c1", 1, "assistant", "alpha beta gamma delta", None),
            ("c1", 2, "user", "unrelated words entirely", None),
            ("c1", 3, "assistant", "alpha beta gamma epsilon", None),
            ("c1", 4, "assistant", "totally different now yes", None),
        ],
    )
    out = {r["turn_idx"]: r for r in self_repetition(df, threshold=0.5).collect()}
    # turn 3 vs turn 1: |{alpha,beta,gamma}| / |{alpha..epsilon}| = 3/5
    assert out[3]["jacc_prev"] == 0.6 and out[3]["near_repeat"] == 1
    # turn 4 vs turn 3 shares nothing -> filtered (jacc 0 rows dropped)
    assert 4 not in out
    # turn 2 (user) vs turn 0: no shared tokens -> dropped too
    assert 2 not in out


def test_adjacent_artifacts_exact_dup_and_prefix(spark):
    df = _conv(
        spark,
        [
            ("c1", 0, "assistant", "partial answer", None),
            ("c1", 1, "assistant", "partial answer with the rest", None),  # prefix
            ("c1", 2, "user", "same text", None),
            ("c1", 3, "user", "same text", None),  # exact dup
            ("c1", 4, "user", "different", None),
            # NOT a prefix: next is shorter
            ("c2", 0, "user", "long text here", None),
            ("c2", 1, "user", "long", None),
        ],
    )
    out = {r["turn_idx"]: r["relation"] for r in adjacent_artifacts(df).collect()}
    assert out == {0: "prefix", 2: "exact_dup"}


def test_conversation_pair_jaccard_exact_sets(spark):
    rows = []
    # c1 and c2 share 2 of 3 distinct texts -> jaccard 2/4 = 0.5
    for i, t in enumerate(["aa", "bb", "cc"]):
        rows.append(("c1", i, "user", t, None))
    for i, t in enumerate(["aa", "bb", "dd"]):
        rows.append(("c2", i, "user", t, None))
    # c3 shares nothing
    for i, t in enumerate(["xx", "yy"]):
        rows.append(("c3", i, "user", t, None))
    out = conversation_pair_jaccard(_conv(spark, rows), threshold=0.4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["conv_a"], r["conv_b"], r["shared"], r["jaccard"]) == ("c1", "c2", 2, 0.5)
    assert (r["size_a"], r["size_b"]) == (3, 3)


def test_conversation_pair_jaccard_df_cap_drops_boilerplate(spark):
    rows = []
    # 'boiler' appears in ALL conversations; with max_df=2 it can't form
    # candidate pairs, but still counts in set sizes (honest denominator)
    for c in ("c1", "c2", "c3"):
        rows.append((c, 0, "user", "boiler", None))
    rows += [("c1", 1, "user", "shared", None), ("c2", 1, "user", "shared", None)]
    out = conversation_pair_jaccard(
        _conv(spark, rows), threshold=0.1, max_df=2
    ).collect()
    # only (c1, c2) via 'shared'; jaccard counts boiler in the union:
    # shared=1, sizes 2 and 2 -> 1/3
    assert len(out) == 1
    r = out[0]
    assert (r["conv_a"], r["conv_b"], r["shared"]) == ("c1", "c2", 1)
    assert abs(r["jaccard"] - 1 / 3) < 1e-6


def test_tool_loops_plan_single_exchange(spark):
    """The window and the groupBy share the conv_id-prefixed key, so the
    whole operator is ONE shuffle (partitioning reuse)."""
    df = _conv(spark, [("c1", 0, "user", "q", None), ("c1", 1, "tool", "r", "t")])
    plan = tool_loops(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_role_token_share_flags_both_tails(spark):
    from dataquality_box_spark.operators.agentic import role_token_share

    df = _conv(
        spark,
        [
            # c1: assistant monologue — 19 of 20 tokens
            ("c1", 0, "user", "hi", None),
            ("c1", 1, "assistant", " ".join(["w"] * 19), None),
            # c2: balanced — 5 of 10
            ("c2", 0, "user", "a b c d e", None),
            ("c2", 1, "assistant", "f g h i j", None),
            # c3: assistant silent — 0 of 4
            ("c3", 0, "user", "a b", None),
            ("c3", 1, "tool", "x y", "tool_0"),
        ],
    )
    out = {
        r["conv_id"]: r for r in role_token_share(df, lo=0.1, hi=0.9).collect()
    }
    assert out["c1"]["assistant_share"] == 0.95 and out["c1"]["degenerate"] == 1
    assert out["c2"]["assistant_share"] == 0.5 and out["c2"]["degenerate"] == 0
    assert out["c3"]["assistant_share"] == 0.0 and out["c3"]["degenerate"] == 1
    assert out["c1"]["total_toks"] == 20 and out["c1"]["assistant_toks"] == 19
    assert out["c3"]["user_toks"] == 2


def test_turn_latency_bursts_and_negative_gaps(spark):
    import datetime as dt

    import pandas as pd

    from dataquality_box_spark.operators.agentic import turn_latency

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(seconds):
        return t0 + dt.timedelta(seconds=seconds)

    pdf = pd.DataFrame(
        [
            # c1: gaps of 10s, 0.5s (burst), 0.2s (burst)
            ("c1", 0, ts(0.0)),
            ("c1", 1, ts(10.0)),
            ("c1", 2, ts(10.5)),
            ("c1", 3, ts(10.7)),
            # c2: clock runs backwards on turn 2 (negative gap)
            ("c2", 0, ts(5.0)),
            ("c2", 1, ts(8.0)),
            ("c2", 2, ts(7.0)),
        ],
        columns=["conv_id", "turn_idx", "ts"],
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = {
        r["conv_id"]: r
        for r in turn_latency(spark.createDataFrame(pdf), burst_s=1).collect()
    }
    c1 = out["c1"]
    assert c1["n_gaps"] == 3 and c1["n_bursts"] == 2 and c1["n_negative"] == 0
    assert c1["max_gap_us"] == 10_000_000
    assert abs(c1["mean_gap_s"] - (10.0 + 0.5 + 0.2) / 3) < 1e-6
    c2 = out["c2"]
    assert c2["n_gaps"] == 2 and c2["n_negative"] == 1 and c2["n_bursts"] == 0
    assert c2["max_gap_us"] == 3_000_000
