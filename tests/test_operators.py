"""Unit tests for the operator library: recon joins, conversation ops, skew.

Planted-case fixtures per FIXTURES.md §4: exact L1 matches, loose L2
matches with overlap, orphans, competing candidates where nearest wins.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from dataquality_box_spark.operators.conversation import (
    compact_consecutive_runs,
    group_broadcast,
    top1_per_group,
)
from dataquality_box_spark.operators.recon import (
    asof_nearest_join,
    range_join_best,
    two_tier_match,
)
from dataquality_box_spark.operators.skew import salted_agg, with_salt

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _recon_frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["a", "a", "a", "b", "c"],
                "id": [1, 2, 3, 4, 5],
                "event_ts": [_ts(0), _ts(100), _ts(500), _ts(0), _ts(0)],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["a", "a", "a", "a", "b"],
                "rid": [10, 11, 12, 13, 14],
                # 10: 2min from id1 (L1); 11: 3min from id1 (competing, loses)
                # 12: 90min from id2 (L2 range); 13: far from everything
                # 14: 1min from id4 (L1 for key b)
                "r_ts": [_ts(2), _ts(3), _ts(190), _ts(1000), _ts(1)],
            }
        )
    )
    return left, right


def test_asof_nearest_within_tolerance(spark):
    left, right = _recon_frames(spark)
    m = asof_nearest_join(
        left, right, "key", "event_ts", "r_ts", 5 * 60_000_000, left_id="id",
        how="left", tiebreak=["rid"],
    ).toPandas().set_index("id").sort_index()
    assert m.loc[1, "rid"] == 10  # nearest wins over rid 11
    assert pd.isna(m.loc[2, "rid"])  # 90min > 5min tolerance
    assert pd.isna(m.loc[3, "rid"])
    assert m.loc[4, "rid"] == 14
    assert pd.isna(m.loc[5, "rid"])  # no right rows for key c


def test_two_tier_match_statuses(spark):
    left, right = _recon_frames(spark)
    m = two_tier_match(
        left, right, "key", "event_ts", "r_ts",
        strict_us=5 * 60_000_000, loose_us=3 * 3600_000_000,
        left_id="id", right_id="rid",
    ).toPandas().set_index("id").sort_index()
    assert m.loc[1, "matched_status"] == 1 and m.loc[1, "rid"] == 10
    assert m.loc[2, "matched_status"] == 4 and m.loc[2, "rid"] == 12  # loose
    # id 3 at minute 500: nearest candidates are 310min and 500min away,
    # both beyond the 3h loose window -> orphan
    assert m.loc[3, "matched_status"] == 3 and pd.isna(m.loc[3, "rid"])
    assert m.loc[4, "matched_status"] == 1 and m.loc[4, "rid"] == 14
    assert m.loc[5, "matched_status"] == 3  # orphan


def test_asof_join_back_is_null_safe(spark):
    # NULLs in non-key left columns must not detach a row from its match
    # (the reference's Cycle entity has nullable payload fields,
    # plugins/domain/entities/cycle.py:6-91)
    left, right = _recon_frames(spark)
    left = left.withColumn(
        "free_text", F.when(F.col("id") == 1, F.lit(None).cast("string")).otherwise(F.lit("x"))
    )
    m = asof_nearest_join(
        left, right, "key", "event_ts", "r_ts", 5 * 60_000_000, left_id="id",
        how="left", tiebreak=["rid"],
    ).toPandas().set_index("id").sort_index()
    assert m.loc[1, "rid"] == 10  # matched despite NULL free_text
    assert pd.isna(m.loc[1, "free_text"])
    assert m.loc[4, "rid"] == 14


def test_two_tier_match_string_right_id(spark):
    # status-3 orphan rows must carry a null of the right id's ACTUAL type
    left, right = _recon_frames(spark)
    right = right.withColumn("rid", F.concat(F.lit("R"), F.col("rid").cast("string")))
    m = two_tier_match(
        left, right, "key", "event_ts", "r_ts",
        strict_us=5 * 60_000_000, loose_us=3 * 3600_000_000,
        left_id="id", right_id="rid",
    ).toPandas().set_index("id").sort_index()
    assert m.loc[1, "rid"] == "R10" and m.loc[1, "matched_status"] == 1
    assert m.loc[2, "rid"] == "R12" and m.loc[2, "matched_status"] == 4
    assert pd.isna(m.loc[3, "rid"]) and m.loc[3, "matched_status"] == 3


def test_range_join_overlap_predicate(spark):
    left, right = _recon_frames(spark)
    left = left.withColumn("tags", F.array(F.lit("x"), F.lit("y")))
    right = right.withColumn(
        "rtags",
        F.when(F.col("rid") == 12, F.array(F.lit("y"))).otherwise(F.array(F.lit("z"))),
    )
    m = range_join_best(
        left, right, "key", "event_ts", "r_ts", 3 * 3600_000_000,
        extra_pred=F.size(F.array_intersect(F.col("tags"), F.col("rtags"))) > 0,
        left_key_cols=["id"], tiebreak=["rid"],
    ).toPandas()
    # only rid 12 satisfies the overlap; it is within 3h only of id 2
    assert set(m["id"]) == {2}
    assert m.iloc[0]["rid"] == 12


def test_group_broadcast_and_top1(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 3.0, 5.0]})
    )
    out = group_broadcast(df, "g", {"g_sum": F.sum("v")}).toPandas()
    assert set(zip(out["g"], out["g_sum"])) == {("a", 4.0), ("a", 4.0), ("b", 5.0)}
    best = top1_per_group(df, "g", F.col("v").desc()).toPandas().set_index("g")
    assert best.loc["a", "v"] == 3.0 and best.loc["b", "v"] == 5.0


def test_compact_consecutive_runs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "g": ["a"] * 6,
                "pos": [1, 2, 3, 4, 5, 6],
                "state": ["x", "x", "y", "y", "x", "x"],
            }
        )
    )
    out = compact_consecutive_runs(df, "g", "pos", "state").toPandas()
    # three runs: xx (keep pos2), yy (keep pos4), xx (keep pos6)
    assert sorted(out["pos"]) == [2, 4, 6]


def test_salted_agg_matches_plain(spark, transcripts_df):
    plain = (
        transcripts_df.groupBy("conv_id")
        .agg(F.count("*").alias("n_rows"), F.sum("turn_idx").alias("total"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    salted = (
        salted_agg(
            transcripts_df,
            "conv_id",
            {"c": F.count("*"), "s": F.sum("turn_idx")},
            {"n_rows": F.sum("c"), "total": F.sum("s")},
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_with_salt_deterministic(spark, transcripts_df):
    a = with_salt(transcripts_df, "conv_id").select("__salt").toPandas()
    b = with_salt(transcripts_df, "conv_id").select("__salt").toPandas()
    assert (a["__salt"] == b["__salt"]).all()
    assert a["__salt"].between(0, 15).all()


def test_sessionize_gaps_and_islands(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user": ["u1"] * 4 + ["u2"],
                "ts": [_ts(0), _ts(10), _ts(90), _ts(95), _ts(0)],
                "eid": [1, 2, 3, 4, 5],
            }
        )
    )
    from dataquality_box_spark.operators.conversation import (
        session_bounds,
        sessionize,
    )

    s = sessionize(df, "user", "ts", gap_sec=1800, order_extra=("eid",))
    rows = s.toPandas().set_index("eid").sort_index()
    # 80-minute gap between minute 10 and 90 splits u1 into two sessions
    assert list(rows["session_no"]) == [1, 1, 2, 2, 1]
    b = session_bounds(s, "user", "ts").toPandas()
    u1 = b[b.user == "u1"].sort_values("session_no")
    assert list(u1["n_events"]) == [2, 2]


def test_time_consistency_year_alignment_and_feb29(spark):
    from datetime import datetime

    from dataquality_box_spark.operators.recon import (
        consistency_summary,
        time_consistency_check,
    )

    rows = [
        # same instant, scrambled year -> aligned, no violation
        (1, datetime(2026, 5, 10, 12, 0, 0), datetime(2019, 5, 10, 12, 0, 0)),
        # 10-minute real drift survives alignment -> violation
        (2, datetime(2026, 5, 10, 12, 0, 0), datetime(2019, 5, 10, 12, 10, 0)),
        # right on Feb 29, left year non-leap: rebuild is invalid ->
        # NULL aligned_ts counted as a violation (reference Polars panics)
        (3, datetime(2025, 3, 1, 0, 0, 0), datetime(2024, 2, 29, 23, 58, 0)),
    ]
    df = spark.createDataFrame(rows, "k long, lts timestamp, rts timestamp")
    out = time_consistency_check(df, "lts", "rts", threshold_sec=300)
    got = {r["k"]: (r["is_violation"], r["time_diff_sec"]) for r in out.collect()}
    assert got[1] == (False, 0)
    assert got[2] == (True, 600)
    assert got[3][0] is True and got[3][1] is None

    s = consistency_summary(out, "k").collect()[0]
    assert (s["total_matched"], s["failed"], s["passed"]) == (3, 2, False)
    assert s["failed_samples"] == [2, 3]


def test_recon_metrics_classification_and_errors(spark):
    from dataquality_box_spark.operators.recon_metrics import (
        classify,
        error_details,
        quality_summary,
    )

    rows = [
        # id, set_a, set_b, diff, matched_status
        (1, [], ["x"], 10.0, 1),  # NULL_LEFT (empty beats all)
        (2, ["x"], [], 10.0, 1),  # NULL_RIGHT
        (3, ["x", "y"], ["y"], 100.0, 1),  # MATCH + diff<=300 -> perfect
        (4, ["x"], ["y"], 50.0, 4),  # MISMATCH
        (5, ["x"], ["x"], 400.0, 4),  # MATCH but diff>300 -> not perfect
        (6, ["x"], ["y"], 999.0, 2),  # target-only: excluded from errors
    ]
    df = spark.createDataFrame(
        rows, "id long, set_a array<string>, set_b array<string>, "
        "time_diff_sec double, matched_status int"
    )
    c = classify(df, "set_a", "set_b", "time_diff_sec")
    got = {r["id"]: (r["set_status"], r["is_perfect"]) for r in c.collect()}
    assert got == {
        1: ("NULL_LEFT", False),
        2: ("NULL_RIGHT", False),
        3: ("MATCH", True),
        4: ("MISMATCH", False),
        5: ("MATCH", False),
        6: ("MISMATCH", False),
    }
    errs = error_details(c, "id", "time_diff_sec", "matched_status").collect()
    assert [r["id"] for r in errs] == [5, 4, 1, 2]  # diff desc, id tiebreak
    assert errs[0]["issue"] == "TimeDiff 400s"
    assert errs[1]["issue"] == "Cntr MISMATCH"
    s = quality_summary(c, "time_diff_sec", "matched_status").collect()[0]
    assert (s["total_count"], s["perfect_count"]) == (6, 1)
    assert s["avg_time_diff_sec"] == 114.0  # mean over statuses 1/4 only


def test_sessionize_subsecond_gap_boundary(spark):
    from datetime import datetime

    from dataquality_box_spark.operators.conversation import sessionize

    rows = [
        # gap 1800.4s: > 30min by interval comparison -> NEW session
        (1, datetime(2026, 8, 16, 0, 0, 0, 100000)),
        (1, datetime(2026, 8, 16, 0, 30, 0, 500000)),
        # gap 1799.9s from the previous -> SAME session (floor-diff would say 1801 > 1800)
        (1, datetime(2026, 8, 16, 0, 59, 60 - 1, 400000)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = [
        r["session_no"]
        for r in sessionize(df, "user_id", "ts", gap_sec=1800).orderBy("ts").collect()
    ]
    assert got == [1, 2, 2]


def test_asof_colliding_right_columns_raise(spark):
    # the documented no-collision contract is enforced with a loud error,
    # not by silently dropping the right-side column from the output
    import pytest

    left, right = _recon_frames(spark)
    right = right.withColumn("event_ts", F.col("r_ts"))  # collides with left
    with pytest.raises(ValueError, match="collide"):
        asof_nearest_join(
            left, right, "key", "event_ts", "r_ts", 5 * 60_000_000,
            left_id="id", how="left",
        )


def _long_conv_fixture(spark):
    """One 10k-turn conversation with planted violations + two small ones."""
    import pandas as pd

    rows = []
    base = pd.Timestamp("2024-01-01", tz="UTC")
    for i in range(10_000):
        role = ["user", "assistant", "tool"][i % 3]
        if i % 997 == 0 and i > 0:
            role = "user" if (i - 1) % 3 == 0 else role  # planted repeats
        ts = base + pd.Timedelta(seconds=i if i % 1231 else -5)
        rows.append(("big", i, role, f"text {i}", "t0", ts))
    for c in ("s1", "s2"):
        for i in range(5):
            rows.append((c, i, ["user", "assistant"][i % 2], "hi", None,
                         base + pd.Timedelta(seconds=i)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf)


def test_bucketed_conversation_flags_match_unbucketed(spark):
    """Secondary bucketing (SURVEY hard part #2): flags from the
    (conv_id, bucket) windows + tail merge must equal the plain
    per-conversation window on a 10k-turn conversation, including every
    bucket-boundary row."""
    from dataquality_box_spark.config import QualityConfig
    from dataquality_box_spark.operators.conversation import (
        with_conversation_flags,
        with_conversation_flags_bucketed,
    )

    df = _long_conv_fixture(spark)
    cfg = QualityConfig()
    cols = ["conv_id", "turn_idx", "bad_role_sequence", "broken_tool_chain",
            "out_of_order_ts"]
    plain = (
        with_conversation_flags(df, cfg)
        .select(*cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    bucketed = (
        with_conversation_flags_bucketed(df, cfg, bucket_turns=256)
        .select(*cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(plain, bucketed)
    # sanity: the fixture actually plants violations
    assert plain["bad_role_sequence"].sum() > 0
    assert plain["out_of_order_ts"].sum() > 0


def test_bucketed_flags_window_keys_include_bucket(spark):
    """Plan shape: the bucketed path's data window partitions on
    (conv_id, bucket) — the per-task ceiling is the bucket, not the
    conversation — and the config knob routes to it."""
    from dataquality_box_spark.config import QualityConfig
    from dataquality_box_spark.operators.conversation import (
        with_conversation_flags,
    )

    df = _long_conv_fixture(spark)
    cfg = QualityConfig(conversation_bucket_turns=256)
    plan = (
        with_conversation_flags(df, cfg)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    # the data window's partition spec is (conv_id, __cbkt, <order...>)
    assert re.search(
        r"windowspecdefinition\(conv_id#\d+, __cbkt#\d+L, turn_idx", plan
    ), plan


def test_bucketed_flags_handle_sparse_turn_idx(spark):
    """Sparse turn indices leave EMPTY buckets between occupied ones; the
    tail merge must supply each bucket's predecessor from the previous
    NON-EMPTY bucket (lag over the tails table), not literally bucket-1."""
    import pandas as pd

    from dataquality_box_spark.config import QualityConfig
    from dataquality_box_spark.operators.conversation import (
        with_conversation_flags,
        with_conversation_flags_bucketed,
    )

    base = pd.Timestamp("2024-01-01", tz="UTC")
    # buckets of 256: idx 0,5,6 -> bucket 0; 300,301 -> 1; 1000 -> 3
    # (bucket 2 empty); planted repeat at 300 vs 6, regress at 1000
    rows = [
        ("c", 0, "user", "a", None, base),
        ("c", 5, "assistant", "b", None, base + pd.Timedelta(seconds=5)),
        ("c", 6, "user", "c", None, base + pd.Timedelta(seconds=6)),
        ("c", 300, "user", "d", None, base + pd.Timedelta(seconds=300)),
        ("c", 301, "assistant", "e", None, base + pd.Timedelta(seconds=301)),
        ("c", 1000, "user", "f", None, base - pd.Timedelta(seconds=10)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    )
    cfg = QualityConfig()
    cols = ["turn_idx", "bad_role_sequence", "out_of_order_ts"]
    plain = (
        with_conversation_flags(df, cfg).select(*cols).toPandas()
        .sort_values("turn_idx").reset_index(drop=True)
    )
    bucketed = (
        with_conversation_flags_bucketed(df, cfg, bucket_turns=256)
        .select(*cols).toPandas().sort_values("turn_idx").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, bucketed)
    by_idx = plain.set_index("turn_idx")
    assert bool(by_idx.loc[300, "bad_role_sequence"])  # cross-boundary repeat
    assert bool(by_idx.loc[1000, "out_of_order_ts"])  # across the empty bucket


def test_sft_examples_context_assembly(spark):
    import pandas as pd

    from dataquality_box_spark.operators.conversation import sft_examples

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4 + ["c2"],
            "turn_idx": [0, 1, 2, 3, 0],
            "role": ["user", "assistant", "tool", "assistant", "assistant"],
            "text": ["hi", "hello", "ran", "done", "opener"],
        }
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in sft_examples(spark.createDataFrame(pdf)).collect()
    }
    assert set(out) == {("c1", 1), ("c1", 3), ("c2", 0)}
    assert out[("c1", 1)]["context_text"] == "user: hi"
    assert out[("c1", 1)]["response_text"] == "hello"
    assert out[("c1", 3)]["context_text"] == "user: hi\nassistant: hello\ntool: ran"
    assert out[("c1", 3)]["n_context_turns"] == 3
    # first-turn generation: kept with empty context, flagged by count 0
    assert out[("c2", 0)]["context_text"] == "" and out[("c2", 0)]["n_context_turns"] == 0


def test_sft_examples_null_text_coalesces(spark):
    import pandas as pd

    from dataquality_box_spark.operators.conversation import sft_examples

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user", "tool", "assistant"],
            "text": ["hi", None, "done"],
        }
    )
    out = sft_examples(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    # the NULL tool turn renders as 'tool: ' and still counts
    assert out[0]["context_text"] == "user: hi\ntool: "
    assert out[0]["n_context_turns"] == 2
