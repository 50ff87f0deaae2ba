"""Watermark catch-up planner + affected-key scan (plans/incremental.py)."""

from __future__ import annotations

from datetime import datetime

from dataquality_box_spark.plans.incremental import (
    ScanWindow,
    affected_keys,
    plan_scan_window,
)

T0 = datetime(2026, 8, 16, 0, 0, 0)


def _t(h):
    return datetime(2026, 8, 16, h, 0, 0)


def test_plan_skips_when_no_new_data():
    assert plan_scan_window(T0, None).action == "skip"
    assert plan_scan_window(T0, T0).action == "skip"
    assert plan_scan_window(_t(5), _t(3)).action == "skip"


def test_plan_clamps_large_gap_and_passes_small():
    big = plan_scan_window(T0, _t(20), batch_limit_hours=8)
    assert (big.action, big.clamped) == ("process", True)
    assert big.window_end == _t(8)
    small = plan_scan_window(T0, _t(3), batch_limit_hours=8)
    assert (small.action, small.clamped) == ("process", False)
    assert small.window_end == _t(3)


def test_affected_keys_window_and_settled_statuses(spark):
    rows = [
        (1, _t(1), 0),  # in window, status 0 -> process
        (2, _t(2), 1),  # in window, settled -> excluded
        (3, _t(3), None),  # in window, NULL status -> process
        (4, _t(9), 0),  # past the clamp -> excluded
        (1, _t(4), 2),  # duplicate key in window -> one row out
    ]
    df = spark.createDataFrame(rows, "k long, modified timestamp, st int")
    win = plan_scan_window(T0, _t(20), batch_limit_hours=8)
    got = sorted(
        r["k"]
        for r in affected_keys(
            df, "k", "modified", win, status_col="st", settled=(1, 3, 4)
        ).collect()
    )
    assert got == [1, 3]


def test_affected_keys_skip_window_is_empty(spark):
    df = spark.createDataFrame([(1, _t(1))], "k long, modified timestamp")
    out = affected_keys(df, "k", "modified", ScanWindow(action="skip"))
    assert out.count() == 0 and out.columns == ["k"]
