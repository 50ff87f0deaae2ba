"""Closed-form tests for the key-skew diagnostic (operators/skew.py)
and the crawl-snapshot CDC diff (operators/snapshot.py)."""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.skew import key_skew_report
from dataquality_box_spark.operators.snapshot import snapshot_diff


def test_key_skew_report_integer_exact_flag(spark):
    # keys: a x 10, b x 1, c x 1  -> total 12, n_keys 3, mean 4
    # hot iff n * 3 > 4 * 12 = 48  -> a: 30 no... factor=2: n*3 > 2*12=24
    rows = [("a",)] * 10 + [("b",)] + [("c",)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = {r["k"]: r for r in key_skew_report(df, "k", factor=2).collect()}
    assert out["a"]["hot"] == 1 and out["b"]["hot"] == 0
    assert out["a"]["n_rows"] == 10
    assert out["a"]["share_ppm"] == 10 * 1_000_000 // 12
    assert out["c"]["share_ppm"] == 1_000_000 // 12


def test_key_skew_report_uniform_has_no_hot_keys(spark):
    rows = [(f"k{i % 4}",) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = key_skew_report(df, "k", factor=4).collect()
    assert len(out) == 4 and all(r["hot"] == 0 for r in out)
    assert all(r["share_ppm"] == 250_000 for r in out)


def test_snapshot_diff_all_four_statuses(spark):
    old = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["alpha", "beta", "gamma"]}
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [2, 3, 4], "text": ["beta", "gamma CHANGED", "delta"]}
        )
    )
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert out[1]["status"] == "deleted" and out[1]["new_hash"] is None
    assert out[2]["status"] == "same"
    assert out[3]["status"] == "changed"
    assert out[4]["status"] == "added" and out[4]["old_hash"] is None
    assert len(out) == 4
