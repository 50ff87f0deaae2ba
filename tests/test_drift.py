"""PSI drift detection (operators/drift.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from dataquality_box_spark.operators.drift import psi_report, psi_total


def _batch(spark, counts: dict[str, int]):
    rows = [(c,) for c, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "cat string")


def test_identical_distributions_have_zero_psi(spark):
    e = _batch(spark, {"a": 50, "b": 50})
    a = _batch(spark, {"a": 200, "b": 200})  # same proportions, different size
    rep = psi_report(e, a, F.col("cat"))
    tot = psi_total(rep).collect()[0]
    assert tot["psi"] == 0.0 and tot["verdict"] == "stable"


def test_shift_is_detected_and_matches_closed_form(spark):
    e = _batch(spark, {"a": 80, "b": 20})
    a = _batch(spark, {"a": 50, "b": 50})
    tot = psi_total(psi_report(e, a, F.col("cat"))).collect()[0]
    expect = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(0.5 / 0.2)
    assert abs(tot["psi"] - round(expect, 6)) < 1e-9
    assert tot["verdict"] == "action_required"


def test_missing_bucket_gets_eps_floor_not_infinity(spark):
    e = _batch(spark, {"a": 100})
    a = _batch(spark, {"a": 50, "zzz_new": 50})  # bucket absent from expected
    rep = {r["bucket"]: r for r in psi_report(e, a, F.col("cat")).collect()}
    assert rep["zzz_new"]["p_expected"] == 1e-6  # floored, finite
    assert math.isfinite(rep["zzz_new"]["psi_term"]) and rep["zzz_new"]["psi_term"] > 0
    assert psi_total(psi_report(e, a, F.col("cat"))).collect()[0]["verdict"] == (
        "action_required"
    )
