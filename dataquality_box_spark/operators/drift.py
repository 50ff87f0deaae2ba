"""Distribution-drift detection between two batches (PSI).

The reference monitors quality via per-run rule hits; what it lacks —
and what a 100 TB training-data pipeline needs before retraining on a
new crawl — is a cheap answer to "did this batch's distribution move?".
Population Stability Index is the standard check:

    PSI = sum_b (p_actual_b - p_expected_b) * ln(p_actual_b / p_expected_b)

with the usual reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
action. Buckets must be DETERMINISTIC (a category column, or explicit
fixed bin edges) — quantile-derived edges would make the metric depend
on the comparison batch and break replays/oracles. Proportions are
floored at ``eps`` so empty buckets contribute a finite penalty instead
of infinity (the standard smoothing).

Scale: two aggregations (one per batch) on the bucket key + a tiny
bucket-count join — bucket cardinality is bins, not rows, so the join
side is trivially broadcast and the result frame is bins-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6


def _proportions(df: DataFrame, bucket: Column, name: str) -> DataFrame:
    # the counts frame is bins-sized, so the global window (one
    # partition) is trivially cheap and avoids a second pass for the total
    counts = df.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.select("bucket", (F.col("n") / total).alias(name))


def psi_report(
    expected: DataFrame,
    actual: DataFrame,
    bucket: Column,
    eps: float = EPS,
) -> DataFrame:
    """Per-bucket PSI terms. ``bucket`` is any deterministic Column
    expression evaluated against BOTH frames (category, or
    floor((x - lo) / width) for fixed-width bins). Buckets absent from
    one side get proportion ``eps``."""
    e = _proportions(expected, bucket, "p_expected")
    a = _proportions(actual, bucket, "p_actual")
    j = e.join(a, "bucket", "full_outer").select(
        "bucket",
        F.greatest(F.coalesce("p_expected", F.lit(0.0)), F.lit(eps)).alias("pe"),
        F.greatest(F.coalesce("p_actual", F.lit(0.0)), F.lit(eps)).alias("pa"),
    )
    return j.select(
        "bucket",
        F.round("pe", 6).alias("p_expected"),
        F.round("pa", 6).alias("p_actual"),
        F.round((F.col("pa") - F.col("pe")) * F.log(F.col("pa") / F.col("pe")), 6).alias(
            "psi_term"
        ),
    )


def psi_total(report: DataFrame) -> DataFrame:
    """One-row rollup with the standard stability verdict."""
    t = report.agg(F.round(F.sum("psi_term"), 6).alias("psi"))
    return t.select(
        "psi",
        F.when(F.col("psi") < 0.1, F.lit("stable"))
        .when(F.col("psi") < 0.25, F.lit("moderate_shift"))
        .otherwise(F.lit("action_required"))
        .alias("verdict"),
    )
