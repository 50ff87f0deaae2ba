"""Post-reconciliation quality report: set-consistency status, perfect
rate, capped error details.

Re-expression of the reference MetricsEngine.calculate_report
(reference: plugins/dq_lib/metrics.py:13-160): each matched pair carries
two value SETS (container numbers there); the report classifies every
row, computes the perfect rate and the matched-only mean time diff, and
extracts a capped, priority-sorted error sample. Classification order
(metrics.py:96-107):

    left set NULL/empty  -> NULL_LEFT
    right set NULL/empty -> NULL_RIGHT
    sets intersect       -> MATCH
    otherwise            -> MISMATCH

perfect = MATCH and time_diff <= threshold (metrics.py:112-114, the
300 s THRESHOLD_TIME_DIFF). Error details exclude status-2 (target-only)
rows and sort by time diff descending (metrics.py:131-136) — here with
an id tiebreak so the cap is deterministic, and the cap stays 20.

Everything is narrow column work over the already-joined frame; the
only aggregations are the one-row summary and the status histogram.
The reference's driver-side dict assembly becomes DataFrames so the
report itself distributes."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME_DIFF_THRESHOLD_SEC = 300  # reference: plugins/services/config.py:26
ERROR_DETAIL_CAP = 20  # reference: plugins/dq_lib/metrics.py:136


def _empty(s: Column) -> Column:
    return s.isNull() | (F.size(s) == 0)


def match_status(left_set: Column, right_set: Column) -> Column:
    """NULL_LEFT / NULL_RIGHT / MATCH / MISMATCH, in the reference's
    precedence order (NULL aggregates count as empty sets)."""
    return (
        F.when(_empty(left_set), F.lit("NULL_LEFT"))
        .when(_empty(right_set), F.lit("NULL_RIGHT"))
        .when(F.size(F.array_intersect(left_set, right_set)) > 0, F.lit("MATCH"))
        .otherwise(F.lit("MISMATCH"))
    )


def classify(
    df: DataFrame,
    left_set: str,
    right_set: str,
    diff_col: str,
    threshold_sec: int = TIME_DIFF_THRESHOLD_SEC,
) -> DataFrame:
    """Adds ``set_status`` and ``is_perfect`` to the matched frame."""
    status = match_status(F.col(left_set), F.col(right_set))
    return df.withColumn("set_status", status).withColumn(
        "is_perfect",
        (F.col("set_status") == "MATCH") & (F.col(diff_col) <= threshold_sec),
    )


def error_details(
    classified: DataFrame,
    id_col: str,
    diff_col: str,
    matched_col: str,
    cap: int = ERROR_DETAIL_CAP,
    threshold_sec: int = TIME_DIFF_THRESHOLD_SEC,
) -> DataFrame:
    """Capped error sample: non-perfect rows excluding target-only
    (matched_status == 2), priority = largest time diff first with an id
    tiebreak (the reference's head(20) after the same sort,
    metrics.py:131-136). The issue string mirrors its format."""
    issue = F.concat_ws(
        ", ",
        F.when(F.col("set_status") != "MATCH", F.concat(F.lit("Cntr "), F.col("set_status"))),
        F.when(
            F.col(diff_col) > threshold_sec,
            F.concat(F.lit("TimeDiff "), F.col(diff_col).cast("long").cast("string"), F.lit("s")),
        ),
    )
    return (
        classified.where(~F.col("is_perfect") & (F.col(matched_col) != 2))
        .orderBy(F.col(diff_col).desc(), F.col(id_col))
        .limit(cap)
        .select(F.col(id_col), issue.alias("issue"), F.col(diff_col))
    )


def quality_summary(
    classified: DataFrame, diff_col: str, matched_col: str
) -> DataFrame:
    """One-row rollup: total, perfect count, mean time diff over
    matched rows only (statuses 1/4, metrics.py:121-123)."""
    return classified.agg(
        F.count("*").alias("total_count"),
        F.sum(F.col("is_perfect").cast("long")).alias("perfect_count"),
        F.round(
            F.avg(F.when(F.col(matched_col).isin(1, 4), F.col(diff_col))), 2
        ).alias("avg_time_diff_sec"),
    )


def status_distribution(classified: DataFrame) -> DataFrame:
    """Status histogram (metrics.py:126-128)."""
    return classified.groupBy("set_status").agg(F.count("*").alias("n"))


def real_missing(
    matched_col: str,
    ts_col: str,
    clip_start,
    clip_end,
) -> Column:
    """The reference's clipped real-missing judgment (reference:
    plugins/services/data_quality_runner.py:922-948): a row counts as
    REALLY missing only when it is unmatched AND its timestamp falls
    inside the observed window [clip_start, clip_end] — unmatched rows
    outside the window are neighboring-shift noise and ignored. When the
    window cannot be computed (either bound None), NOTHING is flagged
    (false negatives over false alarms, the reference's stance).

    A pure Column builder — compose it into any joined frame:
    ``joined.withColumn("real_missing", real_missing(...))``.
    """
    if clip_start is None or clip_end is None:
        return F.lit(False)
    in_window = (F.col(ts_col) >= F.lit(clip_start)) & (
        F.col(ts_col) <= F.lit(clip_end)
    )
    return ~F.col(matched_col) & in_window
