"""Incremental-scan planning: watermark catch-up clamp + affected keys.

Re-expression of the reference's hourly scanner (reference:
dags/scanner_cactus_monitor.py:44-109): each run advances a stored
watermark toward the table's max modified-timestamp, but by at most
``batch_limit_hours`` per run (the catch-up clamp — after an outage the
backlog drains in bounded batches instead of one giant scan), skips when
nothing new arrived, and selects the DISTINCT affected keys inside the
window, excluding rows whose status is already settled
(scanner_cactus_monitor.py:100-108: statuses 1/3/4 never re-process).

The plan step is two scalars (stored watermark, observed max) — pure
driver-side arithmetic. The key scan is distributed and narrow: a
partition-prunable timestamp range filter + a NOT IN + distinct. At
100 TB the modified-timestamp column is the partition/sort key, so the
range filter prunes to the touched partitions only.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BATCH_LIMIT_HOURS = 8  # reference: scanner_cactus_monitor.py:56


@dataclass(frozen=True)
class ScanWindow:
    action: str  # "process" | "skip"
    window_start: datetime | None = None  # exclusive
    window_end: datetime | None = None  # inclusive
    clamped: bool = False


def plan_scan_window(
    last_watermark: datetime,
    current_max: datetime | None,
    batch_limit_hours: int = BATCH_LIMIT_HOURS,
) -> ScanWindow:
    """Decide this run's scan window. Skip when the table is empty or
    nothing is newer than the watermark; otherwise advance by at most
    ``batch_limit_hours`` (clamped=True when a backlog remains)."""
    if current_max is None or current_max <= last_watermark:
        return ScanWindow(action="skip")
    limit = last_watermark + timedelta(hours=batch_limit_hours)
    if current_max > limit:
        return ScanWindow("process", last_watermark, limit, clamped=True)
    return ScanWindow("process", last_watermark, current_max, clamped=False)


def affected_keys(
    df: DataFrame,
    key_col: str,
    modified_col: str,
    window: ScanWindow,
    status_col: str | Column | None = None,
    settled: Sequence = (),
) -> DataFrame:
    """Distinct keys touched inside the window, excluding already-settled
    rows (NULL status always re-processes, matching the reference's
    ``sync_status IS NULL OR sync_status NOT IN (...)``)."""
    if window.action == "skip":
        return df.select(key_col).limit(0)
    out = df.where(
        (F.col(modified_col) > F.lit(window.window_start))
        & (F.col(modified_col) <= F.lit(window.window_end))
    )
    if status_col is not None and settled:
        sc = F.col(status_col) if isinstance(status_col, str) else status_col
        out = out.where(sc.isNull() | ~sc.isin(list(settled)))
    return out.select(key_col).distinct()
