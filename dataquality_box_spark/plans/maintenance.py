"""Retention maintenance: expired-partition sweep + report-table trim.

Re-expression of the reference maintenance DAG (reference:
dags/maintenance_dag.py:17-21 retention constants, :28-45 multi-pattern
batch-date parsing with skip-on-unparseable, :155-200 local parquet
batch sweep with freed-bytes accounting, :135-152 governance report
trims by age). The Airflow/MySQL machinery (XCom/Log cleanup, hooks)
has no counterpart here — Spark has no XCom — but the two behaviors a
data platform actually depends on do:

* ``sweep_partitions``: delete ``batch_id=<date-stamped>`` partitions
  older than the retention window. Dates are parsed from the partition
  VALUE with the reference's three patterns in priority order;
  unparseable names are skipped (never deleted), and freed bytes are
  accounted. Driver-side directory listing is correct at scale: the
  partition LIST is metadata (thousands of entries), never data.
* ``trim_rows``: age-based row retention on a report table. On an
  Iceberg catalog this is ``DELETE WHERE`` on a partition predicate
  (metadata-only); the parquet fallback rewrites the table through the
  same TableIO seam the MERGE sink uses.

``now`` is always an explicit parameter — deterministic for tests and
replayable for backfills (the reference hardwires pendulum.now, which
makes its sweep untestable without clock patching).
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timedelta

from pyspark.sql import Column, SparkSession

from ..sources.tableio import TableIO

# Retention windows (reference: dags/maintenance_dag.py:17-21). XCOM and
# DB-log rows are Airflow-internal and have no analog here.
RETENTION_DAYS_RULE_RESULTS = 90
RETENTION_DAYS_RUN_SUMMARY = 365
RETENTION_DAYS_PARQUET = 7

# Priority-ordered batch_id date patterns (maintenance_dag.py:28-33).
_BATCH_DATE_PATTERNS = [
    (re.compile(r"(\d{8}T\d{6})"), "%Y%m%dT%H%M%S"),
    (re.compile(r"(\d{8}_\d{6})"), "%Y%m%d_%H%M%S"),
    (re.compile(r"(\d{8})"), "%Y%m%d"),
]


def parse_batch_date(batch_name: str) -> datetime | None:
    """Extract a timestamp from a batch_id value; None if no pattern
    matches (callers must SKIP such partitions, never delete them)."""
    for pattern, fmt in _BATCH_DATE_PATTERNS:
        m = pattern.search(batch_name)
        if m:
            try:
                return datetime.strptime(m.group(1), fmt)
            except ValueError:
                continue
    return None


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fns in os.walk(path)
        for f in fns
    )


def sweep_partitions(
    io: TableIO,
    table: str,
    now: datetime,
    part_col: str = "batch_id",
    retention_days: int = RETENTION_DAYS_PARQUET,
) -> dict:
    """Delete date-stamped partitions older than the retention window.

    Returns ``{"deleted": [...], "skipped": [...], "freed_bytes": N}``.
    Skipped = partitions whose value carries no parseable date (the
    reference logs a warning and moves on, maintenance_dag.py:183-186).
    """
    cutoff = now - timedelta(days=retention_days)
    root = io._dir(table)
    deleted: list[str] = []
    skipped: list[str] = []
    freed = 0
    if not os.path.isdir(root):
        return {"deleted": deleted, "skipped": skipped, "freed_bytes": 0}
    prefix = f"{part_col}="
    for entry in sorted(os.listdir(root)):
        if not entry.startswith(prefix):
            continue
        value = entry.split("=", 1)[1]
        stamp = parse_batch_date(value)
        if stamp is None:
            skipped.append(value)
            continue
        if stamp < cutoff:
            freed += _dir_bytes(os.path.join(root, entry))
            io.drop_partition(table, part_col, value)
            deleted.append(value)
    return {"deleted": deleted, "skipped": skipped, "freed_bytes": freed}


def trim_rows(
    spark: SparkSession,
    io: TableIO,
    table: str,
    keep: Column,
) -> int:
    """Row-level retention: keep only rows matching ``keep``; returns the
    number of rows removed. Iceberg path: a metadata-only DELETE. Parquet
    fallback: read -> filter -> atomic rewrite (same os.replace staging
    as the MERGE sink, sources/merge.py). The frame is persisted so the
    two counts and the rewrite all come from ONE materialized read — not
    three scans of a directory that could change between them."""
    from ..sources.merge import _atomic_overwrite

    df = io.read(spark, table).persist()
    try:
        total = df.count()
        kept = df.filter(keep)
        removed = total - kept.count()
        if removed:
            _atomic_overwrite(kept, io, table)
    finally:
        df.unpersist()
    return removed
