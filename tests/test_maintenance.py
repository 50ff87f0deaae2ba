"""Retention maintenance: partition sweep + report-table trim.

Mirrors the reference maintenance DAG behaviors (dags/maintenance_dag.py):
multi-pattern batch-date parsing, skip-on-unparseable, freed-bytes
accounting, age-based report trims — with `now` injected, so no clock
patching."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from dataquality_box_spark.plans.maintenance import (
    parse_batch_date,
    sweep_partitions,
    trim_rows,
)
from dataquality_box_spark.sources.tableio import TableIO

NOW = datetime(2026, 8, 16, 12, 0, 0)


def test_parse_batch_date_patterns():
    assert parse_batch_date("20260801T120000") == datetime(2026, 8, 1, 12, 0, 0)
    assert parse_batch_date("run_20260810_093000") == datetime(2026, 8, 10, 9, 30, 0)
    assert parse_batch_date("20260814") == datetime(2026, 8, 14)
    # the T-pattern wins over the bare-date pattern on the same string
    assert parse_batch_date("x20260801T120000y") == datetime(2026, 8, 1, 12, 0, 0)
    assert parse_batch_date("nodatehere") is None
    assert parse_batch_date("99999999") is None  # matches pattern, invalid date


@pytest.fixture
def io(tmp_path):
    return TableIO(str(tmp_path))


def _write_batch(spark, io, value, n=10):
    df = spark.range(n).withColumn("v", F.col("id") * 2)
    io.overwrite_partition(df, "staging", "batch_id", value)


def test_sweep_deletes_only_expired_parseable(spark, io, tmp_path):
    _write_batch(spark, io, "20260801T120000")  # 15 days old -> delete
    _write_batch(spark, io, "20260814_090000")  # 2 days old -> keep
    _write_batch(spark, io, "weird-name")  # unparseable -> skip, never delete
    out = sweep_partitions(io, "staging", now=NOW, retention_days=7)
    assert out["deleted"] == ["20260801T120000"]
    assert out["skipped"] == ["weird-name"]
    assert out["freed_bytes"] > 0
    left = sorted(p.name for p in (tmp_path / "staging").iterdir())
    assert left == ["batch_id=20260814_090000", "batch_id=weird-name"]


def test_sweep_missing_table_is_noop(io):
    out = sweep_partitions(io, "nope", now=NOW)
    assert out == {"deleted": [], "skipped": [], "freed_bytes": 0}


def test_trim_rows_age_retention_idempotent(spark, io):
    rows = [
        ("b1", "2026-05-01 00:00:00", 5),
        ("b2", "2026-08-10 00:00:00", 7),
        ("b3", "2026-08-15 00:00:00", 9),
    ]
    df = spark.createDataFrame(rows, "batch_id string, created_at string, hits int")
    df.write.parquet(f"{io.root}/rule_results")
    keep = F.col("created_at") >= "2026-08-01 00:00:00"
    assert trim_rows(spark, io, "rule_results", keep) == 1
    kept = io.read(spark, "rule_results")
    assert sorted(r["batch_id"] for r in kept.collect()) == ["b2", "b3"]
    # second run removes nothing and leaves the table untouched
    assert trim_rows(spark, io, "rule_results", keep) == 0
    assert io.read(spark, "rule_results").count() == 2
