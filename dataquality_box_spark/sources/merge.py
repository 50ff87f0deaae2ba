"""Upsert / merge sinks on the TableIO seam.

The reference's three writeback shapes (reference: plugins/services/
reconciliation_runner.py:285-426 temp-table bulk UPDATE; :501-631 batch
insert with dedup; plugins/operators/report_writer.py:106-265
INSERT ... ON DUPLICATE KEY UPDATE) are all MERGE semantics. On Iceberg
they become ``MERGE INTO``; the parquet fallback implements the same
contract as read -> anti-join -> union -> atomic overwrite. All three
are idempotent: re-running the same merge yields the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableio import TableIO


def _atomic_overwrite(df: DataFrame, io: TableIO, table: str) -> None:
    """Rewrite a table via staging dir + swap: the overwrite must not read
    from the directory it is replacing. The staging dir lives under
    io.root — the SAME filesystem as the target by construction — so the
    os.replace below is the atomic same-fs rename it requires (an
    Iceberg catalog replaces this whole dance with a snapshot commit)."""
    import os
    import shutil
    import uuid

    target_dir = f"{io.root}/{table}"
    # unique staging dir per call: two in-flight rewrites of the same
    # table must not overwrite each other's staging output (last
    # os.replace still wins the swap, but neither sees corrupt partials).
    # A failed write removes its own staging dir — unique names must not
    # become an unbounded orphan leak under the data root.
    staging = f"{io.root}/__staging__{table}__{uuid.uuid4().hex}"
    try:
        df.write.mode("overwrite").options(**io.write_options()).parquet(
            staging
        )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(target_dir, ignore_errors=True)
    os.replace(staging, target_dir)


def merge_upsert(
    spark: SparkSession,
    io: TableIO,
    updates: DataFrame,
    table: str,
    keys: list[str],
) -> None:
    """MERGE: update rows matching on ``keys``, insert the rest.

    Iceberg path would be `MERGE INTO t USING u ON ... WHEN MATCHED THEN
    UPDATE * WHEN NOT MATCHED THEN INSERT *`; the fallback computes
    (existing ANTI updates) UNION updates and overwrites — same result,
    still snapshot-atomic at the directory level.
    """
    import os

    target_dir = f"{io.root}/{table}"
    if os.path.isdir(target_dir):
        existing = spark.read.parquet(target_dir)
        surviving = existing.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        merged = surviving.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    _atomic_overwrite(merged, io, table)


def insert_missing(
    spark: SparkSession,
    io: TableIO,
    rows: DataFrame,
    table: str,
    keys: list[str],
) -> int:
    """Append only rows whose keys are absent — the reference's
    query-existing + anti-filter + batch insert (reconciliation_runner.py:
    501-631) as one anti join + append."""
    import os

    target_dir = f"{io.root}/{table}"
    if os.path.isdir(target_dir):
        existing_keys = spark.read.parquet(target_dir).select(*keys).distinct()
        fresh = rows.join(existing_keys, on=keys, how="left_anti")
    else:
        fresh = rows
    n = fresh.count()
    if n:
        fresh.write.mode("append").options(**io.write_options()).parquet(target_dir)
    return n


def latest_wins_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Pick the newest row per key before merging (CDC compaction)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
