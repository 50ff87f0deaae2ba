"""Crawl-snapshot diff (CDC over two corpus snapshots): classify every
key as added / deleted / changed / same between an old and a new
snapshot, by content hash. The recrawl companion to the incremental
dedup route (operators/dedup.dedup_incremental_lsh): the diff decides
WHAT re-enters the pipeline — only 'added' and 'changed' docs need
re-scoring, re-hashing, and index merges.

Scale posture: each side is projected to (key, md5(payload)) BEFORE the
join, so the one full-outer shuffle carries the key plus a 16-byte hash
— never document text. Output is keyspace-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str = "doc_id", payload: str = "text"
) -> DataFrame:
    """(key, status, old_hash, new_hash); status in
    added | deleted | changed | same."""
    o = old.select(F.col(key), F.md5(F.col(payload)).alias("old_hash"))
    n = new.select(F.col(key), F.md5(F.col(payload)).alias("new_hash"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("deleted"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select(key, status.alias("status"), "old_hash", "new_hash")
