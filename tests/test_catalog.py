"""Catalog-mode TableIO exercised for REAL against the session catalog.

The production backend is Iceberg (V2 writeTo().overwritePartitions());
this sandbox has no Iceberg jar, but the same TableIO code path runs
against Spark's built-in catalog via dynamic-partition-overwrite
insertInto + partition DDL — so catalog mode is tested end-to-end, and
the Iceberg swap is a catalog name, not a code change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataquality_box_spark.sources.tableio import TableIO

DB = "dqx_cat_test"


@pytest.fixture
def cat_io(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB} LOCATION '{tmp_path}/wh'")
    yield TableIO(str(tmp_path), catalog=DB)
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")


def _frame(spark, part, vals):
    return spark.createDataFrame(
        [(v, f"row{v}", part) for v in vals], "id long, payload string, part_id long"
    )


def test_catalog_overwrite_partition_is_idempotent_and_isolated(spark, cat_io):
    cat_io.overwrite_partition(_frame(spark, 0, [1, 2]), "t", "part_id", 0)
    cat_io.overwrite_partition(_frame(spark, 1, [3]), "t", "part_id", 1)
    assert cat_io.read(spark, "t").count() == 3

    # replaying partition 0 with new content replaces ONLY partition 0
    cat_io.overwrite_partition(_frame(spark, 0, [7, 8, 9]), "t", "part_id", 0)
    got = {
        (r["part_id"], r["id"]) for r in cat_io.read(spark, "t").collect()
    }
    assert got == {(0, 7), (0, 8), (0, 9), (1, 3)}

    # exact replay -> identical table (idempotent)
    cat_io.overwrite_partition(_frame(spark, 0, [7, 8, 9]), "t", "part_id", 0)
    got2 = {
        (r["part_id"], r["id"]) for r in cat_io.read(spark, "t").collect()
    }
    assert got2 == got


def test_catalog_read_partition_prunes(spark, cat_io):
    cat_io.overwrite_partition(_frame(spark, 0, [1]), "t", "part_id", 0)
    cat_io.overwrite_partition(_frame(spark, 1, [2]), "t", "part_id", 1)
    df = cat_io.read_partition(spark, "t", "part_id", 1)
    assert [r["id"] for r in df.collect()] == [2]
    # the partition filter reaches the scan (directory pruning): only the
    # selected partition's files are read
    files = df.inputFiles()
    assert files and all("part_id=1" in f for f in files)


def test_catalog_partition_ddl(spark, cat_io):
    cat_io.overwrite_partition(_frame(spark, 0, [1]), "t", "part_id", 0)
    cat_io.overwrite_partition(_frame(spark, 1, [2]), "t", "part_id", 1)
    assert cat_io.partition_exists("t", "part_id", 0, spark=spark)
    assert not cat_io.partition_exists("t", "part_id", 9, spark=spark)

    cat_io.drop_partition("t", "part_id", 0, spark=spark)
    assert not cat_io.partition_exists("t", "part_id", 0, spark=spark)
    assert [r["id"] for r in cat_io.read(spark, "t").collect()] == [2]

    # catalog mode without a session is a loud error, not a silent no-op
    with pytest.raises(ValueError, match="SparkSession"):
        cat_io.drop_partition("t", "part_id", 1)


def test_catalog_bucketed_write_registers_qualified_table(spark, cat_io):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cat_io.write_bucketed(df, "b", "k", 4, sort_cols=["k"])
    assert spark.catalog.tableExists(f"{DB}.b")
    assert spark.table(f"{DB}.b").count() == 100


def test_catalog_bucketed_merge_upserts_and_prunes(spark, cat_io):
    """merge_upsert_bucketed in CATALOG mode: creates the __kb-partitioned
    catalog table, upserts idempotently, and the read side prunes to the
    touched bucket partitions (the same code path Iceberg would run via
    overwritePartitions)."""
    from dataquality_box_spark.sources.merge import (
        BUCKET_COL,
        key_bucket,
        merge_upsert_bucketed,
        read_merged,
    )

    base = spark.createDataFrame(
        [(f"k{i}", i) for i in range(20)], "k string, v int"
    )
    merge_upsert_bucketed(spark, cat_io, base, "m", keys=["k"], n_buckets=4)
    assert spark.catalog.tableExists(f"{DB}.m")
    got = {r["k"]: r["v"] for r in read_merged(spark, cat_io, "m").collect()}
    assert got == {f"k{i}": i for i in range(20)}

    # upsert: one key updated, one inserted; everything else survives
    upd = spark.createDataFrame([("k3", 300), ("new", 999)], "k string, v int")
    merge_upsert_bucketed(spark, cat_io, upd, "m", keys=["k"], n_buckets=4)
    got = {r["k"]: r["v"] for r in read_merged(spark, cat_io, "m").collect()}
    want = {f"k{i}": i for i in range(20)} | {"k3": 300, "new": 999}
    assert got == want

    # replay is idempotent
    merge_upsert_bucketed(spark, cat_io, upd, "m", keys=["k"], n_buckets=4)
    got2 = {r["k"]: r["v"] for r in read_merged(spark, cat_io, "m").collect()}
    assert got2 == want

    # read-side partition pruning: a bucket-equality filter reads only
    # that bucket's files
    b3 = spark.createDataFrame([("k3",)], "k string").select(
        key_bucket(["k"], 4).alias("b")
    ).collect()[0]["b"]
    pruned = cat_io.read(spark, "m").filter(F.col(BUCKET_COL) == b3)
    files = pruned.inputFiles()
    assert files and all(f"{BUCKET_COL}={b3}" in f for f in files)
