"""Funnel extraction + merge sink tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataquality_box_spark.sources.funnel import (
    Extraction,
    FunnelConfigError,
    run_funnel,
    semi_join_pushdown,
    toposort,
)
from dataquality_box_spark.sources.merge import (
    insert_missing,
    latest_wins_dedup,
    merge_upsert,
)
from dataquality_box_spark.sources.tableio import TableIO


def test_toposort_orders_and_detects_cycles():
    a = Extraction("a", lambda s, u: None)
    b = Extraction("b", lambda s, u: None, depends=("a",))
    c = Extraction("c", lambda s, u: None, depends=("a", "b"))
    assert [e.name for e in toposort([c, b, a])] == ["a", "b", "c"]
    bad = Extraction("x", lambda s, u: None, depends=("y",))
    with pytest.raises(FunnelConfigError):
        toposort([bad])
    x = Extraction("x", lambda s, u: None, depends=("y",))
    y = Extraction("y", lambda s, u: None, depends=("x",))
    with pytest.raises(FunnelConfigError, match="cycle"):
        toposort([x, y])


def test_funnel_semi_join_pushdown(spark, transcripts_df):
    exts = [
        Extraction(
            "long_convs",
            lambda s, u: transcripts_df.groupBy("conv_id")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= 30),
        ),
        Extraction(
            "long_conv_turns",
            lambda s, u: semi_join_pushdown(transcripts_df, u["long_convs"], "conv_id"),
            depends=("long_convs",),
        ),
    ]
    frames = run_funnel(spark, exts)
    picked = frames["long_conv_turns"]
    sizes = picked.groupBy("conv_id").count().toPandas()
    assert (sizes["count"] >= 30).all()
    assert picked.count() < transcripts_df.count()


def test_merge_upsert_idempotent(spark, tmp_path):
    io = TableIO(str(tmp_path))
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"], "ver": [1, 1, 1]})
    )
    merge_upsert(spark, io, base, "t", ["k"])
    upd = spark.createDataFrame(
        pd.DataFrame({"k": [2, 4], "v": ["B", "d"], "ver": [2, 1]})
    )
    merge_upsert(spark, io, upd, "t", ["k"])
    out = spark.read.parquet(str(tmp_path / "t")).toPandas().set_index("k").sort_index()
    assert out.loc[2, "v"] == "B" and out.loc[2, "ver"] == 2
    assert list(out.index) == [1, 2, 3, 4]
    # idempotent: same merge again -> same table
    merge_upsert(spark, io, upd, "t", ["k"])
    out2 = spark.read.parquet(str(tmp_path / "t")).toPandas().set_index("k").sort_index()
    pd.testing.assert_frame_equal(out.sort_index(axis=1), out2.sort_index(axis=1))


def test_insert_missing_dedups(spark, tmp_path):
    io = TableIO(str(tmp_path))
    first = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    assert insert_missing(spark, io, first, "q", ["k"]) == 2
    again = spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": ["x", "c"]}))
    assert insert_missing(spark, io, again, "q", ["k"]) == 1  # only k=3
    out = spark.read.parquet(str(tmp_path / "q")).toPandas().set_index("k").sort_index()
    assert out.loc[2, "v"] == "b"  # original survived
    assert list(out.index) == [1, 2, 3]


def test_latest_wins_dedup(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "v": ["old", "new", "x"], "ver": [1, 2, 9]})
    )
    out = latest_wins_dedup(df, ["k"], "ver").toPandas().set_index("k").sort_index()
    assert out.loc[1, "v"] == "new" and out.loc[2, "v"] == "x"
