"""Defensive-normalization contract tests (functions/normalize.py),
mirroring the reference's dirty-input behaviors: dirty cast -> null,
case/underscore-insensitive renames, empty input -> typed empty output,
missing columns added as typed nulls."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataquality_box_spark.functions.normalize import (
    conform,
    ensure_columns,
    permissive_cast,
    rename_candidates,
    typed_empty,
)

SCHEMA = T.StructType(
    [
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("cycle_id", T.LongType()),
        T.StructField("start_time", T.TimestampType()),
        T.StructField("box_count", T.LongType()),
    ]
)


def test_rename_case_underscore_insensitive(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"VehicleID": ["v1"], "Cycle_Id": [1], "extra": ["x"]})
    )
    out = rename_candidates(
        df, {"vehicle_id": ["vid"], "cycle_id": [], "box_count": ["boxes"]}
    )
    assert set(out.columns) == {"vehicle_id", "cycle_id", "extra"}


def test_rename_prefers_existing_target_and_first_candidate(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"vehicle_id": ["v1"], "vid": ["v2"]})
    )
    out = rename_candidates(df, {"vehicle_id": ["vid"]})
    assert out.columns == ["vehicle_id", "vid"]  # target kept, no rename


def test_permissive_cast_dirty_to_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"cycle_id": ["7", "oops", None], "keep": ["a", "b", "c"]})
    )
    out = permissive_cast(df, {"cycle_id": "long", "absent_col": "int"}).toPandas()
    assert list(out["cycle_id"].fillna(-1)) == [7, -1, -1]  # dirty -> null
    assert list(out["keep"]) == ["a", "b", "c"]


def test_typed_empty_joins_cleanly(spark):
    empty = typed_empty(spark, SCHEMA)
    other = spark.createDataFrame(pd.DataFrame({"vehicle_id": ["v1"], "x": [1]}))
    joined = other.join(empty.select("vehicle_id", "cycle_id"), "vehicle_id", "left")
    assert joined.count() == 1
    assert joined.collect()[0]["cycle_id"] is None


def test_ensure_columns_adds_typed_nulls(spark):
    df = spark.createDataFrame(pd.DataFrame({"vehicle_id": ["v1"]}))
    out = ensure_columns(df, SCHEMA)
    assert set(out.columns) == {f.name for f in SCHEMA.fields}
    assert dict(out.dtypes)["box_count"] == "bigint"


def test_conform_full_pipeline_and_empty_input(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "Vehicle_ID": ["v1", "v2"],
                "CYCLEID": ["3", "bad"],
                "StartTime": ["2024-01-01 00:00:00", "not a ts"],
            }
        )
    )
    out = conform(df, SCHEMA, {"cycle_id": ["cycleid"], "start_time": ["starttime"]})
    assert out.columns == [f.name for f in SCHEMA.fields]
    rows = out.orderBy("vehicle_id").collect()
    assert rows[0]["cycle_id"] == 3 and rows[1]["cycle_id"] is None
    assert rows[0]["start_time"] is not None and rows[1]["start_time"] is None
    assert rows[0]["box_count"] is None  # absent -> typed null
    # empty input conforms to a typed empty output
    empty_out = conform(df.limit(0), SCHEMA)
    assert empty_out.count() == 0
    assert empty_out.schema == SCHEMA


def test_key_variant_expansion(spark):
    from dataquality_box_spark.functions.keys import (
        canonical_key_variants,
        expand_key_variants,
    )

    df = spark.createDataFrame(
        [("AT01",), ("at1",), ("1",), ("AT001",), ("XX-7-Y",), ("junk",), ("  AT02 ",)],
        "k string",
    )
    got = {
        r["k"]: r["v"]
        for r in df.select("k", canonical_key_variants(F.col("k")).alias("v")).collect()
    }
    # the digit-bearing forms share the canonical AT001 variant (zfill
    # never truncates, so leading-zero digits keep only the long form)
    assert got["AT01"] == got["at1"] == got["1"] == ["AT001", "AT01"]
    assert got["AT001"] == ["AT001"]
    assert set(got["AT001"]) & set(got["AT01"])  # still match via intersection
    assert got["XX-7-Y"] == ["AT007", "AT07"]  # digits extracted, junk not kept
    assert got["junk"] == ["JUNK"]  # no digits -> passthrough, never prefixed
    assert got["  AT02 "] == ["AT002", "AT02"]
    # exploded shape: one row per variant
    assert expand_key_variants(df, "k").count() == 12


def test_real_missing_clipped_window(spark):
    from datetime import datetime

    from dataquality_box_spark.operators.recon_metrics import real_missing

    rows = [
        (1, False, datetime(2026, 8, 16, 10, 0)),  # unmatched, in window -> real
        (2, False, datetime(2026, 8, 16, 23, 0)),  # unmatched, outside -> noise
        (3, True, datetime(2026, 8, 16, 10, 0)),  # matched -> not missing
    ]
    df = spark.createDataFrame(rows, "id long, matched boolean, ts timestamp")
    lo, hi = datetime(2026, 8, 16, 8, 0), datetime(2026, 8, 16, 12, 0)
    got = {
        r["id"]: r["rm"]
        for r in df.withColumn("rm", real_missing("matched", "ts", lo, hi)).collect()
    }
    assert got == {1: True, 2: False, 3: False}
    # unknown window -> nothing flagged
    none = df.withColumn("rm", real_missing("matched", "ts", None, hi))
    assert all(not r["rm"] for r in none.collect())
