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


def test_empty_extraction_diagnostics(spark):
    """Reference contract (data_quality_runner.py:209-229): an empty
    extraction triggers a raw-source diagnosis — row count, raw ts
    bounds, parse-failure counts — instead of silent emptiness."""
    import pandas as pd

    from dataquality_box_spark.sources.diagnostics import diagnose_if_empty

    raw = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3],
                "ts_raw": ["2024-01-01 00:00:00", "garbage", "2024-01-03 00:00:00"],
            }
        )
    )
    # filter matches nothing (all parses outside the window / dirty)
    extracted = raw.filter(
        F.col("ts_raw").try_cast("timestamp") >= "2030-01-01"
    )
    diag = diagnose_if_empty(
        extracted, raw, ts_col="ts_raw", parse_cols={"ts_raw": "timestamp"}
    )
    assert diag is not None
    assert diag["n_rows"] == 3
    assert diag["ts_raw_parse_nulls"] == 1  # 'garbage'
    assert diag["ts_raw_min_raw"].startswith("2024-01-01")
    # non-empty extraction -> no diagnosis
    ok = raw.filter(F.col("id") == 1)
    assert diagnose_if_empty(ok, raw) is None


def test_stage_compression_resolution_chain():
    from dataquality_box_spark.sources.tableio import for_stage, stage_compression

    # per-stage env var wins over global over default
    env = {"PARQUET_COMPRESSION_RESULT": "zstd:5", "PARQUET_COMPRESSION": "snappy"}
    assert stage_compression("RESULT", env) == "zstd:5"
    assert stage_compression("RAW", env) == "snappy"
    assert stage_compression("RAW", {}) == "zstd"
    assert stage_compression("UNKNOWN_STAGE", {}) == "zstd"
    io = for_stage("/tmp/x", "RESULT", env=env)
    assert (io.compression, io.codec_level) == ("zstd", 5)


def test_codec_level_suffix_maps_to_parquet_level_option(spark, tmp_path):
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path), compression="zstd:5")
    assert io.compression == "zstd" and io.codec_level == 5
    assert io.write_options() == {
        "compression": "zstd",
        "parquet.compression.codec.zstd.level": "5",
    }
    # and the writer actually accepts it
    df = spark.range(10)
    io.overwrite_partition(df.withColumn("p", df.id % 2), "t", "p", 0)
    assert io.read(spark, "t").count() > 0


def test_bucketed_merge_migrates_legacy_unbucketed_table(spark, tmp_path):
    """A table created by plain merge_upsert (flat, no bucket col) must
    merge cleanly through merge_upsert_bucketed: one-time full rewrite
    into the bucketed layout, no stale flat files, rows correct."""
    import os

    from dataquality_box_spark.sources.merge import (
        BUCKET_COL,
        merge_upsert,
        merge_upsert_bucketed,
        read_merged,
    )

    io = TableIO(str(tmp_path))
    base = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    merge_upsert(spark, io, base, "t", ["k"])  # legacy flat layout

    upd = spark.createDataFrame([("b", 20), ("c", 3)], "k string, v int")
    merge_upsert_bucketed(spark, io, upd, "t", keys=["k"], n_buckets=4)

    got = {r["k"]: r["v"] for r in read_merged(spark, io, "t").collect()}
    assert got == {"a": 1, "b": 20, "c": 3}
    # layout is now bucketed; no flat legacy part files remain at root
    entries = os.listdir(os.path.join(str(tmp_path), "t"))
    assert any(e.startswith(f"{BUCKET_COL}=") for e in entries)
    assert not any(e.startswith("part-") for e in entries)
    # and later merges are partition-bounded as usual
    merge_upsert_bucketed(
        spark, io, spark.createDataFrame([("c", 30)], "k string, v int"),
        "t", keys=["k"], n_buckets=4,
    )
    got = {r["k"]: r["v"] for r in read_merged(spark, io, "t").collect()}
    assert got == {"a": 1, "b": 20, "c": 30}


def test_insert_missing_bloomed_parity_and_routing(spark, tmp_path):
    from pyspark.sql import functions as F

    from dataquality_box_spark.sources.merge import (
        _bloom_table,
        insert_missing_bloomed,
    )

    io = TableIO(str(tmp_path))
    first = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    assert insert_missing_bloomed(spark, io, first, "q", ["k"]) == 2
    # overlap batch: same verdicts as plain insert_missing
    again = spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": ["x", "c"]}))
    assert insert_missing_bloomed(spark, io, again, "q", ["k"]) == 1
    out = spark.read.parquet(str(tmp_path / "q")).toPandas().set_index("k").sort_index()
    assert out.loc[2, "v"] == "b"  # original survived
    assert list(out.index) == [1, 2, 3]
    # idempotent replay: nothing inserted, table unchanged
    assert insert_missing_bloomed(spark, io, again, "q", ["k"]) == 0
    # the filter table exists and is position-bounded
    bits = spark.read.parquet(str(tmp_path / _bloom_table("q")))
    assert bits.columns == ["pos"]
    assert bits.count() == bits.distinct().count()


def test_insert_missing_bloomed_bootstraps_over_existing_target(spark, tmp_path):
    from dataquality_box_spark.sources.merge import (
        insert_missing,
        insert_missing_bloomed,
    )

    io = TableIO(str(tmp_path))
    # target created WITHOUT a filter (plain route)
    first = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    assert insert_missing(spark, io, first, "q", ["k"]) == 2
    # bloomed call must bootstrap bits from existing keys: k=1 re-delivery
    # is NOT "definitely new" even though no filter existed at insert time
    again = spark.createDataFrame(pd.DataFrame({"k": [1, 9], "v": ["dup", "z"]}))
    assert insert_missing_bloomed(spark, io, again, "q", ["k"]) == 1
    out = spark.read.parquet(str(tmp_path / "q")).toPandas().set_index("k").sort_index()
    assert out.loc[1, "v"] == "a" and list(out.index) == [1, 2, 9]


def test_insert_missing_bloomed_crash_between_bits_and_append_is_safe(
    spark, tmp_path
):
    from dataquality_box_spark.operators.dedup import _bloom_probes
    from dataquality_box_spark.sources.merge import (
        BLOOM_K,
        BLOOM_M,
        _bloom_table,
        insert_missing_bloomed,
        merge_upsert,
    )
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path))
    base = spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["a"]}))
    assert insert_missing_bloomed(spark, io, base, "q", ["k"]) == 1
    # simulate the crash window: key 7's bits merged, data never appended
    orphan = spark.createDataFrame(pd.DataFrame({"k": [7]})).select(
        F.col("k").cast("string").alias("__kj")
    )
    merge_upsert(
        spark, io,
        _bloom_probes(orphan, BLOOM_M, BLOOM_K, "bl", "__kj").select("pos").distinct(),
        _bloom_table("q"), keys=["pos"],
    )
    # replay delivers key 7: maybe-seen routes it to the exact check,
    # which admits it (absent from the target) — no loss, no duplicate
    replay = spark.createDataFrame(pd.DataFrame({"k": [7], "v": ["g"]}))
    assert insert_missing_bloomed(spark, io, replay, "q", ["k"]) == 1
    out = spark.read.parquet(str(tmp_path / "q")).toPandas().set_index("k").sort_index()
    assert list(out.index) == [1, 7]


def test_insert_missing_bloomed_pins_params_and_blocks_plain_route(spark, tmp_path):
    import pytest

    from dataquality_box_spark.sources.merge import (
        insert_missing,
        insert_missing_bloomed,
    )

    io = TableIO(str(tmp_path))
    first = spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["a"]}))
    assert insert_missing_bloomed(spark, io, first, "q", ["k"], m=4096, k=3) == 1
    # different (m, k) would probe past the stored bits: loud, not silent
    with pytest.raises(ValueError, match="m=4096"):
        insert_missing_bloomed(spark, io, first, "q", ["k"], m=1 << 20, k=3)
    # plain insert_missing must refuse a bloom-tracked target (it would
    # append without setting bits and break the superset invariant)
    with pytest.raises(ValueError, match="bloom-tracked"):
        insert_missing(spark, io, first, "q", ["k"])


def test_insert_missing_bloomed_saturation_rebuild(spark, tmp_path):
    """Saturation contract: once the estimated FPR crosses the rebuild
    bound the filter is rebuilt at >=4x capacity from the target's exact
    keys with a loud warning; routing stays exact throughout, the caller
    keeps passing the ORIGINAL m, and a fresh-key probe against the
    rebuilt bits is still 'definitely new'."""
    import warnings as w

    from dataquality_box_spark.operators.dedup import bloom_probe
    from dataquality_box_spark.sources.merge import (
        _bloom_fpr,
        _bloom_table,
        _read_bloom_pin,
        insert_missing_bloomed,
        read_merged,
    )
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path))
    m0, k0 = 64, 3  # tiny capacity so a few dozen keys saturate it
    first = spark.createDataFrame(
        pd.DataFrame({"k": list(range(40)), "v": ["a"] * 40})
    )
    assert insert_missing_bloomed(spark, io, first, "q", ["k"], m=m0, k=k0) == 40
    pm, pk, n = _read_bloom_pin(io, _bloom_table("q"))
    assert (pm, pk, n) == (m0, k0, 40)
    assert _bloom_fpr(n, pm, pk) > 0.05  # saturated: next call must rebuild

    second = spark.createDataFrame(
        pd.DataFrame({"k": [39, 100, 101], "v": ["dup", "b", "b"]})
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        # caller still passes the ORIGINAL m — growth is transparent
        assert insert_missing_bloomed(spark, io, second, "q", ["k"], m=m0, k=k0) == 2
    assert any("saturated" in str(c.message) for c in caught)
    pm2, pk2, n2 = _read_bloom_pin(io, _bloom_table("q"))
    assert pk2 == k0 and pm2 >= 4 * m0 and pm2 % m0 == 0
    assert n2 == 42  # exact target count at rebuild (40) + 2 fresh keys
    assert _bloom_fpr(n2, pm2, pk2) <= 0.05  # contract restored
    # routing stayed exact: original k=39 row survived, no duplicates
    out = spark.read.parquet(str(tmp_path / "q")).toPandas()
    assert len(out) == 42 and out.loc[out.k == 39, "v"].tolist() == ["a"]
    # steady state: a genuinely fresh key probes 'definitely new' against
    # the rebuilt bits at the grown m
    bits = read_merged(spark, io, _bloom_table("q"))
    probe = spark.createDataFrame(pd.DataFrame({"__kj": ["999999"]}))
    verdict = bloom_probe(probe, bits, pm2, pk2, id_col="__kj").collect()
    assert verdict[0]["maybe_seen"] is False
    # replay of the grown filter is idempotent and accepted at original m
    assert insert_missing_bloomed(spark, io, second, "q", ["k"], m=m0, k=k0) == 0


def test_bucketed_merge_replace_keys_union_safety(spark, tmp_path):
    """An update key MISSING from replace_keys must still merge safely:
    its bucket's existing rows survive (the union guard reads the bucket
    before the dynamic overwrite rewrites it)."""
    from dataquality_box_spark.sources.merge import (
        merge_upsert_bucketed,
        read_merged,
    )
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path / "rk"))
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "doc_id long, payload string"
    )
    merge_upsert_bucketed(spark, io, base, "t", keys=["doc_id"], n_buckets=2)

    # update doc 3 but name only doc 5 in replace_keys: doc 5's rows
    # are deleted, doc 3 is replaced, everything else survives
    up = spark.createDataFrame([(3, "NEW")], "doc_id long, payload string")
    rk = spark.createDataFrame([(5,)], "doc_id long")
    merge_upsert_bucketed(
        spark, io, up, "t", keys=["doc_id"], n_buckets=2, replace_keys=rk
    )
    got = {r["doc_id"]: r["payload"] for r in read_merged(spark, io, "t").collect()}
    assert got == {0: "v0", 1: "v1", 2: "v2", 3: "NEW", 4: "v4", 6: "v6", 7: "v7"}
