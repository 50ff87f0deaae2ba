"""Multimodal plumbing tests (decode stubbed, Spark plumbing real)."""

from __future__ import annotations

import hashlib

from dataquality_box_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    gen_media,
    payload_integrity,
)


def _media_df(spark):
    pdf = gen_media(200, seed=7)
    pdf["width"] = pdf["width"].astype("Int32")
    pdf["height"] = pdf["height"].astype("Int32")
    pdf["duration_ms"] = pdf["duration_ms"].astype("Int32")
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA), pdf


def test_feature_extraction_roundtrip(spark):
    df, pdf = _media_df(spark)
    feats = extract_features(df).toPandas().set_index("media_id").sort_index()
    assert len(feats) == 200
    # deterministic fake features: recompute one row independently
    b = pdf.loc[5, "payload"]
    assert feats.loc[5, "payload_sha1"] == hashlib.sha1(b).hexdigest()
    assert feats.loc[5, "n_bytes"] == len(b)
    assert len(feats.loc[5, "feat"]) == 8
    assert 0.0 <= feats.loc[5, "entropy"] <= 8.0


def test_frame_sample_plan(spark):
    df, pdf = _media_df(spark)
    plan = frame_sample_plan(df, every_ms=1000).toPandas()
    vids = pdf[pdf["kind"] == "video"]
    assert set(plan["media_id"]) == set(vids["media_id"])
    g = plan.groupby("media_id")["frame_idx"].agg(["min", "max", "count"])
    assert (g["min"] == 0).all()
    assert (g["count"] == g["max"] + 1).all()
    assert (plan["frame_ms"] == plan["frame_idx"] * 1000).all()


def test_payload_integrity_jvm_side(spark):
    df, pdf = _media_df(spark)
    stats = payload_integrity(df).toPandas().set_index("kind")
    for kind in ("image", "audio", "video"):
        sub = pdf[pdf["kind"] == kind]
        assert stats.loc[kind, "n"] == len(sub)
        assert stats.loc[kind, "total_bytes"] == sub["payload"].map(len).sum()
