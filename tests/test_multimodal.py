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


def test_wav_decode_is_real(spark):
    """Real stdlib WAV decode end-to-end through mapInPandas: known sine
    tone -> exact duration and analytic rms/peak."""
    import math

    import pandas as pd

    from dataquality_box_spark.operators.multimodal import synth_wav_bytes

    wav = synth_wav_bytes(freq_hz=440.0, ms=500, rate=8000, amp=0.5)
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "conv_id": ["c0"],
            "kind": ["audio"],
            "mime": ["audio/wav"],
            "payload": [wav],
            "width": pd.array([None], dtype="Int32"),
            "height": pd.array([None], dtype="Int32"),
            "duration_ms": pd.array([500], dtype="Int32"),
        }
    )
    df = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]["feat"]
    duration_s, n_ch, rate_n, rms, peak, zcr, mean, _std = feat
    assert duration_s == 0.5 and n_ch == 1.0
    assert abs(rate_n - 8000 / 48000) < 1e-6  # float32 round-trip
    # sine at amp 0.5: rms = amp/sqrt(2), peak ~ amp, ~2 zero crossings
    # per cycle (440 Hz over 8 kHz sampling -> 880/8000 sign flips/sample)
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
    assert 0.45 <= peak <= 0.5
    assert abs(zcr - 2 * 440 / 8000) < 0.01
    assert abs(mean) < 0.01


def test_bmp_decode_is_real(spark):
    """Real BMP decode: parse header + padded bottom-up BGR rows; channel
    means must equal the source pixel field exactly."""
    import numpy as np
    import pandas as pd

    from dataquality_box_spark.operators.multimodal import synth_bmp_bytes

    # odd width 5 -> row padding exercised (5*3=15 -> padded to 16)
    bmp = synth_bmp_bytes(width=5, height=4, seed=3)
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8).astype(np.float64)
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "conv_id": ["c0"],
            "kind": ["image"],
            "mime": ["image/bmp"],
            "payload": [bmp],
            "width": pd.array([5], dtype="Int32"),
            "height": pd.array([4], dtype="Int32"),
            "duration_ms": pd.array([None], dtype="Int32"),
        }
    )
    df = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]["feat"]
    w_n, h_n, mr, mg, mb, _sg, ming, maxg = feat
    assert (w_n, h_n) == (5 / 4096, 4 / 4096)
    for got, chan in ((mr, 0), (mg, 1), (mb, 2)):
        assert abs(got - rgb[..., chan].mean() / 255.0) < 1e-5
    gray = rgb.mean(axis=2)
    assert abs(ming - gray.min() / 255.0) < 1e-5
    assert abs(maxg - gray.max() / 255.0) < 1e-5


def test_fake_seam_still_guards_undone_codecs(spark, monkeypatch):
    """mp4 decode (the one remaining fake) raises NotImplementedError
    naming the missing dependency without DQX_FAKE_DECODE; WAV/BMP
    decode REAL regardless of the flag."""
    import pytest

    from dataquality_box_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_FAKE", False)
    with pytest.raises(NotImplementedError, match="PyAV"):
        mm.decode_payload("video/mp4", b"\x00" * 64)
    wav_feat = mm.decode_payload("audio/wav", mm.synth_wav_bytes(ms=50))
    bmp_feat = mm.decode_payload("image/bmp", mm.synth_bmp_bytes(4, 4, seed=1))
    assert len(wav_feat) == 8 and len(bmp_feat) == 8


def test_png_decode_is_real(spark):
    """Real stdlib-zlib PNG decode end-to-end through mapInPandas: the
    encoder cycles filter types per scanline (None/Sub/Up/Average/Paeth),
    and the decoded channel means must equal the source pixel field."""
    import numpy as np
    import pandas as pd

    from dataquality_box_spark.operators.multimodal import synth_png_bytes

    # height 10 -> every filter type appears twice; width 5 keeps the
    # Sub/Paeth left-recurrence non-trivial
    png = synth_png_bytes(width=5, height=10, seed=11)
    rgb = (
        np.random.default_rng(11)
        .integers(0, 256, (10, 5, 3), dtype=np.uint8)
        .astype(np.float64)
    )
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "conv_id": ["c0"],
            "kind": ["image"],
            "mime": ["image/png"],
            "payload": [png],
            "width": pd.array([5], dtype="Int32"),
            "height": pd.array([10], dtype="Int32"),
            "duration_ms": pd.array([None], dtype="Int32"),
        }
    )
    df = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]["feat"]
    w_n, h_n, mr, mg, mb, _sg, ming, maxg = feat
    assert (w_n, h_n) == (5 / 4096, 10 / 4096)
    for got, chan in ((mr, 0), (mg, 1), (mb, 2)):
        assert abs(got - rgb[..., chan].mean() / 255.0) < 1e-5
    gray = rgb.mean(axis=2)
    assert abs(ming - gray.min() / 255.0) < 1e-5
    assert abs(maxg - gray.max() / 255.0) < 1e-5


def test_png_bmp_same_pixels_same_features():
    """A PNG and a BMP holding the SAME pixel field must produce the
    identical 8-dim feature vector (shared _color_features path)."""
    import numpy as np

    from dataquality_box_spark.operators import multimodal as mm

    f_bmp = mm.decode_payload("image/bmp", mm.synth_bmp_bytes(16, 12, seed=7))
    f_png = mm.decode_payload("image/png", mm.synth_png_bytes(16, 12, seed=7))
    assert np.allclose(f_bmp, f_png, atol=1e-7)


def test_png_guards_unsupported_shapes():
    import pytest

    from dataquality_box_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png_pixels(b"nope" * 4)
    # 16-bit / palette / interlaced PNGs are a declared seam
    import struct
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)  # 16-bit depth
    bad = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", _z.compress(b"\x00" * 26))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        mm.decode_png_pixels(bad)


def test_jpeg_decode_is_real(spark):
    """Real baseline-JPEG decode end-to-end through mapInPandas: channel
    means of the decoded feature must track the encoder's source field
    within a lossy-codec tolerance (quality 90), using the codec's own
    decode as the pixel oracle (property tests bound decode error against
    the raw field separately)."""
    import numpy as np
    import pandas as pd

    from dataquality_box_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synth_jpeg_bytes,
    )

    w, h = 24, 16
    payload = synth_jpeg_bytes(w, h, seed=21, quality=90)
    rgb = decode_jpeg_pixels(payload).astype(np.float64)
    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "conv_id": ["c0"],
            "kind": ["image"],
            "mime": ["image/jpeg"],
            "payload": [payload],
            "width": pd.array([w], dtype="Int32"),
            "height": pd.array([h], dtype="Int32"),
            "duration_ms": pd.array([None], dtype="Int32"),
        }
    )
    df = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]["feat"]
    w_n, h_n, mr, mg, mb, _sg, ming, maxg = feat
    assert (w_n, h_n) == (w / 4096, h / 4096)
    for got, chan in ((mr, 0), (mg, 1), (mb, 2)):
        assert abs(got - rgb[..., chan].mean() / 255.0) < 1e-5
    gray = rgb.mean(axis=2)
    assert abs(ming - gray.min() / 255.0) < 1e-5
    assert abs(maxg - gray.max() / 255.0) < 1e-5


def test_gen_media_includes_real_jpeg(spark):
    """The synthetic media corpus now cycles JPEG in: every image/jpeg
    payload is a real decodable baseline stream, and the media feature
    operator handles the mixed corpus without the fake seam for images."""
    import numpy as np

    from dataquality_box_spark.operators import multimodal as mm

    pdf = mm.gen_media(64, seed=42)
    jp = pdf[pdf["mime"] == "image/jpeg"]
    assert len(jp) > 0
    for _, r in jp.iterrows():
        px = mm.decode_jpeg_pixels(r["payload"])
        assert px.shape[2] == 3
        f = mm.decode_payload("image/jpeg", r["payload"])
        assert len(f) == 8 and np.all(np.isfinite(f))
