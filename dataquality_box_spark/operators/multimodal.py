"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real and tested: schema, deterministic synthetic
payload generation, Arrow-batched ``mapInPandas`` operators with correct
batch shapes and partitioning. The actual codec work (JPEG decode, audio
resample, video frame extraction) needs libraries not present in this
container, so each decode step is STUBBED: behind ``DQX_FAKE_DECODE=1``
(default in tests) a deterministic fake decoder derives features from the
payload bytes; without it the operator raises NotImplementedError naming
the missing dependency. Swapping in Pillow/librosa/pyav changes only the
inner function — the Spark plan, schema and batching stay identical.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, payload_sha1 string, n_bytes long, "
    "entropy double, feat array<float>"
)

_FAKE = os.environ.get("DQX_FAKE_DECODE", "1") == "1"


def gen_media(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media table (payload = seeded pseudo-bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[rng.integers(0, 3, n)]
    mimes = {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}
    payloads = [rng.integers(0, 256, int(rng.integers(256, 4096))).astype(np.uint8).tobytes()
                for _ in range(n)]
    return pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "conv_id": [f"conv_{i % 97:08d}" for i in range(n)],
            "kind": kinds,
            "mime": [mimes[k] for k in kinds],
            "payload": payloads,
            "width": np.where(kinds == "image", rng.integers(64, 2048, n), None),
            "height": np.where(kinds == "image", rng.integers(64, 2048, n), None),
            "duration_ms": np.where(kinds != "image", rng.integers(500, 60000, n), None),
        }
    )


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation would be PIL.Image.open(BytesIO(payload)).

    The deterministic fake derives an 8-dim feature from payload bytes so
    tests exercise the full Arrow round-trip with stable values.
    """
    if not _FAKE:
        raise NotImplementedError("image decode requires Pillow (not in container)")
    h = hashlib.sha1(payload).digest()
    return (np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0)


def _entropy(payload: bytes) -> float:
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(payload)
    return float(-(p * np.log2(p)).sum())


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: batched, executor-local decode."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha1": payloads.map(lambda b: hashlib.sha1(b).hexdigest()),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "entropy": payloads.map(_entropy),
                    "feat": payloads.map(lambda b: _decode_image(b).tolist()),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (explode on a
    JVM-side sequence — the decode itself would run in a later mapInPandas).
    """
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select("media_id", "conv_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ms"))
    )


def payload_integrity(df: DataFrame) -> DataFrame:
    """JVM-side integrity stats: crc + size per kind (no Python)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.countDistinct(F.crc32("payload")).alias("distinct_payloads"),
    )


_ = zlib  # reserved for real codecs; keeps import explicit
