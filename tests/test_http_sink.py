"""HTTP packing sink (S10): executor-side batching, retry, failure.

The fake transports write each received batch to a file (executor Python
workers are separate processes — an in-memory list would not propagate),
and are defined INSIDE the tests so cloudpickle ships them by value (the
test module itself is not importable from executor workers).
"""

from __future__ import annotations

import json
import os

import pytest

from dataquality_box_spark.sources.http_sink import post_partitions


def _read_batches(outdir: str) -> list[list[dict]]:
    out = []
    for name in os.listdir(outdir):
        with open(os.path.join(outdir, name)) as f:
            out.append(json.load(f))
    return out


def test_batched_delivery_every_row_once(spark, tmp_path):
    outdir = str(tmp_path / "rx")
    os.makedirs(outdir)

    def transport(batch):
        import json as _json
        import os as _os
        import uuid as _uuid

        path = _os.path.join(outdir, f"b_{_uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            _json.dump(batch, f)

    df = spark.range(230).selectExpr("id AS asset_id", "id * 2 AS size")
    stats = post_partitions(df.repartition(4), transport, batch_size=50)
    batches = _read_batches(outdir)
    assert stats["rows"] == 230
    assert stats["batches"] == len(batches)
    got = sorted(r["asset_id"] for b in batches for r in b)
    assert got == list(range(230))  # every row delivered exactly once
    assert max(len(b) for b in batches) <= 50  # batch cap respected


def test_transient_failure_retried(spark, tmp_path):
    outdir = str(tmp_path / "rx")
    os.makedirs(outdir)
    marker = str(tmp_path / "fail_once")

    def flaky(batch):
        import json as _json
        import os as _os
        import uuid as _uuid

        if not _os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("failed once")
            raise ConnectionError("transient")
        path = _os.path.join(outdir, f"b_{_uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            _json.dump(batch, f)

    df = spark.range(5).selectExpr("id AS asset_id").coalesce(1)
    stats = post_partitions(df, flaky, batch_size=50, backoff_base_sec=0.01)
    assert stats["rows"] == 5
    got = sorted(r["asset_id"] for b in _read_batches(outdir) for r in b)
    assert got == [0, 1, 2, 3, 4]  # delivered after the retry


def test_exhausted_retries_fail_the_job(spark):
    def always_fail(batch):
        raise ConnectionError("receiver down")

    df = spark.range(3).selectExpr("id AS asset_id").coalesce(1)
    with pytest.raises(Exception, match="receiver down|ConnectionError"):
        post_partitions(df, always_fail, max_retries=1, backoff_base_sec=0.01)
