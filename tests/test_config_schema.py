"""Strict pipeline-config validation tests (plans/config_schema.py),
mirroring the reference's pydantic-at-parse-time gate: unknown keys,
wrong types, and inconsistent combinations are rejected before any job
runs; a valid config executes end-to-end."""

from __future__ import annotations

import pytest
import yaml
from pydantic import ValidationError

from dataquality_box_spark.plans.config_schema import (
    load_pipeline_config,
    run_from_config,
)

VALID = {
    "pipeline": {"name": "tq", "entity": "transcripts"},
    "input": {"path": "/tmp/in", "format": "parquet"},
    "sinks": {"root": "/tmp/out"},
    "partitioning": {"n_partitions": 4, "max_concurrent": 2},
    "quality": {"min_tokens": 2, "target_langs": ["en", "fr"]},
}


def _write(tmp_path, cfg):
    p = tmp_path / "pipe.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_valid_config_loads_and_builds_quality(tmp_path):
    cfg = load_pipeline_config(_write(tmp_path, VALID))
    assert cfg.pipeline.name == "tq"
    q = cfg.quality.to_quality_config()
    assert q.min_tokens == 2
    assert q.target_langs == ("en", "fr")
    assert q.max_chars == 8192  # unset override keeps the default


def test_unknown_key_rejected(tmp_path):
    bad = {**VALID, "tyop": 1}
    with pytest.raises(ValidationError, match="tyop"):
        load_pipeline_config(_write(tmp_path, bad))
    nested = {**VALID, "partitioning": {"n_partitions": 4, "shards": 2}}
    with pytest.raises(ValidationError, match="shards"):
        load_pipeline_config(_write(tmp_path, nested))


def test_input_requires_exactly_one_source(tmp_path):
    both = {**VALID, "input": {"path": "/a", "table": "t", "format": "parquet"}}
    with pytest.raises(ValidationError, match="exactly one"):
        load_pipeline_config(_write(tmp_path, both))
    neither = {**VALID, "input": {"format": "parquet"}}
    with pytest.raises(ValidationError, match="exactly one"):
        load_pipeline_config(_write(tmp_path, neither))


def test_bounds_and_literals_enforced(tmp_path):
    bad_n = {**VALID, "partitioning": {"n_partitions": 0}}
    with pytest.raises(ValidationError):
        load_pipeline_config(_write(tmp_path, bad_n))
    bad_fmt = {**VALID, "input": {"path": "/a", "format": "csvz"}}
    with pytest.raises(ValidationError):
        load_pipeline_config(_write(tmp_path, bad_fmt))


def test_run_from_config_end_to_end(spark, transcripts_df, tmp_path):
    src = str(tmp_path / "in.parquet")
    transcripts_df.write.mode("overwrite").parquet(src)
    cfg = load_pipeline_config(
        _write(
            tmp_path,
            {
                "pipeline": {"name": "tq"},
                "input": {"path": src},
                "sinks": {"root": str(tmp_path / "out")},
                "partitioning": {"n_partitions": 2, "max_concurrent": 2},
            },
        )
    )
    kept = run_from_config(spark, cfg)
    assert 0 < kept.count() < transcripts_df.count()


def test_iceberg_format_requires_table(tmp_path):
    bad = {**VALID, "input": {"path": "/a", "format": "iceberg"}}
    with pytest.raises(ValidationError, match="iceberg"):
        load_pipeline_config(_write(tmp_path, bad))


def test_run_from_config_honors_rules_dir_and_report(spark, transcripts_df, tmp_path):
    import os

    src = str(tmp_path / "in.parquet")
    transcripts_df.write.mode("overwrite").parquet(src)
    rules_dir = os.path.join(os.path.dirname(__file__), "..", "rules")
    root = str(tmp_path / "out")
    cfg = load_pipeline_config(
        _write(
            tmp_path,
            {
                "pipeline": {"name": "tq"},
                "input": {"path": src},
                "sinks": {"root": root, "compression": "snappy"},
                "partitioning": {"n_partitions": 2, "max_concurrent": 2},
                "rules_dir": rules_dir,
                "report": {"enabled": True},
            },
        )
    )
    kept = run_from_config(spark, cfg)
    assert kept.count() > 0
    # every accepted key is honored: declared rules ran and reported
    for table in ("rule_results", "run_summary"):
        assert os.path.isdir(os.path.join(root, table)), table
    rr = spark.read.parquet(os.path.join(root, "rule_results"))
    assert rr.filter("batch_id = 'tq'").count() > 0
    # rules evaluate over the INPUT entity (which carries raw text) —
    # most fixture rules must actually run, not skip on missing columns
    assert rr.filter("status = 'SUCCESS'").count() >= 8


def test_conversation_bucket_knob_flows_to_quality_config(tmp_path):
    cfg = load_pipeline_config(
        _write(
            tmp_path,
            {**VALID, "quality": {"conversation_bucket_turns": 512}},
        )
    )
    assert cfg.quality.to_quality_config().conversation_bucket_turns == 512
    with pytest.raises(ValidationError):
        load_pipeline_config(
            _write(
                tmp_path,
                {**VALID, "quality": {"conversation_bucket_turns": 1}},
            )
        )
