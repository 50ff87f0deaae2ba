"""Strict plan-time validation of declarative pipeline YAML configs.

The reference validates every sources/*.yaml with strict pydantic models
at DAG-parse time so a malformed config is rejected before anything runs
(reference: plugins/schemas/source_config_schema.py:153-176, applied at
plugins/orchestration/dag_factory.py:103). Same stance here: the
pipeline YAML is validated with ``extra='forbid'`` pydantic models —
unknown keys, wrong types, and inconsistent combinations (e.g. both
``path`` and ``table``) fail at load time with a field-path error, never
mid-job.

Config shape:

    pipeline:
      name: transcripts_quality
      entity: transcripts
    input:
      path: /data/transcripts      # XOR table: catalog.db.tbl
      format: parquet              # parquet | iceberg
    partitioning:
      n_partitions: 64
      max_concurrent: 4
    quality:                       # optional QualityConfig overrides
      min_tokens: 3
      target_langs: [en]
    rules_dir: rules/              # optional extra declarative rules
    sinks:
      root: /out/transcripts       # TableIO root (kept + metrics tables)
    report:
      enabled: true
"""

from __future__ import annotations

from dataclasses import fields as dc_fields
from typing import Literal

from pydantic import BaseModel, ConfigDict, Field, model_validator

from ..config import DEFAULT_CONFIG, QualityConfig

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class _Strict(BaseModel):
    model_config = ConfigDict(extra="forbid", strict=False)


class PipelineMeta(_Strict):
    name: str = Field(min_length=1)
    entity: str = "transcripts"


class InputConfig(_Strict):
    path: str | None = None
    table: str | None = None
    format: Literal["parquet", "iceberg"] = "parquet"

    @model_validator(mode="after")
    def _exactly_one_source(self):
        if bool(self.path) == bool(self.table):
            raise ValueError("input requires exactly one of 'path' or 'table'")
        if self.format == "iceberg" and not self.table:
            raise ValueError(
                "format 'iceberg' requires a catalog 'table' (a bare path is parquet)"
            )
        return self


class PartitioningConfig(_Strict):
    n_partitions: int = Field(default=8, ge=1)
    max_concurrent: int = Field(default=4, ge=1)


class QualityOverrides(_Strict):
    """Optional overrides; field names must match QualityConfig."""

    min_tokens: int | None = Field(default=None, ge=0)
    max_chars: int | None = Field(default=None, ge=1)
    repetition_distinct_ratio: float | None = Field(default=None, ge=0, le=1)
    repetition_min_tokens: int | None = Field(default=None, ge=0)
    max_symbol_ratio: float | None = Field(default=None, ge=0, le=1)
    symbol_min_chars: int | None = Field(default=None, ge=0)
    target_langs: list[str] | None = None
    max_ppl: float | None = None
    enforce_role_alternation: bool | None = None
    enforce_tool_chain: bool | None = None
    enforce_ts_order: bool | None = None
    conversation_bucket_turns: int | None = Field(default=None, ge=2)
    dropping_reasons: list[str] | None = None

    def to_quality_config(self) -> QualityConfig:
        overrides = {
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in self.model_dump().items()
            if v is not None
        }
        base = {f.name: getattr(DEFAULT_CONFIG, f.name) for f in dc_fields(QualityConfig)}
        base.update(overrides)
        return QualityConfig(**base)


class SinksConfig(_Strict):
    root: str = Field(min_length=1)
    # None -> resolve through the per-stage env chain
    # (sources/tableio.stage_compression); an explicit YAML value wins
    compression: str | None = None


class ReportConfig(_Strict):
    enabled: bool = True


class PipelineYAMLConfig(_Strict):
    pipeline: PipelineMeta
    input: InputConfig
    sinks: SinksConfig
    partitioning: PartitioningConfig = Field(default_factory=PartitioningConfig)
    quality: QualityOverrides = Field(default_factory=QualityOverrides)
    rules_dir: str | None = None
    report: ReportConfig = Field(default_factory=ReportConfig)


def load_pipeline_config(path: str) -> PipelineYAMLConfig:
    """Parse + strictly validate a pipeline YAML; raises on any unknown
    key, wrong type, or inconsistent combination (plan-time gate)."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("pyyaml unavailable")
    with open(path) as f:
        raw = yaml.safe_load(f)
    return PipelineYAMLConfig.model_validate(raw)


def run_from_config(spark, cfg: PipelineYAMLConfig):
    """Execute the declared pipeline: read input -> resumable
    filter+scrub over n_partitions -> kept table at sinks.root; then,
    when declared, evaluate ``rules_dir`` rules over the INPUT entity
    frame through the governance lifecycle (alerts/assets + per-rule
    report, gated by ``report.enabled``). Every accepted key is honored —
    the strict-validation promise would be hollow if declared fields
    were silently dropped."""
    from .partitioned import run_resumable

    if cfg.input.table:
        df = spark.read.table(cfg.input.table)
    else:
        df = spark.read.parquet(cfg.input.path)
    kept = run_resumable(
        spark,
        df,
        cfg.sinks.root,
        cfg=cfg.quality.to_quality_config(),
        n_partitions=cfg.partitioning.n_partitions,
        max_concurrent=cfg.partitioning.max_concurrent,
        compression=cfg.sinks.compression,
    )
    if cfg.rules_dir:
        from ..operators.rules import load_rules
        from ..sources.tableio import TableIO
        from .governance import run_governance

        # pipeline.entity scopes which rules apply — the RuleScanner's
        # target_entity filter (reference: rule_scanner.py:103-124)
        rules = [
            r for r in load_rules(cfg.rules_dir) if r.entity == cfg.pipeline.entity
        ]
        from ..sources.tableio import stage_compression

        io = TableIO(
            cfg.sinks.root,
            compression=cfg.sinks.compression or stage_compression("RESULT"),
        )
        # rules evaluate over the INPUT entity frame (pre-filter), like
        # the reference's rule engine over entity tables — the kept output
        # no longer carries the raw text the quality rules inspect, and
        # the violations a rule should alert on are exactly the rows the
        # filter dropped. report.enabled only gates the report tables;
        # alert/asset emission always runs.
        run_governance(
            spark, df, rules, io,
            batch_id=cfg.pipeline.name, report=cfg.report.enabled,
        )
    return kept
