"""Keep/drop decision: combine rule flags into drop_reasons + keep.

The quality-filter analog of the reference's matched_status 1/2/3/4
classification (reference: plugins/dq_lib/reconciliation.py:349-434) and
its severity routing (plugins/operators/aggregator.py:139-147): every
fired rule is RECORDED in ``drop_reasons`` (taxonomy order, deterministic)
but only reasons listed in ``cfg.dropping_reasons`` actually drop the turn.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import QualityConfig
from ..schema import DROP_REASONS


def wrong_language_flag(lang: Column, cfg: QualityConfig) -> Column:
    if not cfg.target_langs:
        return F.lit(False)
    # 'und' (undetermined) never drops — mirrors the reference's
    # null-tolerant SKIPPED semantics (rule_engine.py:187-210).
    return ~lang.isin(*cfg.target_langs) & (lang != "und")


def high_perplexity_flag(ppl: Column, cfg: QualityConfig) -> Column:
    if cfg.max_ppl <= 0:
        return F.lit(False)
    return F.coalesce(ppl > cfg.max_ppl, F.lit(False))


def with_decision(df: DataFrame, cfg: QualityConfig, flag_cols: dict[str, str]) -> DataFrame:
    """Add ``drop_reasons`` (array<string>, taxonomy-ordered) and ``keep``.

    flag_cols maps reason name -> boolean column name present in df.
    """
    reasons = [r for r in DROP_REASONS if r in flag_cols]
    # concat of per-reason 0/1-element arrays, NOT array_compact(array(
    # when(...))): array_compact is RuntimeReplaceable sugar for
    # filter(x -> isnotnull(x)) — still an interpreted NamedLambdaVariable
    # lambda that serializes across task threads, and this runs on every
    # turn of the flagship pipeline. Concat is whole-stage codegen and
    # yields the identical taxonomy-ordered fired-reason array (a NULL
    # flag takes the empty-array branch, exactly like compact dropping
    # its NULL element).
    empty = F.array().cast("array<string>")
    drop_reasons = (
        F.concat(
            *[
                F.when(F.col(flag_cols[r]), F.array(F.lit(r))).otherwise(empty)
                for r in reasons
            ]
        )
        if reasons
        else empty
    )
    dropping = set(cfg.dropping_reasons)
    drop_flags = [F.col(flag_cols[r]) for r in reasons if r in dropping]
    keep = ~F.greatest(*drop_flags, F.lit(False)) if drop_flags else F.lit(True)
    return df.withColumn("drop_reasons", drop_reasons).withColumn("keep", keep)
