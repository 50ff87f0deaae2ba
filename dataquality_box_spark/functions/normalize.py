"""Defensive schema normalization: renames, permissive casts, typed empties.

The reference never trusts upstream schemas: it renames columns via
candidate lists with case/underscore-insensitive matching
(reference: plugins/services/data_quality_runner.py:352-384, 972-1017),
casts with ``strict=False`` so dirty values become null instead of
erroring (data_quality_runner.py:240-268), constructs typed empty frames
so joins on empty extractions don't fail (plugins/dq_lib/
reconciliation.py:29-44), and defensively adds missing columns
(reconciliation.py:55-57). Same contract here on Spark:

  * ``rename_candidates``  — declarative {target: [candidates]} mapping
  * ``permissive_cast``    — ``try_cast`` semantics (null on failure,
                             independent of the session's ANSI mode)
  * ``typed_empty``        — empty DataFrame with an exact StructType
  * ``ensure_columns``     — add missing columns as typed nulls
  * ``conform``            — all of the above to a target schema

Everything is a plan-time projection — no data movement, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_key(name: str) -> str:
    return name.lower().replace("_", "")


def rename_candidates(df: DataFrame, mapping: dict[str, list[str]]) -> DataFrame:
    """Rename columns to canonical targets via candidate lists.

    For each ``target: [candidates...]``: if the target already exists it
    is kept; otherwise the first candidate that matches an input column
    case/underscore-insensitively is renamed to the target. Unmatched
    targets are left absent (pair with ``ensure_columns``).
    """
    by_norm: dict[str, str] = {}
    for c in df.columns:
        by_norm.setdefault(_norm_key(c), c)
    renames: dict[str, str] = {}
    for target, candidates in mapping.items():
        if target in df.columns:
            continue
        for cand in [target, *candidates]:
            src = by_norm.get(_norm_key(cand))
            if src is not None and src not in renames:
                renames[src] = target
                break
    if not renames:
        return df
    return df.select(
        *[F.col(c).alias(renames.get(c, c)) for c in df.columns]
    )


def permissive_cast(df: DataFrame, types: dict[str, str | T.DataType]) -> DataFrame:
    """Cast columns with dirty-value tolerance: unparseable values become
    null, never an error (the reference's ``cast(strict=False)``).
    Columns absent from the frame are ignored."""
    out = df
    for col, dtype in types.items():
        if col in out.columns:
            out = out.withColumn(col, F.col(col).try_cast(dtype))
    return out


def typed_empty(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """Empty frame with an exact schema so downstream joins/unions work."""
    return spark.createDataFrame([], schema)


def ensure_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Add any schema column missing from the frame as a typed null."""
    missing = [f for f in schema.fields if f.name not in df.columns]
    if not missing:
        return df
    return df.select(
        "*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in missing]
    )


def conform(
    df: DataFrame,
    schema: T.StructType,
    candidates: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Full normalization to a target schema: candidate renames ->
    add-missing -> permissive casts -> project in schema order."""
    # every schema field participates in matching (so a case/underscore
    # variant of the target itself is found even without candidates)
    cand = {f.name: [] for f in schema.fields}
    cand.update(candidates or {})
    out = rename_candidates(df, cand)
    out = ensure_columns(out, schema)
    out = permissive_cast(out, {f.name: f.dataType for f in schema.fields})
    return out.select(*[f.name for f in schema.fields])
