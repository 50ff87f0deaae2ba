"""Empty-extraction diagnostics: explain WHY an extraction came back empty.

The reference, on an empty extraction, runs a diagnostic query against
the raw source reporting total row count, raw min/max of the time column
and how many rows fail timestamp parsing (reference: plugins/services/
data_quality_runner.py:209-229) — so an empty batch is distinguishable
from a broken filter or a dirty time column. Same contract here: one
aggregate pass over the raw frame, no collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def extraction_diagnostics(
    raw: DataFrame,
    ts_col: str | None = None,
    parse_cols: dict[str, str | T.DataType] | None = None,
) -> DataFrame:
    """One-row diagnostic frame over the RAW source:

      n_rows                    total raw rows
      <ts>_min_raw/_max_raw     raw string bounds of the time column
      <col>_parse_nulls         rows where the value is present but fails
                                a permissive cast to the expected type
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if ts_col is not None:
        aggs += [
            F.min(F.col(ts_col).cast("string")).alias(f"{ts_col}_min_raw"),
            F.max(F.col(ts_col).cast("string")).alias(f"{ts_col}_max_raw"),
        ]
    for col, dtype in (parse_cols or {}).items():
        bad = F.col(col).isNotNull() & F.col(col).try_cast(dtype).isNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"{col}_parse_nulls"))
    return raw.agg(*aggs)


def diagnose_if_empty(
    extracted: DataFrame,
    raw: DataFrame,
    ts_col: str | None = None,
    parse_cols: dict[str, str | T.DataType] | None = None,
) -> dict | None:
    """If the extraction is empty, return the diagnostic row as a dict
    (for the ledger/log); None when data is present. The emptiness probe
    is a LIMIT 1, not a count."""
    if extracted.limit(1).count() > 0:
        return None
    row = extraction_diagnostics(raw, ts_col, parse_cols).collect()[0]
    return row.asDict()
