"""Cross-source key canonicalization (ID-variant expansion).

Re-expression of the reference's vehicle-ID variant handling (reference:
plugins/services/data_quality_runner.py:787-813): source systems write
the same entity as ``AT01`` / ``AT001`` / ``at1`` / bare ``1``, so before
cross-source matching every dirty key expands to its canonical
zero-padded forms (prefix + digits zfilled to each width). Inputs with
no digits pass through trimmed/uppercased, never prefixed — the
reference explicitly guards against polluting keys like ``ATAT02``.

Note: the reference also intends to keep an already-standard original
verbatim, but its check uses ``re.match(r"^AT\\\\d{2,3}$", ...)`` — a
double-escaped ``\\d`` inside a raw string, which can never match, so
that branch is dead code there. Here the intent is implemented (a
standard-form original IS one of the generated variants anyway, since
zfill never truncates).

All expressions are narrow column work (regexp + lpad) — the expansion
explodes to at most ``len(widths)`` rows per key before the match join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _zfill(digits: Column, width: int) -> Column:
    # python str.zfill pads but NEVER truncates; F.lpad truncates, so
    # guard on length
    return F.when(F.length(digits) >= width, digits).otherwise(
        F.lpad(digits, width, "0")
    )


def canonical_key_variants(
    key: Column, prefix: str = "AT", widths: tuple[int, ...] = (2, 3)
) -> Column:
    """Array of canonical variants for a dirty key (sorted, distinct)."""
    s = F.upper(F.trim(key.cast("string")))
    digits = F.regexp_replace(s, "[^0-9]", "")
    variants = F.array(
        *[F.concat(F.lit(prefix), _zfill(digits, w)) for w in widths]
    )
    return F.array_sort(
        F.array_distinct(F.when(digits == "", F.array(s)).otherwise(variants))
    )


def expand_key_variants(
    df: DataFrame, key_col: str, prefix: str = "AT", out_col: str = "canonical_key"
) -> DataFrame:
    """One row per (original row, canonical variant) — the shape the
    cross-source semi-join consumes."""
    return df.withColumn(
        out_col, F.explode(canonical_key_variants(F.col(key_col), prefix))
    )
