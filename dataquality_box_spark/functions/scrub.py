"""Compiled-regex PII scrubbing as a chain of ``regexp_replace`` columns.

The Spark analog of the reference's regex cleaning chain
(reference: plugins/dq_lib/reconciliation.py:92-117 container-number
cleaning), re-targeted at PII per the north rule: email / SSN / phone →
deterministic replacement tokens, applied in a fixed order so scrubbed
text is byte-identical across engines and runs.

Stays entirely JVM-side (regexp_replace is codegen'd) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import SCRUB_STEPS


def scrub_text(text: Column, steps: tuple[tuple[str, str], ...] = SCRUB_STEPS) -> Column:
    out = text
    for pattern, token in steps:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_sql(expr: str, steps: tuple[tuple[str, str], ...] = SCRUB_STEPS) -> str:
    """The same scrub chain as an ANSI-SQL string (for oracle parity)."""
    out = expr
    for pattern, token in steps:
        pat = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
