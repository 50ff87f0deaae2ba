"""Manual corner-case intake: validate -> reverse-lookup -> enqueue.

Re-expression of the reference's manual-intake flow (reference:
dags/manual_intake_dag.py:40-160): a human files an anomaly report
(entity key + time window + description); the flow

1. validates the form (required fields, ISO timestamps, end after
   start) and normalizes defaults (severity P1, reporter 'anonymous',
   site 'unknown', comma-split tags) — :40-95,
2. reverse-looks-up the matching entity id when none was given: the
   record whose [start, end] interval OVERLAPS the reported window,
   nearest start to the window start wins; no match (or lookup failure)
   falls back to a deterministic ``MANUAL_<key>_<ts14>`` placeholder —
   :100-146,
3. enqueues the case as PENDING work (the packing queue picks it up) —
   :150+, here through plans/queue.WorkQueue.

The lookup is a partition-prunable range filter + top-1; everything else
is driver-side scalar work on one form submission.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .queue import WorkQueue

REQUIRED = ("entity_key", "shift_date", "time_window_start", "time_window_end", "description")
DEFAULTS = {"severity": "P1", "reporter": "anonymous", "site": "unknown"}


class IntakeError(ValueError):
    """All form problems reported at once (the reference collects every
    error before raising, manual_intake_dag.py:55-77)."""


def validate_intake(params: dict) -> dict:
    p = {k: str(v).strip() for k, v in params.items() if v is not None}
    errors = [f"{k} must not be empty" for k in REQUIRED if not p.get(k)]
    ts = te = None
    if p.get("time_window_start") and p.get("time_window_end"):
        try:
            ts = datetime.fromisoformat(p["time_window_start"])
            te = datetime.fromisoformat(p["time_window_end"])
        except ValueError as e:
            errors.append(f"bad timestamp (ISO YYYY-MM-DDTHH:MM:SS required): {e}")
        if ts and te and te <= ts:
            errors.append("time_window_end must be after time_window_start")
    if errors:
        raise IntakeError("; ".join(errors))
    out = {k: p[k] for k in REQUIRED}
    out["entity_id"] = p.get("entity_id") or None
    for k, v in DEFAULTS.items():
        out[k] = p.get(k) or v
    out["tags"] = [t.strip() for t in p.get("tags", "").split(",") if t.strip()]
    return out


def placeholder_id(entity_key: str, time_start: str) -> str:
    ts14 = time_start.replace("-", "").replace("T", "").replace(":", "")[:14]
    return f"MANUAL_{entity_key}_{ts14}"


def resolve_entity_id(
    records: DataFrame,
    validated: dict,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> dict:
    """Fill entity_id by interval-overlap lookup when the form left it
    blank; deterministic nearest-start tiebreak on the id."""
    if validated["entity_id"]:
        return validated
    ws, we = validated["time_window_start"], validated["time_window_end"]
    hit = (
        records.where(
            (F.col(key_col) == validated["entity_key"])
            & (F.col(start_col) <= F.lit(we).cast("timestamp"))
            & (F.col(end_col) >= F.lit(ws).cast("timestamp"))
        )
        .orderBy(
            F.abs(
                F.unix_timestamp(F.col(start_col))
                - F.unix_timestamp(F.lit(ws).cast("timestamp"))
            ),
            F.col(id_col),
        )
        .select(id_col)
        .limit(1)
        .collect()
    )
    out = dict(validated)
    out["entity_id"] = (
        str(hit[0][0]) if hit else placeholder_id(out["entity_key"], ws)
    )
    return out


def submit_intake(queue: WorkQueue, resolved: dict, now: float) -> str:
    """Enqueue the case as PENDING; the item id marks the manual source
    (the reference writes triggered_rule_id='manual_report')."""
    item_id = f"manual_report:{resolved['entity_id']}"
    queue.enqueue({item_id: resolved}, now=now)
    return item_id
