"""Notification rendering + run-report generation (driver-side, tiny).

Re-expression of the reference NotificationService (reference:
plugins/services/notification.py:42-106 urgent/batch send paths,
:108-200 subject/body rendering with a plain-text fallback when the
template engine fails) and ReportGenerator (plugins/services/
report_generator.py:11-120 aggregated per-rule failure report).

Alert rows and report rows are one-per-rule / one-per-run — they are
ALREADY aggregates of the distributed computation, so rendering them on
the driver is the same tiny-table exception as the dispatch digest. The
transport (SMTP/webhook in the reference) is a callback seam: this
engine renders deterministic text; callers decide where it goes.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame

URGENT_SEVERITIES = ("P0",)

_ALERT_BODY = """severity : {severity}
rule     : {rule_id}
title    : {title}
hits     : {hit_count}
triggers : {trigger_ids} (field: {trigger_id_field})
batch    : {batch_id}"""

_BATCH_HEADER = "Data Governance Summary - {batch_id} ({n} alerts)\n"


def render_subject(alert: dict, urgent: bool = False) -> str:
    prefix = "[URGENT]" if urgent else "[ALERT]"
    return f"{prefix} Data Governance Alert - {alert['rule_id']}"


def render_alert_body(alert: dict, batch_id: str = "batch0") -> str:
    """Deterministic plain-text body; on any missing field fall back to a
    sorted JSON dump (the reference's template-failure degrade path,
    notification.py:303-348)."""
    try:
        return _ALERT_BODY.format(batch_id=batch_id, **alert)
    except (KeyError, IndexError):
        return json.dumps({"batch_id": batch_id, **alert}, sort_keys=True, default=str)


def render_batch_summary(alerts: list[dict], batch_id: str = "batch0") -> tuple[str, str]:
    """(subject, body) for the batch digest — alerts sorted by severity
    then rule_id so the rendering is order-independent."""
    ordered = sorted(alerts, key=lambda a: (a.get("severity", ""), a.get("rule_id", "")))
    subject = _BATCH_HEADER.format(batch_id=batch_id, n=len(ordered)).strip()
    lines = [
        f"- [{a.get('severity', '?')}] {a.get('rule_id', '?')}: "
        f"{a.get('title', '')} ({a.get('hit_count', 0)} hits)"
        for a in ordered
    ]
    return subject, "\n".join(lines)


def notify_alerts(
    alerts: DataFrame,
    send: Callable[[str, str], None],
    batch_id: str = "batch0",
) -> int:
    """Reference send policy (notification.py:42-106 + dispatcher):
    urgent severities get one message per alert immediately; everything
    else is batched into one summary message. Returns messages sent."""
    rows = [r.asDict() for r in alerts.collect()]
    sent = 0
    urgent = [r for r in rows if r.get("severity") in URGENT_SEVERITIES]
    rest = [r for r in rows if r.get("severity") not in URGENT_SEVERITIES]
    for a in sorted(urgent, key=lambda r: r["rule_id"]):
        send(render_subject(a, urgent=True), render_alert_body(a, batch_id))
        sent += 1
    if rest:
        subject, body = render_batch_summary(rest, batch_id)
        send(subject, body)
        sent += 1
    return sent


def render_run_report(
    rule_results: DataFrame, run_summary: DataFrame
) -> str:
    """Markdown run report from the persisted governance tables
    (reference: report_generator.py aggregates per-rule failures +
    status into one HTML document; markdown here, same content)."""
    summary = run_summary.collect()[0].asDict()
    rows = sorted(
        (r.asDict() for r in rule_results.collect()),
        key=lambda r: (r["batch_id"], r["rule_id"]),
    )
    lines = [
        f"# Data quality run report - {summary['batch_id']}",
        "",
        f"**Status: {summary['status']}** - "
        f"{summary['success_rules']}/{summary['total_rules']} rules succeeded, "
        f"{summary['failed_rules']} failed, {summary['skipped_rules']} skipped, "
        f"{summary['total_hits']} total hits",
        "",
        "| rule | severity | type | status | hits | sec | error |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        # `is not None`, not truthiness: a legitimate 0.00s duration must
        # render, only never-timed rules leave the cell blank
        sec = (
            f"{r['execution_time_sec']:.2f}"
            if r["execution_time_sec"] is not None
            else ""
        )
        err = (r["error_message"] or "").splitlines()[0][:80] if r["error_message"] else ""
        lines.append(
            f"| {r['rule_id']} | {r['severity'] or ''} | {r['logic_type'] or ''} "
            f"| {r['status']} | {'' if r['hit_count'] is None else r['hit_count']} "
            f"| {sec} | {err} |"
        )
    return "\n".join(lines)


# --- Global failure reporter (reference: dags/global_alert_reporter.py) ---

LOOKBACK_MINUTES = 65  # reference: global_alert_reporter.py:21 ("a little
# over the hourly cadence so boundary failures are never missed")


def scan_failed_entries(
    entries: list,
    now_epoch: float,
    lookback_minutes: int = LOOKBACK_MINUTES,
) -> list[dict]:
    """Collect FAILED ledger entries finishing inside the lookback window
    — the analog of the reference's failed-TaskInstance + qa_result XCom
    scan (global_alert_reporter.py:41-115). Malformed entries (no
    finished_at) are skipped defensively, like its deserialization
    fallbacks."""
    since = now_epoch - lookback_minutes * 60
    out = []
    for e in entries:
        if e.status != "FAILED" or not e.finished_at or e.finished_at < since:
            continue
        out.append(
            {
                "stage": e.stage,
                "partition_id": e.partition_id,
                "batch_id": e.batch_id,
                "rows_in": e.rows_in,
                "drop_reason_counts": dict(e.drop_reason_counts or {}),
                "finished_at": e.finished_at,
            }
        )
    return sorted(out, key=lambda d: (d["stage"], d["partition_id"]))


def render_consolidated_alert(failures: list[dict]) -> tuple[str, str] | None:
    """One subject+body for every failure in the window, or None when
    there is nothing to send (the reference skips the email entirely,
    global_alert_reporter.py:121-125)."""
    if not failures:
        return None
    subject = f"[Quality Alert] {len(failures)} Data Quality Checks Failed"
    lines = []
    for f in failures:
        reasons = ", ".join(f"{k}={v}" for k, v in sorted(f["drop_reason_counts"].items()))
        lines.append(
            f"- stage={f['stage']} partition={f['partition_id']} "
            f"batch={f['batch_id']} rows_in={f['rows_in']}"
            + (f" reasons: {reasons}" if reasons else "")
        )
    return subject, "\n".join(lines)
