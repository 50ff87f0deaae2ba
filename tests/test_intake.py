"""Manual intake flow (plans/intake.py): validation, reverse lookup,
placeholder fallback, queue submission."""

from __future__ import annotations

from datetime import datetime

import pytest

from dataquality_box_spark.plans.intake import (
    IntakeError,
    placeholder_id,
    resolve_entity_id,
    submit_intake,
    validate_intake,
)
from dataquality_box_spark.plans.queue import WorkQueue
from dataquality_box_spark.sources.tableio import TableIO

FORM = {
    "entity_key": "AT07",
    "shift_date": "2026-08-16",
    "time_window_start": "2026-08-16T08:00:00",
    "time_window_end": "2026-08-16T09:00:00",
    "description": "box fell off",
}


def test_validate_collects_all_errors_and_applies_defaults():
    with pytest.raises(IntakeError) as e:
        validate_intake({"time_window_start": "junk", "time_window_end": "x"})
    msg = str(e.value)
    assert "entity_key" in msg and "description" in msg and "bad timestamp" in msg

    with pytest.raises(IntakeError, match="after"):
        validate_intake({**FORM, "time_window_end": "2026-08-16T08:00:00"})

    v = validate_intake({**FORM, "tags": "a, b,,c ", "reporter": "  "})
    assert (v["severity"], v["reporter"], v["site"]) == ("P1", "anonymous", "unknown")
    assert v["tags"] == ["a", "b", "c"] and v["entity_id"] is None


@pytest.fixture
def records(spark):
    rows = [
        ("AT07", 100, datetime(2026, 8, 16, 7, 50), datetime(2026, 8, 16, 8, 20)),
        ("AT07", 101, datetime(2026, 8, 16, 8, 5), datetime(2026, 8, 16, 8, 40)),
        ("AT07", 102, datetime(2026, 8, 16, 11, 0), datetime(2026, 8, 16, 12, 0)),  # no overlap
        ("AT99", 103, datetime(2026, 8, 16, 8, 0), datetime(2026, 8, 16, 9, 0)),  # other key
    ]
    return spark.createDataFrame(
        rows, "k string, cid long, start timestamp, end timestamp"
    )


def test_resolve_picks_nearest_overlapping_start(records):
    v = validate_intake(FORM)
    r = resolve_entity_id(records, v, "k", "start", "end", "cid")
    assert r["entity_id"] == "101"  # starts 5 min from the window start; 100 is 10


def test_resolve_falls_back_to_placeholder(records):
    v = validate_intake({**FORM, "entity_key": "AT00"})
    r = resolve_entity_id(records, v, "k", "start", "end", "cid")
    assert r["entity_id"] == placeholder_id("AT00", FORM["time_window_start"])
    assert r["entity_id"] == "MANUAL_AT00_20260816080000"


def test_user_supplied_id_short_circuits(records):
    v = validate_intake({**FORM, "entity_id": "999"})
    assert resolve_entity_id(records, v, "k", "start", "end", "cid")["entity_id"] == "999"


def test_submit_enqueues_pending(spark, tmp_path, records):
    q = WorkQueue(spark, TableIO(str(tmp_path)))
    r = resolve_entity_id(records, validate_intake(FORM), "k", "start", "end", "cid")
    item_id = submit_intake(q, r, now=0.0)
    assert item_id == "manual_report:101"
    claimed = q.claim(now=1.0)
    assert claimed[0]["item_id"] == item_id
    assert claimed[0]["payload"]["description"] == "box fell off"
    # duplicate submission is insert-if-absent
    submit_intake(q, r, now=2.0)
    assert q.backlog() == 0  # the one item is PROCESSING, nothing new queued
