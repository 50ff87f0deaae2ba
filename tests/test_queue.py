"""Work-queue state machine (plans/queue.py): claim, zombie recovery,
retry budget, abandonment, backlog alert — the asset-packing queue
semantics with an injected clock."""

from __future__ import annotations

import pytest

from dataquality_box_spark.plans.queue import WorkQueue
from dataquality_box_spark.sources.tableio import TableIO

H = 3600.0


@pytest.fixture
def q(spark, tmp_path):
    return WorkQueue(spark, TableIO(str(tmp_path)))


def test_enqueue_is_insert_if_absent(q):
    assert q.enqueue({"a": {"p": 1}, "b": {"p": 2}}, now=0.0) == 2
    assert q.enqueue({"b": {"p": 999}, "c": {}}, now=1.0) == 1  # b untouched
    assert q.backlog() == 3


def test_claim_oldest_first_and_flips_to_processing(q):
    q.enqueue({"late": {}}, now=10.0)
    q.enqueue({"early": {}}, now=1.0)
    got = q.claim(now=20.0, batch=1)
    assert [g["item_id"] for g in got] == ["early"]
    assert q.backlog() == 1  # 'late' still pending
    # claimed item is not claimable again
    assert [g["item_id"] for g in q.claim(now=21.0, batch=5)] == ["late"]


def test_zombie_requeue_then_abandon_after_max_retries(q):
    q.enqueue({"x": {}}, now=0.0)
    for attempt in range(3):
        t = attempt * 3 * H
        assert [g["item_id"] for g in q.claim(now=t)] == ["x"]
        # 2h timeout passes without completion -> zombie
        out = q.cleanup_zombies(now=t + 2.5 * H)
        assert out == {"reset": 1, "abandoned": 0}
    # fourth stall: retry budget (3) exhausted -> abandoned
    assert [g["item_id"] for g in q.claim(now=10 * H)] == ["x"]
    out = q.cleanup_zombies(now=13 * H)
    assert out == {"reset": 0, "abandoned": 1}
    assert q.claim(now=14 * H) == []  # abandoned items never requeue


def test_fresh_processing_is_not_a_zombie(q):
    q.enqueue({"x": {}}, now=0.0)
    q.claim(now=0.0)
    assert q.cleanup_zombies(now=H) == {"reset": 0, "abandoned": 0}


def test_complete_and_backlog_alert(q):
    q.enqueue({str(i): {} for i in range(4)}, now=0.0)
    claimed = q.claim(now=1.0, batch=2)
    q.complete(claimed[0]["item_id"], ok=True, now=2.0)
    q.complete(claimed[1]["item_id"], ok=False, now=2.0, error="boom")
    st = {
        r["item_id"]: (r["status"], r["error"])
        for r in q._state().collect()
    }
    assert st[claimed[0]["item_id"]] == ("SUCCESS", None)
    assert st[claimed[1]["item_id"]] == ("FAILED", "boom")
    assert q.backlog() == 2
    assert q.backlog_alert(threshold=2) and not q.backlog_alert(threshold=3)
    with pytest.raises(KeyError):
        q.complete("nope", ok=True, now=3.0)


def test_concurrent_mutator_detected_and_stale_lock_broken(spark, tmp_path):
    """Parquet-fallback conflict detection: a fresh foreign lock makes
    mutations raise QueueConcurrencyError (no silent double-claim); a
    stale lock (crashed holder) is broken and the claim proceeds."""
    import os
    import time

    import pytest

    from dataquality_box_spark.plans.queue import QueueConcurrencyError, WorkQueue
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path))
    q = WorkQueue(spark, io)
    q.enqueue({"a": {"x": 1}, "b": {"x": 2}}, now=1000.0)

    lock = f"{io.root}/work_queue.lock"
    with open(lock, "w") as f:
        f.write("99999")  # another process holds the lock
    with pytest.raises(QueueConcurrencyError, match="another"):
        q.claim(now=1001.0)
    # queue state unchanged by the refused claim
    assert q.backlog() == 2

    # crashed holder: age the lock past LOCK_STALE_SEC -> broken, claim works
    old = time.time() - 120
    os.utime(lock, (old, old))
    got = q.claim(now=1002.0)
    assert [g["item_id"] for g in got] == ["a", "b"]
    assert not os.path.exists(lock)  # released after the commit


def test_heartbeat_keeps_live_holder_fresh(spark, tmp_path):
    """A slow-but-ALIVE holder must never be aged into 'stale': the
    heartbeat thread refreshes the lock mtime, so a waiter arriving well
    past the stale threshold still sees a fresh lock and raises instead
    of breaking it (the review's TOCTOU + slow-holder scenarios)."""
    import time

    import pytest

    from dataquality_box_spark.plans.queue import QueueConcurrencyError, WorkQueue
    from dataquality_box_spark.sources.tableio import TableIO

    q = WorkQueue(spark, TableIO(str(tmp_path)))
    with q._mutex(stale_sec=0.3):
        time.sleep(0.9)  # 3x the stale threshold — heartbeat keeps it fresh
        with pytest.raises(QueueConcurrencyError):
            with q._mutex(stale_sec=0.3):
                pass
