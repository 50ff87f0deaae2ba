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
    from dataquality_box_spark.plans.queue import LOCK_STALE_SEC

    old = time.time() - (LOCK_STALE_SEC + 60)
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


def test_fencing_token_aborts_broken_holder(spark, tmp_path):
    """A holder whose lock was broken (stale-aged) and re-acquired by
    someone else must ABORT its merge via the fencing re-check rather
    than mutate state concurrently with the new holder."""
    import pytest

    from dataquality_box_spark.plans.queue import QueueConcurrencyError, WorkQueue
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path))
    q = WorkQueue(spark, io)
    q.enqueue({"a": {}}, now=0.0)
    with q._mutex() as token:
        # simulate the breaker: replace the lock content with ITS token
        with open(q._lock_path(), "w") as fh:
            fh.write("1234:deadbeef")
        with pytest.raises(QueueConcurrencyError, match="broken"):
            q._merge([("a", "{}", "PROCESSING", 0, 1.0, None)], token)
    # the refused merge left state untouched
    assert q.backlog() == 1


def _partition_file_index(root: str, table: str) -> dict[str, tuple]:
    """(mtime_ns, size) per data file under each bucket partition dir."""
    import os

    out = {}
    tdir = os.path.join(root, table)
    for dirpath, _dirs, files in os.walk(tdir):
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, tdir)] = (st.st_mtime_ns, st.st_size)
    return out


def test_transitions_rewrite_only_touched_bucket_partitions(spark, tmp_path):
    """The state table is bucket-partitioned by item_id: completing ONE
    item must leave every other bucket partition's files byte-untouched
    (mtime+size identical) — the partition-bounded MERGE contract."""
    from dataquality_box_spark.plans.queue import STATE_BUCKETS, WorkQueue
    from dataquality_box_spark.sources.merge import BUCKET_COL
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path))
    q = WorkQueue(spark, io)
    # enough items to populate several bucket partitions
    q.enqueue({f"item_{i:03d}": {"i": i} for i in range(40)}, now=0.0)
    claimed = q.claim(now=1.0, batch=1)
    before = _partition_file_index(io.root, "work_queue")

    q.complete(claimed[0]["item_id"], ok=True, now=2.0)

    after = _partition_file_index(io.root, "work_queue")
    touched_bucket = (
        io.read(spark, "work_queue")
        .where("item_id = '%s'" % claimed[0]["item_id"])
        .select(BUCKET_COL)
        .collect()[0][0]
    )
    # files OUTSIDE the touched bucket are identical objects on disk
    untouched_before = {k: v for k, v in before.items()
                        if f"{BUCKET_COL}={touched_bucket}/" not in k}
    untouched_after = {k: v for k, v in after.items()
                       if f"{BUCKET_COL}={touched_bucket}/" not in k}
    assert untouched_before == untouched_after
    assert untouched_before  # several buckets actually exist
    # and the touched bucket DID rewrite
    touched_before = {k for k in before if f"{BUCKET_COL}={touched_bucket}/" in k}
    touched_after = {k: after[k] for k in after
                     if f"{BUCKET_COL}={touched_bucket}/" in k}
    assert touched_after and (
        touched_before != set(touched_after)
        or any(before[k] != touched_after[k] for k in touched_after)
    )
    assert len({k.split("/")[0] for k in after}) > 1  # multi-bucket layout


def test_bucket_count_is_pinned(spark, tmp_path):
    """Merging an existing bucketed table with a different n_buckets must
    fail loudly — rebucketing keys would strand stale rows in the old
    partitions."""
    import pytest

    from dataquality_box_spark.sources.merge import merge_upsert_bucketed
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path))
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    merge_upsert_bucketed(spark, io, df, "t", keys=["k"], n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        merge_upsert_bucketed(spark, io, df, "t", keys=["k"], n_buckets=4)
