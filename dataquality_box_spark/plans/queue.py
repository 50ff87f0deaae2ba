"""Persistent work queue with zombie recovery — the packing-queue state
machine re-expressed on the TableIO seam.

Reference behavior (reference: dags/asset_packing_dag.py:36-39 constants,
:45-98 zombie cleanup, :105-203 claim batch + backlog alert, :222-301
per-item completion): a DB table drives asynchronous work —

    PENDING -> (claim, batch of 50) -> PROCESSING
    PROCESSING/POLLING older than 2 h  -> zombie:
        retry_count < 3  -> PENDING again, retry_count += 1
        retry_count >= 3 -> ABANDONED
    work outcome -> SUCCESS | FAILED
    backlog alert when PENDING count >= 500

The reference claims with ``FOR UPDATE SKIP LOCKED`` but then FORCES the
workers serial anyway (``max_active_runs=1`` / ``max_active_tasks=1``,
dags/reconciliation_worker_dag.py:39-41) — there is exactly one claimer
at a time. This implementation keeps that single-scheduler contract
explicit: transitions are keyed PARTITION-BOUNDED MERGEs through
``sources/merge.merge_upsert_bucketed`` — the state table is
hive-partitioned by a crc32 bucket of item_id, so a claim/complete
rewrites only the bucket partitions holding the touched items, never
the whole state table (crash-safe and idempotently replayable; at scale
a transition costs O(batch), not O(history)). The parquet fallback
detects cross-process conflicts with an advisory O_CREAT|O_EXCL
lockfile held across each mutating transition: a second concurrent
mutator gets a loud ``QueueConcurrencyError`` instead of silently
double-claiming the same PENDING rows. A stale lock from a crashed
holder is broken after ``LOCK_STALE_SEC`` (set far above plausible
GC/steal-burst pauses; a live holder also heartbeats the lock mtime),
and every holder writes a unique FENCING token into the lockfile and
re-verifies it immediately before and after its merge commits — a
holder whose lock was broken mid-pause aborts loudly instead of
racing the breaker's merge. On Iceberg the same MERGE gets optimistic
concurrency natively (competing commits conflict; one retries), which
remains the multi-scheduler upgrade path. ``now`` is injected
everywhere (deterministic tests, backfill replays). Claim order is
deterministic: (updated_at, item_id) oldest first.

The actual packing work (HTTP service, S10) stays out of scope — this is
the queue contract around it; callers plug any executor into
``complete``.
"""

from __future__ import annotations

import json
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.merge import merge_upsert_bucketed, read_merged
from ..sources.tableio import TableIO

# reference: dags/asset_packing_dag.py:36-39
CLAIM_BATCH = 50
ZOMBIE_TIMEOUT_SEC = 2 * 3600
MAX_RETRIES = 3
BACKLOG_ALERT_THRESHOLD = 500
# a mutation lock older than this is a crashed holder: break it. Live
# holders HEARTBEAT the lock mtime every LOCK_STALE_SEC/8 from a daemon
# thread, so a slow-but-alive transition (multi-step Spark jobs can
# easily exceed any fixed threshold) is never mistaken for a crash. The
# threshold sits far above plausible stop-the-world pauses on this
# shared host (GC, ~17% steal bursts measured) — and even a holder paused
# past it is caught by the fencing-token re-check before its merge
# commits, so a broken-then-resumed holder aborts instead of racing.
LOCK_STALE_SEC = 300.0
# bucket partitions for the state table: transitions rewrite only the
# buckets holding their items (merge_upsert_bucketed)
STATE_BUCKETS = 8


class QueueConcurrencyError(RuntimeError):
    """Another process holds the queue's mutation lock — the parquet
    fallback's loud stand-in for Iceberg's optimistic-commit conflict."""


QUEUE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("updated_at", T.DoubleType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

_ACTIVE = ("PROCESSING", "POLLING")


class WorkQueue:
    def __init__(self, spark: SparkSession, io: TableIO, table: str = "work_queue"):
        self.spark = spark
        self.io = io
        self.table = table

    def _state(self) -> DataFrame:
        if not self.io.table_exists(self.spark, self.table):
            return self.spark.createDataFrame([], QUEUE_SCHEMA)
        return read_merged(self.spark, self.io, self.table)

    def _lock_path(self) -> str:
        return f"{self.io.root}/{self.table}.lock"

    def _verify_lock(self, token: str) -> None:
        """Fencing check: the lockfile must still exist and carry OUR
        token. A holder paused long enough to be declared stale (GC, VM
        steal burst) finds its lock broken/replaced here and aborts
        BEFORE mutating state concurrently with the breaker — the
        double-claim the advisory lock alone cannot prevent."""
        try:
            with open(self._lock_path()) as fh:
                current = fh.read()
        except FileNotFoundError:
            current = None
        if current != token:
            raise QueueConcurrencyError(
                f"queue '{self.table}' lock was broken while held (holder "
                "paused past the stale threshold?); aborting the transition "
                "instead of racing the new holder's merge"
            )

    def _mutex(self, stale_sec: float = LOCK_STALE_SEC):
        """Advisory cross-process lock for a mutating transition.

        O_CREAT|O_EXCL is atomic on a local/posix filesystem; a fresh
        lock held by someone else raises QueueConcurrencyError (detect,
        don't silently serialize — the caller decides whether to retry).
        A lock older than ``stale_sec`` is a crashed holder: it is broken
        by an atomic RENAME to a unique name before deletion, so two
        waiters that both observe staleness cannot double-break (the
        rename loser gets FileNotFoundError and loops — it never unlinks
        the winner's fresh lock). While held, a daemon thread touches the
        lock mtime every stale_sec/8, so a live holder is never aged into
        "stale" no matter how long its Spark jobs run; the lockfile
        carries a unique fencing token which ``_verify_lock`` re-checks
        around every merge commit, so even a holder that WAS aged out and
        broken aborts loudly instead of committing. Yields the token.
        Wall-clock here is infrastructure, not domain time — the injected
        ``now`` clock stays test-deterministic."""
        import contextlib
        import os
        import threading
        import time as _time
        import uuid

        @contextlib.contextmanager
        def guard():
            lock = self._lock_path()
            token = f"{os.getpid()}:{uuid.uuid4().hex}"
            os.makedirs(self.io.root, exist_ok=True)
            while True:
                try:
                    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, token.encode())
                    os.close(fd)
                    break
                except FileExistsError:
                    try:
                        age = _time.time() - os.path.getmtime(lock)
                    except FileNotFoundError:
                        continue  # holder released between open and stat
                    if age > stale_sec:
                        # atomic break: exactly one waiter wins the rename
                        # (TOCTOU-safe — the loser never unlinks a fresh
                        # lock created by the winner after the break)
                        tomb = f"{lock}.broken.{uuid.uuid4().hex}"
                        try:
                            os.rename(lock, tomb)
                        except FileNotFoundError:
                            continue  # someone else broke/released it first
                        with contextlib.suppress(FileNotFoundError):
                            os.unlink(tomb)
                        continue
                    raise QueueConcurrencyError(
                        f"queue '{self.table}' is being mutated by another "
                        f"process (lock age {age:.1f}s); retry after it commits"
                    ) from None
            stop = threading.Event()

            def heartbeat() -> None:
                while not stop.wait(stale_sec / 8):
                    with contextlib.suppress(FileNotFoundError):
                        os.utime(lock)

            beat = threading.Thread(target=heartbeat, daemon=True)
            beat.start()
            try:
                yield token
            finally:
                stop.set()
                beat.join(timeout=stale_sec)
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(lock)

        return guard()

    def _merge(self, rows: list[tuple], token: str) -> None:
        """Fenced, partition-bounded state merge: ownership is
        re-verified immediately before the commit (abort, don't race) and
        re-checked after it (a break DURING the write window is detected
        loudly — the damage a filesystem seam can't prevent, Iceberg's
        optimistic commit can)."""
        updates = self.spark.createDataFrame(rows, QUEUE_SCHEMA)
        self._verify_lock(token)
        merge_upsert_bucketed(
            self.spark, self.io, updates, self.table,
            keys=["item_id"], n_buckets=STATE_BUCKETS,
        )
        self._verify_lock(token)

    def enqueue(self, items: dict[str, dict], now: float) -> int:
        """Insert new items as PENDING; ids already queued are left
        untouched (the intake DAG's insert-if-absent contract). The
        absent-check is a distributed anti join — never a driver-side id
        collect, so a long SUCCESS/FAILED history doesn't grow driver
        memory — and the write goes through the same atomic MERGE
        staging+swap as every other transition (a crash mid-enqueue
        leaves the previous queue state intact, never a partial batch)."""
        rows = [
            (iid, json.dumps(payload, sort_keys=True), "PENDING", 0, now, None)
            for iid, payload in sorted(items.items())
        ]
        with self._mutex() as token:
            updates = self.spark.createDataFrame(rows, QUEUE_SCHEMA)
            fresh = updates.join(
                self._state().select("item_id"), "item_id", "left_anti"
            ).persist()
            try:
                n = fresh.count()
                if n:
                    self._verify_lock(token)
                    merge_upsert_bucketed(
                        self.spark, self.io, fresh, self.table,
                        keys=["item_id"], n_buckets=STATE_BUCKETS,
                    )
                    self._verify_lock(token)
                return n
            finally:
                fresh.unpersist()

    def cleanup_zombies(
        self,
        now: float,
        timeout_sec: int = ZOMBIE_TIMEOUT_SEC,
        max_retries: int = MAX_RETRIES,
    ) -> dict[str, int]:
        """Requeue timed-out active items (retry budget left) or abandon
        them (budget exhausted) — asset_packing_dag.py:45-98."""
        cutoff = now - timeout_sec
        with self._mutex() as token:
            zombies = (
                self._state()
                .where(F.col("status").isin(*_ACTIVE) & (F.col("updated_at") < cutoff))
                .collect()
            )
            reset, abandoned = [], []
            for z in zombies:
                if z["retry_count"] < max_retries:
                    reset.append(
                        (z["item_id"], z["payload"], "PENDING",
                         z["retry_count"] + 1, now, z["error"])
                    )
                else:
                    abandoned.append(
                        (z["item_id"], z["payload"], "ABANDONED",
                         z["retry_count"], now, "max retries exceeded")
                    )
            if reset or abandoned:
                self._merge(reset + abandoned, token)
        return {"reset": len(reset), "abandoned": len(abandoned)}

    def claim(self, now: float, batch: int = CLAIM_BATCH) -> list[dict]:
        """Oldest PENDING items (deterministic order), flipped to
        PROCESSING in one MERGE commit (asset_packing_dag.py:105-180),
        under the cross-process mutation lock — a concurrent claimer
        raises QueueConcurrencyError instead of double-claiming; Iceberg's
        optimistic MERGE is the native multi-claimer upgrade path."""
        with self._mutex() as token:
            pending = (
                self._state()
                .where(F.col("status") == "PENDING")
                .orderBy("updated_at", "item_id")
                .limit(batch)
                .collect()
            )
            if pending:
                self._merge(
                    [
                        (r["item_id"], r["payload"], "PROCESSING",
                         r["retry_count"], now, r["error"])
                        for r in pending
                    ],
                    token,
                )
        return [
            {"item_id": r["item_id"], "payload": json.loads(r["payload"] or "{}"),
             "retry_count": r["retry_count"]}
            for r in pending
        ]

    def complete(
        self, item_id: str, ok: bool, now: float, error: str | None = None
    ) -> None:
        """Terminal transition for one item (asset_packing_dag.py:254-301)."""
        with self._mutex() as token:
            cur = self._state().where(F.col("item_id") == item_id).collect()
            if not cur:
                raise KeyError(f"unknown queue item: {item_id}")
            r = cur[0]
            status = "SUCCESS" if ok else "FAILED"
            self._merge(
                [(item_id, r["payload"], status, r["retry_count"], now, error)],
                token,
            )

    def backlog(self) -> int:
        return self._state().where(F.col("status") == "PENDING").count()

    def backlog_alert(self, threshold: int = BACKLOG_ALERT_THRESHOLD) -> bool:
        """asset_packing_dag.py:185-188."""
        return self.backlog() >= threshold
