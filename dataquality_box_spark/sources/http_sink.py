"""HTTP packing sink (SURVEY §2.1 S10) — executor-side batched POSTs.

The reference's packing service submits assets to a REST endpoint and
polls status (reference: plugins/services/packing_service.py:61-253,
async submit + poll loop driven from the Airflow worker process). The
Spark re-expression keeps rows off the driver entirely:

  * ``post_partitions`` runs the send inside ``foreachPartition`` —
    each executor batches its own rows (batch 50, matching the
    reference's queue batch) and calls an injected ``transport``
    callable. No HTTP client is baked in (none exists in-container);
    production passes ``requests.post``-shaped code, tests pass a
    file-backed fake. The transport must be picklable (top-level
    function or functools.partial).
  * Per-batch retry with exponential backoff; exhausted retries raise,
    so Spark task retry drives redelivery. The sink therefore requires
    an idempotent receiver — the reference's packing service is (keyed
    by asset id), and the WorkQueue + status-poll half of the protocol
    lives in ``plans/queue.py`` (claim/zombie/complete).
  * Row/batch totals ride Spark accumulators — observable without a
    second pass or a driver-side collect.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_BATCH = 50  # reference: dags/asset_packing_dag.py:36


def post_partitions(
    df: DataFrame,
    transport: Callable[[list[dict]], None],
    batch_size: int = DEFAULT_BATCH,
    max_retries: int = 3,
    backoff_base_sec: float = 0.1,
) -> dict[str, int]:
    """POST every row of ``df`` through ``transport`` in executor-side
    batches; returns {'rows': n, 'batches': n} from accumulators.

    ``transport(batch)`` receives a list of row dicts; raising marks the
    batch failed — it is retried ``max_retries`` times with exponential
    backoff, then the task fails (Spark re-runs the partition; receiver
    idempotency absorbs the replay).
    """
    sc = df.sparkSession.sparkContext
    rows_acc = sc.accumulator(0)
    batches_acc = sc.accumulator(0)
    cols = df.columns

    def send_with_retry(batch: list[dict]) -> None:
        for attempt in range(max_retries + 1):
            try:
                transport(batch)
                return
            except Exception:  # noqa: BLE001 — transport errors are retryable
                if attempt >= max_retries:
                    raise
                time.sleep(backoff_base_sec * (2**attempt))

    def send_partition(rows) -> None:
        batch: list[dict] = []
        for r in rows:
            batch.append(dict(zip(cols, r)))
            if len(batch) >= batch_size:
                send_with_retry(batch)
                batches_acc.add(1)
                rows_acc.add(len(batch))
                batch = []
        if batch:
            send_with_retry(batch)
            batches_acc.add(1)
            rows_acc.add(len(batch))

    df.foreachPartition(send_partition)
    return {"rows": rows_acc.value, "batches": batches_acc.value}
