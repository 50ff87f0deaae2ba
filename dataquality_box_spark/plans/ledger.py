"""Processed-partition ledger: resume + per-partition lineage/metrics.

The reference tracks progress with an Airflow-Variable watermark plus a DB
work queue with zombie recovery (reference: dags/scanner_cactus_monitor.py:
44-109 watermark; dags/asset_packing_dag.py:45-180 queue) and reports
per-rule rows to governance_rule_results (plugins/operators/
report_writer.py:116-171). Here both collapse into one JSON-lines ledger:
an entry per (stage, partition) with row counts, drop-reason histogram and
duration — written AFTER the partition's data commit, so a crash between
data write and ledger append just replays one idempotent partition.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class LedgerEntry:
    stage: str
    partition_id: str
    status: str  # SUCCESS | FAILED
    rows_in: int = 0
    rows_kept: int = 0
    rows_dropped: int = 0
    drop_reason_counts: dict[str, int] = field(default_factory=dict)
    duration_sec: float = 0.0
    batch_id: str = "batch0"
    finished_at: float = 0.0
    # layout pin: the raw-stage entry records the bucket count the data was
    # written with; later stages fail loudly on mismatch instead of silently
    # iterating a different range (absent in pre-pin ledgers -> None)
    n_partitions: int | None = None


class Ledger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def entries(self) -> list[LedgerEntry]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                if line.strip():
                    out.append(LedgerEntry(**json.loads(line)))
        return out

    def done(self, stage: str) -> set[str]:
        return {
            e.partition_id
            for e in self.entries()
            if e.stage == stage and e.status == "SUCCESS"
        }

    def append(self, entry: LedgerEntry) -> None:
        entry.finished_at = time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(entry)) + "\n")
            f.flush()
            os.fsync(f.fileno())
