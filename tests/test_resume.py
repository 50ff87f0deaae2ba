"""Resume / idempotency tests (SURVEY.md §5 point 4).

Kill-mid-run simulation: process half the partitions, crash, re-invoke;
only unprocessed partitions replay and the final output is identical to a
single-shot run.
"""

from __future__ import annotations

import pandas as pd
import pytest

from dataquality_box_spark.plans.ledger import Ledger
from dataquality_box_spark.plans.partitioned import (
    ingest,
    process_partitions,
    run_resumable,
)
from dataquality_box_spark.sources.tableio import TableIO

N_PARTS = 6


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.reindex(sorted(pdf.columns), axis=1)
        .sort_values(sorted(pdf.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def test_resume_after_crash_matches_single_shot(spark, transcripts_df, tmp_path):
    single = run_resumable(
        spark, transcripts_df, str(tmp_path / "single"), n_partitions=N_PARTS
    ).toPandas()

    root = str(tmp_path / "crashy")
    io = TableIO(root)
    ingest(spark, transcripts_df, io, N_PARTS)
    with pytest.raises(RuntimeError, match="injected failure"):
        process_partitions(spark, io, n_partitions=N_PARTS, fail_after=3)
    ledger = Ledger(f"{root}/_ledger.jsonl")
    assert len(ledger.done("process")) == 3

    # resume: only the remaining partitions run
    second = process_partitions(spark, io, n_partitions=N_PARTS)
    assert len(second) == N_PARTS - 3
    assert len(ledger.done("process")) == N_PARTS

    resumed = io.read(spark, "result").toPandas()
    a, b = _normalize(single), _normalize(resumed)
    pd.testing.assert_frame_equal(a, b)


def test_rerun_is_noop_and_idempotent(spark, transcripts_df, tmp_path):
    root = str(tmp_path / "idem")
    out1 = run_resumable(spark, transcripts_df, root, n_partitions=N_PARTS).toPandas()
    io = TableIO(root)
    # second invocation: ledger says everything is done -> no partitions run
    assert process_partitions(spark, io, n_partitions=N_PARTS) == []
    out2 = io.read(spark, "result").toPandas()
    pd.testing.assert_frame_equal(_normalize(out1), _normalize(out2))

    # forced replay of one partition rewrites identical bytes (idempotent)
    io.drop_partition("result", "part_id", 0)
    assert not io.partition_exists("result", "part_id", 0)
    # strip partition 0 from the ledger to force replay
    entries = [e for e in Ledger(f"{root}/_ledger.jsonl").entries()
               if not (e.stage == "process" and e.partition_id == "0")]
    import json, dataclasses, os
    with open(f"{root}/_ledger.jsonl", "w") as f:
        for e in entries:
            f.write(json.dumps(dataclasses.asdict(e)) + "\n")
    assert process_partitions(spark, io, n_partitions=N_PARTS) == ["0"]
    out3 = io.read(spark, "result").toPandas()
    pd.testing.assert_frame_equal(_normalize(out1), _normalize(out3))


def test_ledger_metrics_consistent(spark, transcripts_df, tmp_path):
    root = str(tmp_path / "metrics")
    kept = run_resumable(spark, transcripts_df, root, n_partitions=N_PARTS)
    entries = [e for e in Ledger(f"{root}/_ledger.jsonl").entries() if e.stage == "process"]
    assert len(entries) == N_PARTS
    assert sum(e.rows_in for e in entries) == transcripts_df.count()
    assert sum(e.rows_kept for e in entries) == kept.count()
    for e in entries:
        assert e.rows_in == e.rows_kept + e.rows_dropped
        assert e.status == "SUCCESS" and e.duration_sec > 0


def test_layout_mismatch_raises_loudly(spark, transcripts_df, tmp_path):
    """The raw ledger entry pins n_partitions; re-invoking either stage
    with a different bucket count must fail, not silently reuse (or skip
    parts of) the old directory layout."""
    root = str(tmp_path / "pin")
    io = TableIO(root)
    ingest(spark, transcripts_df, io, N_PARTS)
    with pytest.raises(ValueError, match="partition-layout mismatch"):
        ingest(spark, transcripts_df, io, N_PARTS + 2)
    with pytest.raises(ValueError, match="partition-layout mismatch"):
        process_partitions(spark, io, n_partitions=N_PARTS - 2)
    # the pinned count still works end-to-end
    assert len(process_partitions(spark, io, n_partitions=N_PARTS)) == N_PARTS


def test_ingest_count_rides_the_write_action(spark, transcripts_df, tmp_path):
    """rows_in in the raw ledger entry comes from a CollectMetrics
    observation on the write — correct count, and no separate count job
    re-reading the just-written parquet (asserted via the job listener)."""
    from pyspark import SparkContext

    root = str(tmp_path / "obs")
    io = TableIO(root)
    sc = SparkContext._active_spark_context
    before = sc.statusTracker().getJobIdsForGroup(None)
    ingest(spark, transcripts_df, io, N_PARTS)
    # capture immediately: the count() below launches its own jobs
    after = sc.statusTracker().getJobIdsForGroup(None)
    entry = [e for e in Ledger(f"{root}/_ledger.jsonl").entries() if e.stage == "raw"][0]
    assert entry.rows_in == transcripts_df.count()
    assert entry.n_partitions == N_PARTS
    # ingest runs only the write action (AQE splits it into a shuffle-map
    # job + a result job = 2); the old re-read-and-count would add a third
    assert len(after) - len(before) <= 2


def test_concurrent_processing_matches_sequential(spark, transcripts_df, tmp_path):
    """max_concurrent > 1 runs partition jobs from a thread pool; the
    per-partition directory outputs and ledger contents must be identical
    to sequential execution."""
    seq = run_resumable(
        spark, transcripts_df, str(tmp_path / "seq"),
        n_partitions=N_PARTS, max_concurrent=1,
    ).toPandas()
    root = str(tmp_path / "conc")
    conc = run_resumable(
        spark, transcripts_df, root, n_partitions=N_PARTS, max_concurrent=4
    ).toPandas()
    pd.testing.assert_frame_equal(_normalize(seq), _normalize(conc))
    entries = [
        e for e in Ledger(f"{root}/_ledger.jsonl").entries() if e.stage == "process"
    ]
    assert sorted(e.partition_id for e in entries) == [str(k) for k in range(N_PARTS)]
    assert sum(e.rows_in for e in entries) == transcripts_df.count()
