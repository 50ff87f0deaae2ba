"""Structured Streaming path: incremental transcript filtering.

The reference emulates streaming with an hourly watermark scan over MySQL
(reference: dags/scanner_cactus_monitor.py:44-109 watermark + 8h batch
clamp) and a dynamic late-data clipping window (plugins/services/
data_quality_runner.py:388-429). The Spark-native equivalents:

  * ``readStream`` over the transcript table directory — new files are
    the micro-batches; no hand-rolled watermark variable.
  * ``withWatermark('ts', ...)`` bounds state for event-time windows —
    the principled version of the reference's clipping window (late rows
    beyond the watermark are dropped from aggregation, exactly the
    "neighboring-shift noise" rule).
  * per-turn text rules + scrub are stateless column expressions, so the
    same ``annotate/scrub`` code runs unchanged on a stream.
  * conversation-level checks need order; in streaming they run per
    micro-batch via ``foreachBatch`` against the idempotent partitioned
    sink (same TableIO seam), or with session windows for gap analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, QualityConfig
from ..functions.scrub import scrub_text
from ..functions.text import text_flag_columns
from ..schema import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def annotate_stream(stream: DataFrame, cfg: QualityConfig = DEFAULT_CONFIG) -> DataFrame:
    """Stateless per-turn rules + scrub on a stream (same exprs as batch)."""
    out = stream
    for name, col in text_flag_columns(F.col("text"), cfg).items():
        out = out.withColumn(name, col)
    flags = [c for c in ("too_short", "too_long", "high_repetition",
                         "high_symbol_ratio", "boilerplate", "toxicity")]
    keep = ~F.greatest(*[F.col(c) for c in flags])
    return out.withColumn("keep", keep).withColumn(
        "scrubbed_text", F.when(keep, scrub_text(F.col("text")))
    )


def windowed_drop_metrics(
    stream: DataFrame,
    cfg: QualityConfig = DEFAULT_CONFIG,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed keep/drop counts with a watermark bound."""
    annotated = annotate_stream(stream, cfg)
    return (
        annotated.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.count("*").alias("rows_in"),
            F.sum(F.col("keep").cast("long")).alias("rows_kept"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "rows_in",
            "rows_kept",
        )
    )


def conversation_sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per conversation (gap-based) — turn bursts."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_turns",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, query_df: DataFrame, name: str, output_mode: str = "append"
):
    """Drive a bounded directory stream to completion synchronously (tests)."""
    q = (
        query_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival per key,
    with state bounded by the watermark (duplicates arriving later than
    the watermark horizon are no longer deduplicated — the documented
    trade of bounded state for bounded-lateness exactness).

    The streaming member of the dedup family (batch exact route:
    dedup_exact hash-groupBy). ``dropDuplicatesWithinWatermark`` expires
    key state once the watermark passes, so memory is proportional to
    the key arrival rate times the horizon, never the stream length.
    """
    return stream.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def foreach_batch_upsert(
    stream: DataFrame,
    io,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    order_col: str = "ts",
):
    """Streaming MERGE sink: each micro-batch upserts into the target via
    the same merge_upsert used by batch (idempotent per key, so a
    replayed micro-batch after a crash re-merges to the same state —
    end-to-end exactly-once for keyed output). A micro-batch can carry
    the same key several times (MERGE requires unique source keys), so
    each batch is compacted latest-wins on ``order_col`` first. The
    streaming analog of the reference's ON DUPLICATE KEY UPDATE
    writeback (plugins/services/reconciliation_runner.py:285-426)."""
    from ..sources.merge import latest_wins_dedup, merge_upsert

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        compacted = latest_wins_dedup(batch_df, keys, order_col)
        merge_upsert(batch_df.sparkSession, io, compacted, table, keys)

    return (
        stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def full_pipeline_stream(
    stream: DataFrame,
    cfg: QualityConfig = DEFAULT_CONFIG,
    reorder_watermark: str | None = None,
    reorder_inversion_tolerance_sec: float = 600.0,
) -> DataFrame:
    """The COMPLETE filter+scrub pipeline as a continuous query — the
    streaming twin of ``plans.pipeline.run_pipeline``.

    Stage order flips relative to batch (conversation flags FIRST, via
    the conv_id-keyed stateful operator, then the narrow per-turn
    stages): the batch window becomes ``applyInPandasWithState`` carrying
    one boundary row per conversation, and everything downstream —
    feature flags, the Arrow-batched scorer, decision, scrub — is
    stateless and identical to batch. Under the tracker's arrival-order
    contract the output rows equal ``run_pipeline`` exactly
    (parity-tested per turn in tests/test_streaming.py).

    Note: the stateful stage always emits all three conversation flags;
    a cfg that disables one of the enforce_* switches diverges from the
    batch plan only if that reason is also in ``dropping_reasons``
    (not the shipped configs).

    ``reorder_watermark``: when set (e.g. ``'1 hour'``), the arrival-
    order contract is DROPPED — rows buffer in the watermark reorder
    operator and emit in (turn_idx, ts) order once the event-time
    watermark passes them, so any delivery permutation with event-time
    disorder inside the delay still matches batch exactly (Kafka /
    multi-writer sources). When None (default), the in-order tracker
    runs with zero buffering latency.
    """
    from ..operators.decide import with_decision
    from ..plans.pipeline import annotate_turns
    from ..schema import DROP_REASONS
    from .stateful import conversation_flags_reordering, conversation_flags_stateful

    if reorder_watermark is not None:
        conv = conversation_flags_reordering(
            stream.withWatermark("ts", reorder_watermark),
            inversion_tolerance_sec=reorder_inversion_tolerance_sec,
        )
    else:
        conv = conversation_flags_stateful(stream)
    # udf_first=False: the stateful operator's output rows are not
    # UnsafeRow, and ArrowEvalPython's pass-through queue requires
    # UnsafeRow children — the flags projection below the UDF is the
    # conversion barrier (the batch plan, whose child is a scan/Project,
    # uses the faster UDF-first order).
    annotated = annotate_turns(conv, cfg, udf_first=False)
    decided = with_decision(
        annotated, cfg, {r: r for r in DROP_REASONS if r in annotated.columns}
    )
    return decided.withColumn(
        "scrubbed_text", F.when(F.col("keep"), scrub_text(F.col("text")))
    )
