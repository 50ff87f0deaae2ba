"""Structured Streaming tests: stream results == batch results."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataquality_box_spark.config import DEFAULT_CONFIG
from dataquality_box_spark.streaming.stream import (
    annotate_stream,
    conversation_sessions,
    run_stream_to_memory,
    stream_transcripts,
    windowed_drop_metrics,
)


def _write_corpus(transcripts_pdf, tmp_path) -> str:
    d = str(tmp_path / "stream_in")
    os.makedirs(d, exist_ok=True)
    # several files -> several micro-batches under maxFilesPerTrigger
    n = len(transcripts_pdf)
    for i, lo in enumerate(range(0, n, n // 7 + 1)):
        chunk = transcripts_pdf.iloc[lo : lo + n // 7 + 1]
        chunk.to_parquet(os.path.join(d, f"part-{i}.parquet"), index=False)
    return d


def test_stream_filter_scrub_matches_batch(spark, transcripts_pdf, transcripts_df, tmp_path):
    d = _write_corpus(transcripts_pdf, tmp_path)
    stream = stream_transcripts(spark, d)
    assert stream.isStreaming
    out = run_stream_to_memory(
        spark, annotate_stream(stream, DEFAULT_CONFIG), "stream_scrub"
    )
    # batch twin over the same rows
    from dataquality_box_spark.functions.scrub import scrub_text
    from dataquality_box_spark.functions.text import text_flag_columns

    batch = transcripts_df
    for name, col in text_flag_columns(F.col("text"), DEFAULT_CONFIG).items():
        batch = batch.withColumn(name, col)
    n_keep_stream = out.filter("keep").count()
    flags = ["too_short", "too_long", "high_repetition", "high_symbol_ratio",
             "boilerplate", "toxicity"]
    n_keep_batch = batch.filter(
        ~F.greatest(*[F.col(c) for c in flags])
    ).count()
    assert out.count() == transcripts_df.count()
    assert n_keep_stream == n_keep_batch
    # scrubbed text has no raw PII
    leaked = out.filter(F.col("scrubbed_text").rlike("@example\\.com")).count()
    assert leaked == 0


def test_windowed_metrics_with_watermark(spark, transcripts_pdf, tmp_path):
    d = _write_corpus(transcripts_pdf, tmp_path)
    stream = stream_transcripts(spark, d)
    out = run_stream_to_memory(
        spark, windowed_drop_metrics(stream), "stream_windows", output_mode="append"
    )
    pdf = out.toPandas()
    assert (pdf["rows_kept"] <= pdf["rows_in"]).all()
    # windows cover most rows (final window may be held back by watermark)
    assert pdf["rows_in"].sum() > 0.5 * len(transcripts_pdf)


def test_conversation_sessions(spark, transcripts_pdf, tmp_path):
    d = _write_corpus(transcripts_pdf, tmp_path)
    stream = stream_transcripts(spark, d)
    out = run_stream_to_memory(spark, conversation_sessions(stream), "stream_sessions")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert (pdf["n_turns"] >= 1).all()
    assert (pdf["sess_end"] > pdf["sess_start"]).all()
