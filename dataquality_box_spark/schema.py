"""Schemas and the drop-reason taxonomy.

The transcript turn entity replaces the reference's ``Cycle`` dataclass
(reference: plugins/domain/entities/cycle.py:6-91) — a fixed StructType
instead of an inferred/normalized schema, per BASELINE input_hint:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp).

The drop-reason taxonomy mirrors the reference's severity taxonomy
(reference: plugins/domain/context.py:20-25 P0/P1/P2) re-expressed as
quality-filter reasons (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

ROLES = ("user", "assistant", "system", "tool")

# Ordered taxonomy — drop_reasons arrays are emitted in this order so the
# output is deterministic and comparable across engines.
DROP_REASONS = (
    "too_short",
    "too_long",
    "high_repetition",
    "high_symbol_ratio",
    "boilerplate",
    "bad_role_sequence",
    "broken_tool_chain",
    "out_of_order_ts",
    "wrong_language",
    "high_perplexity",
    "toxicity",
)

# Per-turn (text-only) reasons vs conversation-window reasons — the split
# matters for partitioning: text reasons are embarrassingly parallel (salted
# repartition OK), window reasons need unsalted (conv_id) partitioning.
TEXT_REASONS = (
    "too_short",
    "too_long",
    "high_repetition",
    "high_symbol_ratio",
    "boilerplate",
    "wrong_language",
    "high_perplexity",
    "toxicity",
)
CONVERSATION_REASONS = ("bad_role_sequence", "broken_tool_chain", "out_of_order_ts")

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("rule_id", T.StringType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_kept", T.LongType(), True),
        T.StructField("rows_dropped", T.LongType(), True),
        T.StructField("drop_reason", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("batch_id", T.StringType(), False),
    ]
)

RESULT_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [
        T.StructField("lang", T.StringType(), True),
        T.StructField("ppl", T.DoubleType(), True),
        T.StructField("drop_reasons", T.ArrayType(T.StringType()), False),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("scrubbed_text", T.StringType(), True),
    ]
)
