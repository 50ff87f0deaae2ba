"""Conversation-level (windowed) checks and aggregates.

The Spark re-expression of the reference's per-group chain-continuity
checks (reference: plugins/dq_lib/consistency.py:61-139 ``shift(1).over``
per vehicle) as ``F.lag().over(Window.partitionBy('conv_id')
.orderBy('turn_idx','ts'))`` — role alternation, tool-chain integrity and
timestamp ordering over multi-turn transcripts.

Scale note: this is the ONE stage that requires co-locating each
conversation (a shuffle on conv_id). Per-turn feature stages are narrow
and run before it so the shuffle moves already-annotated rows exactly
once. Window ordering cannot be salted; for bounded conversations the
plain (conv_id) window streams fine and AQE handles residual imbalance.
For pathological conversation lengths, ``conversation_bucket_turns``
switches to ``with_conversation_flags_bucketed``: windows keyed
(conv_id, turn-bucket) + a tiny bucket-tail merge, capping per-task work
at the bucket size with identical output flags (parity-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import QualityConfig

TURN_ORDER = ("turn_idx", "ts")


def conversation_window() -> Window:
    return Window.partitionBy("conv_id").orderBy(*TURN_ORDER)


def _flags_from_prev(cfg: QualityConfig, prev_role: Column, prev_ts: Column) -> dict[str, Column]:
    """The flag formulas over explicit predecessor expressions — shared by
    the plain window path and the bucketed path (whose predecessors come
    from a within-bucket lag merged with the previous bucket's tail)."""
    flags: dict[str, Column] = {}
    if cfg.enforce_role_alternation:
        flags["bad_role_sequence"] = (
            F.col("role").isin("user", "assistant") & (prev_role == F.col("role"))
        )
    if cfg.enforce_tool_chain:
        flags["broken_tool_chain"] = (F.col("role") == "tool") & (
            prev_role.isNull() | ~prev_role.isin("assistant", "tool")
        )
    if cfg.enforce_ts_order:
        flags["out_of_order_ts"] = F.col("ts") < prev_ts
    return {k: F.coalesce(v, F.lit(False)) for k, v in flags.items()}


def conversation_flag_columns(cfg: QualityConfig) -> dict[str, Column]:
    """Boolean flags computed over the conversation window.

    bad_role_sequence — same speaking role (user/assistant) twice in a row
      (reference analog: consecutive-cycle continuity violation,
      plugins/dq_lib/consistency.py:96-118).
    broken_tool_chain — a tool turn not preceded by an assistant/tool turn.
    out_of_order_ts — timestamp regresses within the conversation.
    """
    w = conversation_window()
    return _flags_from_prev(cfg, F.lag("role").over(w), F.lag("ts").over(w))


def with_conversation_flags(df: DataFrame, cfg: QualityConfig) -> DataFrame:
    if cfg.conversation_bucket_turns:
        return with_conversation_flags_bucketed(
            df, cfg, cfg.conversation_bucket_turns
        )
    out = df
    for name, col in conversation_flag_columns(cfg).items():
        out = out.withColumn(name, col)
    return out


def with_conversation_flags_bucketed(
    df: DataFrame, cfg: QualityConfig, bucket_turns: int
) -> DataFrame:
    """Conversation flags with secondary bucketing for extreme skew
    (SURVEY hard part #2): a window over (conv_id) streams, but one task
    still owns the WHOLE longest conversation — AQE can split skewed
    join partitions, not window partitions. Here the window keys are
    (conv_id, bucket) with bucket = floor(turn_idx / bucket_turns), so
    the per-task ceiling is bucket_turns rows.

    The lag(1) each flag needs crosses bucket boundaries only at the
    FIRST row of each bucket; the merge step supplies it from a tiny
    bucket-tails table (one row per bucket — 1/bucket_turns of the data)
    lagged per conversation and joined back on (conv_id, bucket). Output
    flags are identical to the unbucketed path (parity-tested); cost is
    one extra small shuffle + a join, which is the price of capping the
    straggler.
    """
    staged = df.withColumn(
        "__cbkt", F.floor(F.col("turn_idx") / F.lit(bucket_turns)).cast("long")
    )
    wb = Window.partitionBy("conv_id", "__cbkt").orderBy(*TURN_ORDER)
    staged = (
        staged.withColumn("__prev_role_in", F.lag("role").over(wb))
        .withColumn("__prev_ts_in", F.lag("ts").over(wb))
        .withColumn("__first_in_bkt", F.row_number().over(wb) == 1)
    )
    # bucket tails: the last row of every (conv, bucket) — tiny relative
    # to the data; lag over buckets handles sparse turn_idx (the previous
    # NON-EMPTY bucket supplies the tail, not literally bucket-1)
    wt = Window.partitionBy("conv_id", "__cbkt").orderBy(
        *[F.col(c).desc() for c in TURN_ORDER]
    )
    tails = (
        staged.withColumn("__rnt", F.row_number().over(wt))
        .filter(F.col("__rnt") == 1)
        .select(
            "conv_id",
            "__cbkt",
            F.col("role").alias("__tail_role"),
            F.col("ts").alias("__tail_ts"),
        )
    )
    wprev = Window.partitionBy("conv_id").orderBy("__cbkt")
    prev_tails = tails.select(
        "conv_id",
        "__cbkt",
        F.lag("__tail_role").over(wprev).alias("__ptail_role"),
        F.lag("__tail_ts").over(wprev).alias("__ptail_ts"),
    )
    merged = staged.join(prev_tails, on=["conv_id", "__cbkt"], how="left")
    prev_role = F.when(
        F.col("__first_in_bkt"), F.col("__ptail_role")
    ).otherwise(F.col("__prev_role_in"))
    prev_ts = F.when(F.col("__first_in_bkt"), F.col("__ptail_ts")).otherwise(
        F.col("__prev_ts_in")
    )
    out = merged
    for name, col in _flags_from_prev(cfg, prev_role, prev_ts).items():
        out = out.withColumn(name, col)
    return out.drop(
        "__cbkt",
        "__prev_role_in",
        "__prev_ts_in",
        "__first_in_bkt",
        "__ptail_role",
        "__ptail_ts",
    )


def group_broadcast(df: DataFrame, key: str, aggs: dict[str, Column]) -> DataFrame:
    """Unbounded-window aggregates broadcast to every row of the group —
    the reference's ``sum(x).over('shift_date')`` daily_* fields
    (reference: plugins/configs/adapters/cycle_adapter.yaml daily_total_*).
    """
    w = Window.partitionBy(key)
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def top1_per_group(df: DataFrame, key: str, order: Column | list[Column]) -> DataFrame:
    """Best row per group via row_number — the reference's
    ``sort().unique(keep='first')`` dedup (reference: plugins/dq_lib/
    reconciliation.py:345)."""
    orders = order if isinstance(order, list) else [order]
    w = Window.partitionBy(key).orderBy(*orders)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def compact_consecutive_runs(
    df: DataFrame, part_key: str, order_col: str, run_col: str
) -> DataFrame:
    """Gaps-and-islands: collapse consecutive rows with the same ``run_col``
    value into one row (keep the last of each run) — the pure-window
    rewrite of the reference's pandas adjacency loop (reference:
    archive/dags/DatalogLogicCheck_worker_dag.py:90-168).
    """
    w = Window.partitionBy(part_key).orderBy(order_col)
    w_run = Window.partitionBy(part_key, run_col).orderBy(order_col)
    island = F.row_number().over(w) - F.row_number().over(w_run)
    w_island = Window.partitionBy(part_key, run_col, "__island").orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__island", island)
        .withColumn("__rn", F.row_number().over(w_island))
        .filter(F.col("__rn") == 1)
        .drop("__island", "__rn")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_sec: int,
    order_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Event-time sessionization in batch: rows of one ``key`` belong to
    the same session while consecutive gaps stay within ``gap_sec``.

    Gaps-and-islands over the key window (one shuffle): new-session
    marker via lag, running sum -> session number. The batch counterpart
    of Structured Streaming's session windows; the reference's closest
    analog is the shift-based chain-continuity check
    (plugins/dq_lib/consistency.py:61-139) whose gap predicate becomes
    the session boundary here.

    Adds: session_no (1-based per key), session-scoped rows retain all
    input columns.
    """
    w = Window.partitionBy(key).orderBy(ts_col, *order_extra)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-precision gap: unix_timestamp truncates to whole
    # seconds, which mis-classifies gaps within 1s of the boundary and
    # diverges from interval comparison in other engines (recon.py uses
    # unix_micros for the same reason). The cast covers TIMESTAMP_NTZ
    # inputs (parquet default) — identical wall-clock under the UTC
    # session; unix_micros itself rejects NTZ.
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    new_session = (
        prev_ts.isNull()
        # int() AFTER scaling to microseconds: fractional gap thresholds
        # (gap_sec=0.5, 1800.5) keep their sub-second part
        | (_us(F.col(ts_col)) - _us(prev_ts) > F.lit(int(gap_sec * 1_000_000)))
    ).cast("long")
    run = Window.partitionBy(key).orderBy(ts_col, *order_extra).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_no", F.sum(new_session).over(run))


def session_bounds(
    sessions: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """Per-session rollup: start/end/duration/row count (reuses the key
    partitioning from sessionize — no second full shuffle)."""
    return sessions.groupBy(key, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def sft_examples(
    transcripts: DataFrame, response_role: str = "assistant"
) -> DataFrame:
    """Flatten conversations into supervised fine-tuning examples: one
    row per ``response_role`` turn, pairing the turn's text (the
    response/label) with the concatenated prior context in stable
    (turn_idx) order — the transcript-to-training-example step an LLM
    data pipeline runs after filter+scrub, producing what the trainer
    actually consumes.

    Context lines are "role: text" joined by newlines; a response with
    no prior turns gets context_text = '' (first-turn generations are
    kept, flagged by n_context_turns = 0, for the caller to filter).

    Shape: one conv_id window pass (the same single Exchange the
    pipeline's conversation stage rides) — context assembly is a
    running collect_list per partition, then a narrow filter. At 100 TB
    the context column is O(conversation length) per row; cap
    downstream with split_long_docs if examples must bound at a context
    window.

    Returns (conv_id, turn_idx, n_context_turns INT, context_text,
    response_text).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL text coalesces to '' so all three surfaces agree: concat_ws
    # would silently DROP a null operand here (shorter line), SQL
    # string_agg would drop the whole line, and the streaming twin's
    # pandas str() would render 'None' — three different contexts for
    # the same conversation
    txt = F.coalesce(F.col("text"), F.lit(""))
    line = F.concat_ws(": ", F.col("role"), txt)
    return (
        transcripts.withColumn("__ctx", F.collect_list(line).over(w))
        .where(F.col("role") == response_role)
        .select(
            "conv_id",
            "turn_idx",
            F.size("__ctx").cast("int").alias("n_context_turns"),
            F.concat_ws("\n", F.col("__ctx")).alias("context_text"),
            txt.alias("response_text"),
        )
    )
