"""Conversation-level (windowed) checks and aggregates.

The Spark re-expression of the reference's per-group chain-continuity
checks (reference: plugins/dq_lib/consistency.py:61-139 ``shift(1).over``
per vehicle) as ``F.lag().over(Window.partitionBy('conv_id')
.orderBy('turn_idx','ts'))`` — role alternation, tool-chain integrity and
timestamp ordering over multi-turn transcripts.

Scale note: this is the ONE stage that requires co-locating each
conversation (a shuffle on conv_id). Per-turn feature stages are narrow
and run before it so the shuffle moves already-annotated rows exactly
once. Window ordering cannot be salted; long-conversation skew is
bounded because a window over (conv_id) is streamed, not materialized,
and conversations are ≤ a few thousand turns while partitions hold
millions — AQE handles residual imbalance for the join/agg stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import QualityConfig

TURN_ORDER = ("turn_idx", "ts")


def conversation_window() -> Window:
    return Window.partitionBy("conv_id").orderBy(*TURN_ORDER)


def conversation_flag_columns(cfg: QualityConfig) -> dict[str, Column]:
    """Boolean flags computed over the conversation window.

    bad_role_sequence — same speaking role (user/assistant) twice in a row
      (reference analog: consecutive-cycle continuity violation,
      plugins/dq_lib/consistency.py:96-118).
    broken_tool_chain — a tool turn not preceded by an assistant/tool turn.
    out_of_order_ts — timestamp regresses within the conversation.
    """
    w = conversation_window()
    prev_role = F.lag("role").over(w)
    prev_ts = F.lag("ts").over(w)
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


def with_conversation_flags(df: DataFrame, cfg: QualityConfig) -> DataFrame:
    out = df
    for name, col in conversation_flag_columns(cfg).items():
        out = out.withColumn(name, col)
    return out


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
