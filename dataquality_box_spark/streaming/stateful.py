"""Custom stateful streaming operator: per-conversation running state.

``applyInPandasWithState`` tracker that carries (last_role, n_turns,
n_violations) per conv_id across micro-batches — the Spark-native version
of the reference's incremental watermark scan + per-vehicle chain check
(reference: dags/scanner_cactus_monitor.py:44-109 watermark state;
plugins/dq_lib/consistency.py:96-118 shift-per-group continuity): instead
of persisting a watermark Variable and re-querying overlap windows, the
state store holds exactly the cross-batch boundary row each group needs.

Everything inside the update function is vectorized pandas (shift/compare
over the whole batch); the only per-group Python is the state get/put —
the "no per-row Python" invariant holds.

Determinism contract: rows for a conversation must ARRIVE in turn order
across micro-batches (within a batch they are sorted here). Callers get
that by streaming time-bucketed files with monotone modification times —
see ``write_time_ordered_buckets``. Under that contract the cumulative
totals equal the batch SQL ``lag(role) over (partition by conv_id order
by ts, event_id)`` computation exactly, which is what makes this operator
strongly oracle-checkable despite being stateful.

For sources that CANNOT guarantee in-order arrival (Kafka, multi-writer
ingest), ``flag_turns_reordering`` lifts the contract: rows buffer in
state until the event-time watermark passes them, then emit in
(turn_idx, ts) order — exact batch parity for any arrival permutation
whose event-time disorder is within the watermark delay (tested with
fully shuffled bucket delivery).
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

OUTPUT_SCHEMA = "conv_id string, n_turns long, n_violations long"
STATE_SCHEMA = "last_role string, n_turns long, n_violations long"

# roles whose immediate repetition counts as a violation (alternation rule)
_ALTERNATING_ROLES = ("user", "assistant")


def update_conversation_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one micro-batch of turns for one conv_id into running state.

    Emits ONE cumulative row per (conv_id, micro-batch); totals are
    monotone, so the stream-end value per conv is simply the max.
    """
    (conv_id,) = key
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if "event_id" in pdf.columns:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    else:
        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")

    last_role, n_turns, n_violations = (
        state.get if state.exists else (None, 0, 0)
    )
    roles = pdf["role"].reset_index(drop=True)
    prev = roles.shift(1)
    if last_role is not None and len(prev) > 0:
        prev.iloc[0] = last_role
    viol = int((roles.isin(_ALTERNATING_ROLES) & (prev == roles)).sum())

    n_turns += len(pdf)
    n_violations += viol
    state.update((str(roles.iloc[-1]) if len(roles) else last_role, n_turns, n_violations))
    yield pd.DataFrame(
        [{"conv_id": conv_id, "n_turns": n_turns, "n_violations": n_violations}]
    )


def conversation_state_updates(turns_stream: DataFrame) -> DataFrame:
    """Apply the stateful tracker to a streaming frame of turns.

    Input needs columns conv_id, role, ts and (event_id | turn_idx) for
    the within-batch sort.
    """
    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        update_conversation_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_totals(updates: DataFrame) -> DataFrame:
    """Stream-end totals per conversation from the cumulative update rows."""
    return updates.groupBy("conv_id").agg(
        F.max("n_turns").alias("n_turns"),
        F.max("n_violations").alias("n_violations"),
    )


FLAGGED_TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, bad_role_sequence boolean, broken_tool_chain boolean, "
    "out_of_order_ts boolean"
)
FLAG_STATE_SCHEMA = "last_role string, last_ts_us long"


def _flag_block(
    conv_id: str, pdf: pd.DataFrame, last_role, last_ts_us
) -> tuple[pd.DataFrame, str | None, int | None]:
    """Per-turn flags over one (turn_idx, ts)-sorted block given the
    cross-block boundary (last role + last ts, micros). Vectorized
    shift/compare; returns the flagged frame and the new boundary.
    Shared by the in-order tracker and the watermark reorder buffer."""
    roles = pdf["role"].reset_index(drop=True)
    ts = pd.to_datetime(pdf["ts"]).reset_index(drop=True)
    prev_role = roles.shift(1)
    prev_ts = ts.shift(1)
    if last_role is not None and len(pdf):
        prev_role.iloc[0] = last_role
    if last_ts_us is not None and len(pdf):
        prev_ts.iloc[0] = pd.Timestamp(int(last_ts_us), unit="us")

    bad_role = (roles.isin(_ALTERNATING_ROLES) & (prev_role == roles)).fillna(False)
    broken_tool = (roles == "tool") & (
        prev_role.isna() | ~prev_role.isin(["assistant", "tool"])
    )
    out_of_order = (ts < prev_ts).fillna(False)

    if len(pdf):
        last_role = str(roles.iloc[-1])
        last_ts_us = int(ts.iloc[-1].value // 1_000)
    out = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pdf["turn_idx"].reset_index(drop=True),
            "role": roles,
            "text": pdf["text"].reset_index(drop=True),
            "tool": pdf["tool"].reset_index(drop=True),
            "ts": ts,
            "bad_role_sequence": bad_role.astype(bool),
            "broken_tool_chain": broken_tool.astype(bool),
            "out_of_order_ts": out_of_order.astype(bool),
        }
    )
    return out, last_role, last_ts_us


def flag_turns_with_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-TURN conversation flags across micro-batches: the streaming
    twin of the batch ``lag`` window. State carries exactly the boundary
    row (last role + last ts) each conversation needs; everything else is
    vectorized shift/compare over the batch. Same arrival-order contract
    as ``update_conversation_state``; all three flags are always
    computed — which of them DROP is the decision stage's concern
    (cfg.dropping_reasons), so the stateful operator stays config-free.
    """
    (conv_id,) = key
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["turn_idx", "ts"], kind="mergesort"
    )
    last_role, last_ts_us = state.get if state.exists else (None, None)
    out, last_role, last_ts_us = _flag_block(conv_id, pdf, last_role, last_ts_us)
    if len(pdf):
        state.update((last_role, last_ts_us))
    yield out


def conversation_flags_stateful(turns_stream: DataFrame) -> DataFrame:
    """Streaming per-turn conversation flags (conv_id-keyed state)."""
    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        flag_turns_with_state,
        outputStructType=FLAGGED_TURNS_SCHEMA,
        stateStructType=FLAG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


REORDER_STATE_SCHEMA = "last_role string, last_ts_us long, buf_json string"


def make_flag_turns_reordering(inversion_tolerance_sec: float = 600.0):
    """Out-of-order-tolerant per-turn flags: a watermark reorder buffer.

    Rows are held in state and emit — in (turn_idx, ts) order, through
    the same ``_flag_block`` boundary logic as the in-order tracker —
    only as the watermark-ready PREFIX of the sorted buffer whose rows
    satisfy ``ts <= watermark - inversion_tolerance``. Emission must be
    a prefix cut, never a filter: a blocked row blocks everything that
    sorts after it, else a later-sorting row would emit against the
    wrong predecessor and its flags diverge from batch.

    Exact batch parity holds under TWO explicit disorder bounds:

      1. arrival lateness: every row arrives before the watermark passes
         its ``ts`` (the ``withWatermark`` delay — standard);
      2. turn/event-time inversion: within a conversation, a turn's ts
         exceeds any LATER turn's ts by at most
         ``inversion_tolerance_sec`` (sort order is (turn_idx, ts), so
         a not-yet-arrived row can sort BEFORE a buffered row whose own
         ts the watermark already passed; holding rows an extra
         tolerance window makes that impossible — any such future row
         would have to be out-of-contract late).

    Rows violating the bounds are not lost (Spark does not filter late
    rows for arbitrary stateful ops — verified), but emit in a later
    flush where flags relative to already-emitted neighbors may differ
    from batch: the standard bounded-lateness trade.

    Buffered tails flush when the watermark advances — via later
    arrivals, Spark's no-data micro-batches, or the next incremental run
    against the same checkpoint (EventTimeTimeout fires a row-less
    invocation; verified under availableNow). The buffer is JSON in the
    state store: per-conversation and watermark-bounded, so its size is
    arrival-rate x (delay + tolerance), never the stream length.
    """
    import json

    tol_us = int(inversion_tolerance_sec * 1_000_000)

    def flag_turns_reordering(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        last_role, last_ts_us, buf_json = (
            state.get if state.exists else (None, None, "[]")
        )
        buf = json.loads(buf_json or "[]")
        if not state.hasTimedOut:
            for pdf in pdfs:
                for r in pdf.itertuples(index=False):
                    ts_us = int(pd.Timestamp(r.ts).value // 1_000)
                    # NaN -> None so nullable strings survive the JSON trip
                    tool = None if pd.isna(r.tool) else str(r.tool)
                    text = None if pd.isna(r.text) else str(r.text)
                    buf.append([int(r.turn_idx), str(r.role), text, tool, ts_us])
        wm_us = state.getCurrentWatermarkMs() * 1_000
        horizon = wm_us - tol_us
        buf.sort(key=lambda b: (b[0], b[4]))
        n_ready = 0
        while n_ready < len(buf) and buf[n_ready][4] <= horizon:
            n_ready += 1
        ready, rest = buf[:n_ready], buf[n_ready:]
        if ready:
            block = pd.DataFrame(
                {
                    "turn_idx": pd.array([b[0] for b in ready], dtype="int32"),
                    "role": [b[1] for b in ready],
                    "text": [b[2] for b in ready],
                    "tool": [b[3] for b in ready],
                    "ts": [pd.Timestamp(b[4], unit="us") for b in ready],
                }
            )
            out, last_role, last_ts_us = _flag_block(
                conv_id, block, last_role, last_ts_us
            )
            yield out
        state.update((last_role, last_ts_us, json.dumps(rest)))
        if rest:
            # wake when the watermark can next have moved past buffered
            # rows (must be strictly above the current watermark)
            wm_ms = wm_us // 1_000
            state.setTimeoutTimestamp(max(wm_ms + 1, 1))

    return flag_turns_reordering


def conversation_flags_reordering(
    turns_stream: DataFrame, inversion_tolerance_sec: float = 600.0
) -> DataFrame:
    """Streaming per-turn conversation flags WITHOUT the arrival-order
    contract: watermark reorder buffer per conversation. The input must
    already carry ``withWatermark('ts', <delay>)`` with a delay covering
    the source's worst arrival lateness; ``inversion_tolerance_sec``
    must cover the worst intra-conversation turn/event-time inversion
    (see ``make_flag_turns_reordering``)."""
    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        make_flag_turns_reordering(inversion_tolerance_sec),
        outputStructType=FLAGGED_TURNS_SCHEMA,
        stateStructType=REORDER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def write_time_ordered_buckets(
    df: DataFrame, out_dir: str, n_buckets: int = 4, order_cols: tuple[str, ...] = ("ts",)
) -> str:
    """Materialize ``df`` as n time-ordered parquet files with monotone
    mtimes so a file stream replays rows in event-time order — the arrival
    contract the stateful tracker needs (and the incremental-batch analog
    of the reference's 8h watermark clamp windows).

    Test/oracle-only helper: it relies on FileStreamSource picking files
    oldest-mtime-first (observed Spark 3.x/4.x behavior with
    latestFirst=false, not a documented contract) and uses an unpartitioned
    global-sort window, which is fine for bounded replay but not a scale
    path. At scale the equivalent ordering comes from the ingest table's
    time partitioning.
    """
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # contiguous event-time ranges per file (global sort is fine here: this
    # helper exists for bounded replay/testing; at scale the bucketing is
    # the ingest table's natural time partitioning)
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    n = df.count()
    per = max(1, (n + n_buckets - 1) // n_buckets)
    bucketed = df.withColumn(
        "__b", ((F.row_number().over(w) - 1) / per).cast("int")
    )
    for b in range(n_buckets):
        part_dir = os.path.join(out_dir, f"_stage_{b}")
        bucketed.filter(F.col("__b") == b).drop("__b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        src = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        if src:
            dst = os.path.join(out_dir, f"bucket_{b:02d}.parquet")
            shutil.move(src[0], dst)
            os.utime(dst, (1_000_000 + b * 1000, 1_000_000 + b * 1000))
        shutil.rmtree(part_dir, ignore_errors=True)
    return out_dir


SFT_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, n_context_turns int, "
    "context_text string, response_text string"
)
SFT_STATE_SCHEMA = "ctx string, n long"


def make_sft_extractor(response_role: str = "assistant"):
    """Stateful streaming twin of conversation.sft_examples: per-conv
    state carries the running context (joined "role: text" lines + turn
    count), so each arriving ``response_role`` turn emits its training
    example the moment it lands — examples stream out incrementally
    instead of waiting for conversation end.

    Arrival-order contract: turns arrive in turn_idx order per conv
    across micro-batches (same contract as flag_turns_with_state;
    compose the watermark reorder buffer upstream for out-of-order
    sources). State grows with conversation length — identical to the
    batch operator's per-row context cost, bounded by the max
    conversation, not the stream.
    """

    def extract(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "turn_idx", kind="mergesort"
        )
        ctx, n = state.get if state.exists else ("", 0)
        # NULL text -> '' (matching batch sft_examples' coalesce; str()
        # of a pandas NaN/None would render 'None'/'nan' in the context)
        txt = pdf["text"].fillna("").astype(str)
        lines = (pdf["role"].astype(str) + ": " + txt).tolist()
        out = []
        for i, (role, tidx, text) in enumerate(
            zip(pdf["role"], pdf["turn_idx"], txt)
        ):
            if role != response_role:
                continue
            batch_ctx = "\n".join(lines[:i])
            full_ctx = (
                ctx + "\n" + batch_ctx if (ctx and batch_ctx) else ctx or batch_ctx
            )
            out.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": int(tidx),
                    "n_context_turns": int(n + i),
                    "context_text": full_ctx,
                    "response_text": str(text),
                }
            )
        all_lines = "\n".join(lines)
        new_ctx = ctx + "\n" + all_lines if (ctx and all_lines) else ctx or all_lines
        state.update((new_ctx, n + len(pdf)))
        if out:
            yield pd.DataFrame(out)

    return extract


def sft_examples_stream(
    turns_stream: DataFrame, response_role: str = "assistant"
) -> DataFrame:
    """Apply the streaming SFT extractor (needs conv_id, turn_idx, role,
    text columns)."""
    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        make_sft_extractor(response_role),
        outputStructType=SFT_OUTPUT_SCHEMA,
        stateStructType=SFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
