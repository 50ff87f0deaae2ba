"""Agent-transcript trace analysis: loop detection, self-repetition,
adjacent-turn artifacts, conversation-level near-dup.

LLM agent logs carry failure shapes plain web text doesn't: an agent
retrying the same tool in a tight loop, an assistant restating its
previous answer nearly verbatim, a streaming writer emitting a turn and
then its extended version (prefix artifact), and whole conversations that
are near-copies of each other (shared scaffold, template traffic). Each
operator here detects one of those shapes with plain DataFrame ops — one
conv_id-keyed shuffle each, no Python in the hot path — and each has an
exact DuckDB twin registered in driver_queries.py.

Reference analog: the reference validates per-record sequences in its
reconciliation rules (plugins/dq_lib/reconciliation.py:349-434); these
operators re-express that family for multi-turn agent traces at
10^12-turn scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_loops(df: DataFrame, min_run: int = 2) -> DataFrame:
    """Runs of ADJACENT turns in one conversation with the identical
    (role, tool) signature — the "agent stuck in a retry loop" shape.

    Gaps-and-islands: island = turn_idx - row_number() within
    (conv_id, role, tool) ordered by turn_idx; adjacent turns with the
    same signature share an island. One hash partition on conv_id (the
    window), then a hash agg on a superset of the same key — at scale the
    agg reuses the window's partitioning, so the whole operator is one
    shuffle however many turns a conversation has.

    Returns (conv_id, role, tool, run_start, run_len) for runs with
    run_len >= min_run, tool normalized to '' for non-tool turns.
    """
    # materialize the signature BEFORE the window so the window's
    # partitioning attribute and the groupBy key are the same attribute —
    # otherwise Catalyst can't prove they match and inserts a second
    # Exchange (plan-asserted in test_agentic)
    sig = df.select(
        "conv_id", "role", F.coalesce(F.col("tool"), F.lit("")).alias("tool_sig"), "turn_idx"
    )
    w = Window.partitionBy("conv_id", "role", "tool_sig").orderBy("turn_idx")
    islands = sig.withColumn(
        "__island", F.col("turn_idx") - F.row_number().over(w)
    )
    return (
        islands.groupBy("conv_id", "role", "tool_sig", "__island")
        .agg(
            F.min("turn_idx").alias("run_start"),
            F.count("*").cast("int").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
        .select("conv_id", "role", "tool_sig", "run_start", "run_len")
    )


def self_repetition(df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Token-set Jaccard between each turn and the PREVIOUS turn of the
    same role in the same conversation — the "assistant restating itself"
    shape near-dup turn hashing misses (paraphrase with shared vocabulary
    scores high here while hashing exactly).

    Narrow token split + one window shuffle; the Jaccard is JVM-side
    array arithmetic (array_intersect/array_union on distinct sets), no
    UDF. Returns flagged turns only: (conv_id, turn_idx, role,
    jacc_prev DOUBLE round 6, near_repeat INT).
    """
    # array_remove, not filter(lambda): HOF lambdas are interpreted via a
    # shared NamedLambdaVariable and serialize across task threads
    toks = F.array_distinct(
        F.array_remove(F.split(F.col("text"), "[ \t\n\r]+"), "")
    )
    w = Window.partitionBy("conv_id", "role").orderBy("turn_idx")
    t = df.select("conv_id", "turn_idx", "role", toks.alias("toks")).withColumn(
        "prev_toks", F.lag("toks").over(w)
    )
    inter = F.size(F.array_intersect("toks", "prev_toks"))
    union = F.size(F.array_union("toks", "prev_toks"))
    jacc = F.round(
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
    )
    return (
        t.filter(F.col("prev_toks").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            "role",
            jacc.alias("jacc_prev"),
            (jacc >= threshold).cast("int").alias("near_repeat"),
        )
        .filter(F.col("jacc_prev") > 0)
    )


def adjacent_artifacts(df: DataFrame) -> DataFrame:
    """Adjacent-turn streaming artifacts within a conversation: the next
    turn is an exact duplicate of this one, or a strict extension (this
    turn's text is a proper prefix of the next — a partially-flushed
    write followed by the full turn).

    Prefix test is substring equality (left(next, len(cur)) = cur), the
    ANSI form both engines evaluate identically. One window shuffle.
    Returns (conv_id, turn_idx, role, relation, len_cur, len_next).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = df.select("conv_id", "turn_idx", "role", "text").withColumn(
        "next_text", F.lead("text").over(w)
    )
    cur_len = F.length("text")
    nxt_len = F.length("next_text")
    # substring with a column-valued length needs expr form
    prefix_match = F.expr("substring(next_text, 1, length(text)) = text")
    relation = F.when(F.col("next_text") == F.col("text"), F.lit("exact_dup")).when(
        (nxt_len > cur_len) & prefix_match, F.lit("prefix")
    )
    return (
        t.filter(F.col("next_text").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            "role",
            relation.alias("relation"),
            cur_len.cast("int").alias("len_cur"),
            nxt_len.cast("int").alias("len_next"),
        )
        .filter(F.col("relation").isNotNull())
    )


def conversation_pair_jaccard(
    df: DataFrame, threshold: float = 0.5, max_df: int = 50
) -> DataFrame:
    """Conversation-level near-dup candidates: Jaccard over each
    conversation's SET of distinct turn-text hashes, computed pair-wise
    only for conversations that share at least one hash.

    Bucket-first shape (the repo's standard dedup route): candidate
    pairs come from a self-join on the 16-byte turn hash, never a global
    cross join, so pair work is Σ per-hash conv-count². Hashes appearing
    in more than ``max_df`` conversations are dropped from the candidate
    join (document-frequency cap — a boilerplate turn shared by thousands
    of conversations says nothing about pair similarity and would go
    quadratic); they still count in each conversation's set size, so the
    Jaccard denominator stays honest and the cap only LOWERS recall for
    pairs whose entire overlap is boilerplate.

    Returns (conv_a, conv_b, shared INT, size_a INT, size_b INT,
    jaccard DOUBLE round 6) for jaccard >= threshold.
    """
    hashes = df.select(
        "conv_id", F.md5(F.col("text")).alias("h")
    ).distinct()  # set semantics per conversation
    sizes = hashes.groupBy("conv_id").agg(F.count("*").cast("int").alias("sz"))
    rare = hashes.join(
        hashes.groupBy("h").agg(F.countDistinct("conv_id").alias("df")).filter(
            F.col("df") <= max_df
        ),
        "h",
        "inner",
    ).select("conv_id", "h")
    a, b = rare.alias("a"), rare.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.conv_id") < F.col("b.conv_id")))
        .groupBy(F.col("a.conv_id").alias("conv_a"), F.col("b.conv_id").alias("conv_b"))
        .agg(F.count("*").cast("int").alias("shared"))
    )
    sa = sizes.select(F.col("conv_id").alias("conv_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("conv_id").alias("conv_b"), F.col("sz").alias("size_b"))
    jacc = F.round(
        F.col("shared").cast("double")
        / (F.col("size_a") + F.col("size_b") - F.col("shared")),
        6,
    )
    return (
        shared.join(sa, "conv_a")
        .join(sb, "conv_b")
        .select("conv_a", "conv_b", "shared", "size_a", "size_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def role_token_share(
    df: DataFrame, lo: float = 0.1, hi: float = 0.9
) -> DataFrame:
    """Per-conversation token share by role — the "degenerate dialogue"
    shape: a conversation whose assistant produced >hi of all tokens is a
    monologue (likely a dump or a runaway generation); <lo means the
    assistant barely spoke (dead weight for dialogue training). Both tails
    are flagged for the curation funnel.

    Narrow token count per turn, then ONE conv_id hash agg with
    conditional sums — no window, no second shuffle. Returns one row per
    conversation: (conv_id, n_turns INT, total_toks INT, assistant_toks
    INT, user_toks INT, assistant_share DOUBLE round 6, degenerate INT).
    """
    n_toks = F.size(
        F.array_remove(F.split(F.col("text"), "[ \t\n\r]+"), "")
    )
    per_turn = df.select("conv_id", "role", n_toks.alias("n_toks"))
    share = F.round(
        F.sum(F.when(F.col("role") == "assistant", F.col("n_toks")).otherwise(0))
        / F.sum("n_toks").cast("double"),
        6,
    )
    return (
        per_turn.groupBy("conv_id")
        .agg(
            F.count("*").cast("int").alias("n_turns"),
            F.sum("n_toks").cast("int").alias("total_toks"),
            F.sum(F.when(F.col("role") == "assistant", F.col("n_toks")).otherwise(0))
            .cast("int")
            .alias("assistant_toks"),
            F.sum(F.when(F.col("role") == "user", F.col("n_toks")).otherwise(0))
            .cast("int")
            .alias("user_toks"),
            share.alias("assistant_share"),
        )
        .withColumn(
            "degenerate",
            (
                (F.col("assistant_share") > hi) | (F.col("assistant_share") < lo)
            ).cast("int"),
        )
    )


def turn_latency(df: DataFrame, burst_s: int = 1) -> DataFrame:
    """Per-conversation inter-turn timing profile from the ts column —
    the "synthetic/bot traffic" shape: human conversations have spread-out
    gaps; scripted replays and bulk imports land many turns within the
    same second (bursts), and clock skew shows as NEGATIVE gaps (ordered
    by turn_idx but time runs backwards).

    One conv_id window (lag) feeding one conv_id agg that reuses the
    window's partitioning — a single shuffle at any conversation length.
    Gaps are MICROSECOND integer diffs (unix_micros / epoch_us) so both
    engines agree bit-exactly on sub-second timestamps; the mean divides
    the exact integer sum once. Returns (conv_id, n_gaps INT, mean_gap_s
    DOUBLE round 6, max_gap_us BIGINT, n_bursts INT, n_negative INT).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        # cast handles TIMESTAMP_NTZ parquet columns; the session tz is
        # pinned UTC so the NTZ->instant reading matches DuckDB epoch_us
        df.select(
            "conv_id", "turn_idx",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ep"),
        )
        .withColumn("gap", F.col("ep") - F.lag("ep").over(w))
        .filter(F.col("gap").isNotNull())
    )
    return gaps.groupBy("conv_id").agg(
        F.count("*").cast("int").alias("n_gaps"),
        F.round(F.sum("gap").cast("double") / F.count("*") / 1e6, 6).alias(
            "mean_gap_s"
        ),
        F.max("gap").alias("max_gap_us"),
        F.sum(
            ((F.col("gap") >= 0) & (F.col("gap") < burst_s * 1_000_000)).cast("int")
        ).cast("int").alias("n_bursts"),
        F.sum((F.col("gap") < 0).cast("int")).cast("int").alias("n_negative"),
    )
