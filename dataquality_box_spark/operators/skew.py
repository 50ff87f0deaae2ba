"""Skew handling: salting helpers + salted two-phase aggregation.

The reference serializes its way around contention (max_active_tasks=1,
fixed 10-vehicle shards — reference: dags/reconciliation_worker_dag.py:
39-63); on Spark the equivalents are AQE skew-join splitting (enabled in
session.py) plus explicit conv_id salting for order-free grouped stages
over skewed keys (whale conversations), per the north rule.

Salting is only for ORDER-FREE aggregations. The conversation window
(role alternation etc.) must see whole conversations and stays unsalted;
its skew exposure is bounded because windows stream per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from a stable row attribute (turn_idx if
    present, else a hash of all columns) — no rand(), so re-runs are
    idempotent and resume-safe."""
    basis = F.col("turn_idx") if "turn_idx" in df.columns else F.hash(*df.columns)
    return df.withColumn(salt_col, F.pmod(basis.cast("long"), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    finals: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial agg on (key, salt), final on key.

    ``aggs`` maps intermediate name -> partial aggregate expression;
    ``finals`` maps output name -> final expression over the partials.
    Example (count + sum):
        salted_agg(df, "conv_id",
                   {"c": F.count("*"), "s": F.sum("x")},
                   {"n_rows": F.sum("c"), "total": F.sum("s")})
    """
    salted = with_salt(df, key, n_salts)
    partial = salted.groupBy(key, "__salt").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return partial.groupBy(key).agg(*[c.alias(n) for n, c in finals.items()])


def key_skew_report(df: DataFrame, key: str, factor: int = 4) -> DataFrame:
    """Skew DIAGNOSTIC: per-key row counts with an integer-exact hot-key
    flag — run before a shuffle-heavy stage to decide whether the
    salting path above (or conversation.py's secondary bucketing) is
    needed for this input.

    A key is hot when its row count exceeds ``factor`` times the mean
    rows-per-key, compared in integers (n * n_keys > factor * total) so
    Spark and DuckDB agree bit-for-bit; share_ppm is integer division.

    Shape: one map-side-combinable count agg + a broadcast single-row
    totals frame; output is keyspace-sized, never corpus-sized.

    Returns (key, n_rows INT, share_ppm BIGINT, hot INT).
    """
    counts = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total"), F.count("*").alias("n_keys")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        key,
        F.col("n_rows").cast("int").alias("n_rows"),
        F.expr("(n_rows * 1000000) div total").alias("share_ppm"),
        (
            F.col("n_rows") * F.col("n_keys") > F.lit(factor) * F.col("total")
        ).cast("int").alias("hot"),
    )
