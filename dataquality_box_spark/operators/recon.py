"""Tolerance-join reconciliation operators (as-of / range / two-tier).

Spark-first re-expression of the reference's two-tier matcher
(reference: plugins/dq_lib/reconciliation.py:231-348):
  L1 strict  — Polars ``join_asof(strategy='nearest', tolerance='5m',
               by=vehicle)`` becomes equi-join on the group key + an
               ``abs(Δt) <= tol`` predicate + row_number over abs(Δt)
               (no native as-of join in Spark; the window-rank pattern
               is the idiomatic equivalent and AQE handles skew).
  L2 loose   — wider tolerance + a set-overlap predicate
               (``array_intersect``), best candidate per left row.

At scale: the equi-join on the group key shuffles both sides once; the
tolerance predicate prunes pairs before the rank window. Never a
cartesian product (the reference makes the same point at
reconciliation.py:278-288).

Contract: ``left_id`` must be a unique, non-null key of the left frame.
The join-back after the rank is on ``left_id`` alone — joining back on
every left column would use null-unsafe equality, so a left row with a
NULL in any payload column (the reference's Cycle entity is full of
nullable free-text fields, plugins/domain/entities/cycle.py:6-91) would
silently lose its own match. It also avoids hashing long text columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    left_id: str,
    how: str = "left",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Nearest-within-tolerance match per left row, by group key ``on``.

    ``left_id`` is the unique non-null row key of ``left``; the best match
    is ranked per ``left_id`` and (for how='left') joined back on it, so
    NULLs in other left columns never detach a row from its match.
    Right columns other than ``on`` must not collide with left columns.
    Ties on |Δt| break by right timestamp, then ``tiebreak`` columns, so
    the match is fully deterministic.
    """
    colliding = [c for c in right.columns if c in left.columns and c != on]
    if colliding:
        # enforcing the documented contract by raising, not by silently
        # dropping (how='left') or emitting ambiguous duplicate column
        # names (how='inner')
        raise ValueError(
            f"asof_nearest_join: right columns {colliding} collide with left "
            f"columns; rename them (the no-collision contract is enforced, "
            f"not silently resolved)"
        )
    lt = F.col("__lt")
    rt = F.col("__rt")
    lef = left.withColumn("__lt", F.unix_micros(F.col(left_ts).cast("timestamp")))
    rig = right.withColumn("__rt", F.unix_micros(F.col(right_ts).cast("timestamp")))
    joined = lef.join(rig, on=on, how="inner").filter(
        F.abs(lt - rt) <= F.lit(tolerance_us)
    )
    order = [F.abs(lt - rt).asc(), rt.asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(left_id).orderBy(*order)
    best = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lt", "__rt")
    )
    if how == "inner":
        return best
    # join back on the id key only (null-safe by contract) so unmatched
    # left rows survive with null right columns
    right_only = [c for c in right.columns if c not in left.columns]
    return left.join(best.select(left_id, *right_only), on=left_id, how="left")


def range_join_best(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    extra_pred: Column | None = None,
    left_key_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Loose range match: |Δt| <= tolerance plus an optional overlap
    predicate; best (min |Δt|) candidate per left key.

    ``left_key_cols`` should be the left frame's unique id column(s);
    omitting it falls back to ranking over every left column, which is
    only safe when all left columns are non-null and cheap to hash.
    """
    lef = left.withColumn("__lt", F.unix_micros(F.col(left_ts).cast("timestamp")))
    rig = right.withColumn("__rt", F.unix_micros(F.col(right_ts).cast("timestamp")))
    diff = F.abs(F.col("__lt") - F.col("__rt"))
    joined = lef.join(rig, on=on, how="inner").filter(diff <= F.lit(tolerance_us))
    if extra_pred is not None:
        joined = joined.filter(extra_pred)
    keys = left_key_cols or left.columns
    order = [diff.asc(), F.col("__rt").asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lt", "__rt")
    )


def two_tier_match(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    strict_us: int,
    loose_us: int,
    loose_pred: Column | None = None,
    left_id: str = "id",
    right_id: str = "rid",
) -> DataFrame:
    """Two-tier reconciliation with matched_status semantics
    (reference: reconciliation.py:176-434):
      1 = strict (asof within strict_us)      4 = loose (range + overlap)
      3 = left-only orphan                     (right-only rows = status 2,
                                                derivable by anti join)
    Returns left rows + matched right id + status. Works for any
    ``right_id`` type — the orphan rows' null id is cast to the right
    frame's actual id type.

    The tier frames are persisted (MEMORY_AND_DISK): without it Catalyst
    re-derives the strict asof-join subtree for every consumer — once for
    out1, and again inside rest/l2/orphans, 4 evaluations total (the
    loose range join twice) — a 4x tax on the most expensive joins in the
    route at corpus scale. All three frames are narrow id/ts/bucket
    projections (no payload columns), so the cache is metadata-sized
    relative to the corpus and spills to disk instead of failing — the
    same lifetime contract as the dedup token-set persist: the cache
    lives until the session ends or the caller unpersists.
    """
    from pyspark.storagelevel import StorageLevel

    l1 = asof_nearest_join(
        left, right, on, left_ts, right_ts, strict_us, left_id,
        how="inner", tiebreak=[right_id],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l1_ids = l1.select(left_id).distinct()
    rest = left.join(l1_ids, on=left_id, how="left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    l2 = range_join_best(
        rest,
        right,
        on,
        left_ts,
        right_ts,
        loose_us,
        loose_pred,
        left_key_cols=[left_id],
        tiebreak=[right_id],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l2_ids = l2.select(left_id).distinct()
    orphans = rest.join(l2_ids, on=left_id, how="left_anti")
    out1 = l1.select(*left.columns, F.col(right_id)).withColumn(
        "matched_status", F.lit(1)
    )
    out4 = l2.select(*left.columns, F.col(right_id)).withColumn(
        "matched_status", F.lit(4)
    )
    rid_type = right.schema[right_id].dataType
    out3 = orphans.select(
        *left.columns, F.lit(None).cast(rid_type).alias(right_id)
    ).withColumn("matched_status", F.lit(3))
    return out1.unionByName(out4).unionByName(out3)


def time_consistency_check(
    joined: DataFrame,
    left_ts: str,
    right_ts: str,
    threshold_sec: int = 300,
) -> DataFrame:
    """Cross-table timestamp-consistency check with the reference's
    year-alignment business rule (reference: plugins/dq_lib/
    consistency.py:6-58): the right-side year is known-unreliable, so the
    right timestamp is rebuilt with the LEFT row's year before diffing.
    Takes an already-joined frame (join on whatever key applies), adds:

    * ``aligned_ts``  — right ts with the left year substituted
    * ``time_diff_sec`` — abs seconds between left ts and aligned ts
    * ``is_violation`` — diff > threshold, or the rebuild was invalid
      (e.g. right lands on Feb 29 and the left year is non-leap: the
      reference's Polars ``dt.replace`` panics there; rebuilding via
      make_timestamp yields NULL, which we count as a violation instead
      of killing the job)

    Narrow/map-side after the caller's join; the default threshold is
    the reference's 300 s (THRESHOLD_TIME_DIFF, plugins/services/
    config.py:26).
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    aligned = F.make_timestamp(
        F.year(lt),
        F.month(rt),
        F.dayofmonth(rt),
        F.hour(rt),
        F.minute(rt),
        F.second(rt).cast("double"),
    )
    diff = F.abs(F.unix_timestamp(lt) - F.unix_timestamp(aligned))
    return joined.withColumn("aligned_ts", aligned).withColumn(
        "time_diff_sec", diff
    ).withColumn(
        "is_violation",
        F.when(F.col("aligned_ts").isNull(), F.lit(True)).otherwise(
            diff > F.lit(threshold_sec)
        ),
    )


def consistency_summary(
    checked: DataFrame, key_col: str, sample_cap: int = 10
) -> DataFrame:
    """One-row rollup in the reference's result shape (consistency.py:
    46-58): total matched, failed count, passed flag, and a CAPPED,
    deterministically-ordered sample of violating keys (the reference's
    head(10) is arbitrary-order; sorting first makes replays and oracle
    twins stable)."""
    return checked.agg(
        F.count("*").alias("total_matched"),
        F.sum(F.col("is_violation").cast("long")).alias("failed"),
        (F.sum(F.col("is_violation").cast("long")) == 0).alias("passed"),
        F.slice(
            F.array_sort(
                F.collect_list(F.when(F.col("is_violation"), F.col(key_col)))
            ),
            1,
            sample_cap,
        ).alias("failed_samples"),
    )
