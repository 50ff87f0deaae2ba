"""A/B: two_tier_match as shipped vs a variant that persists the tier
frames (l1/rest/l2) so the asof/range subtrees evaluate once. Noop sink,
interleaved reps, same JVM. Not part of the frozen bench."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROBE_REPS", "4"))


def two_tier_persisted(left, right, on, left_ts, right_ts, strict_us, loose_us,
                       loose_pred, left_id, right_id):
    from dataquality_box_spark.operators.recon import (
        asof_nearest_join,
        range_join_best,
    )

    l1 = asof_nearest_join(
        left, right, on, left_ts, right_ts, strict_us, left_id,
        how="inner", tiebreak=[right_id],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l1_ids = l1.select(left_id).distinct()
    rest = left.join(l1_ids, on=left_id, how="left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    l2 = range_join_best(
        rest, right, on, left_ts, right_ts, loose_us, loose_pred,
        left_key_cols=[left_id], tiebreak=[right_id],
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
    frames = [l1, rest, l2]
    return out1.unionByName(out4).unionByName(out3), frames


def main():
    from dataquality_box_spark.operators.recon import two_tier_match
    from dataquality_box_spark.session import get_spark
    from dataquality_box_spark.sources.driver_tables import register_views

    spark = get_spark("probe-two-tier", parallelism=32, shuffle_partitions=32)
    register_views(spark, SF_DIR)
    ev = spark.table("events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.floor(F.col("value") / 50).alias("vb")
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("rid"), "user_id",
        F.col("ts").alias("rts"), F.floor(F.col("value") / 50).alias("rvb"),
    )
    kw = dict(strict_us=300_000_000, loose_us=10_800_000_000,
              loose_pred=F.col("vb") == F.col("rvb"),
              left_id="event_id", right_id="rid")

    def run_ship():
        m = two_tier_match(left, right, "user_id", "ts", "rts", **kw)
        m.select("event_id", "rid", F.col("matched_status").cast("int")
                 .alias("matched_status")).write.mode("overwrite").format("noop").save()

    def run_pers():
        m, frames = two_tier_persisted(left, right, "user_id", "ts", "rts", **kw)
        m.select("event_id", "rid", F.col("matched_status").cast("int")
                 .alias("matched_status")).write.mode("overwrite").format("noop").save()
        for f in frames:
            f.unpersist()

    # parity check once
    m1 = two_tier_match(left, right, "user_id", "ts", "rts", **kw)
    m2, frames = two_tier_persisted(left, right, "user_id", "ts", "rts", **kw)
    d1 = m1.exceptAll(m2).count()
    d2 = m2.exceptAll(m1).count()
    print(f"parity exceptAll: {d1} / {d2}", flush=True)
    for f in frames:
        f.unpersist()

    best = {"ship": float("inf"), "pers": float("inf")}
    for i in range(REPS):
        for name, fn in (("ship", run_ship), ("pers", run_pers)):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            print(f"round {i} {name}: {dt:.3f}s", flush=True)
    print(f"BEST ship={best['ship']:.3f} pers={best['pers']:.3f}", flush=True)


if __name__ == "__main__":
    main()
