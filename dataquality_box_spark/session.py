"""SparkSession factory with scale-appropriate defaults.

Local-mode testing uses ``local[N]``; the same config block is what a
cluster deployment would pass to ``spark-submit --conf``. AQE is on so
skewed conv_id partitions are split at runtime; shuffle partitions default
to the core count (local) — on a real cluster this would be 2-3x total
cores or left to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dataquality_box_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    parallelism=None -> local[*]. On a real cluster, drop .master and let
    spark-submit decide; every other conf carries over unchanged.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = shuffle_partitions or cpus or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size shuffles by BYTES, not by core count: AQE can only coalesce
        # DOWN from the initial partition number, so a fixed
        # shuffle.partitions=cores silently becomes rows/32 per task as the
        # corpus grows — at 143M turns (the 100x bench point) the conv_id
        # window stage put 4.5M text rows in each of 32 concurrent window
        # buffers + parquet writers and OOMed the 16g heap. Starting higher
        # and letting AQE coalesce to ~64MB targets gives ~cores partitions
        # at small inputs (parallelismFirst keeps every core busy) and
        # bytes-bounded partitions at 100x (measured: AQE picks 256 for the
        # 143M-turn window stage, 370k turns/sec, no OOM). 256 is sized to
        # this box: per-map shuffle-bucket overhead is linear in the
        # initial count (a small-query-heavy suite ran 31s/43s/136s at
        # 32/256/2048), so don't start higher than the largest local corpus
        # needs; a 1000-executor deployment raises the env knob alongside
        # shuffle.partitions.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("DQX_INITIAL_SHUFFLE_PARTITIONS", "256"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: driver heap is the only memory pool. Keep it MODEST
        # and fully pre-touched: measured on this host (interleaved reps,
        # 1.43M-turn pipeline, local[32]) a 48g heap without Xms ran 18-26s,
        # Xms48g without pretouch 78-130s, while Xms16g+AlwaysPreTouch ran
        # 13.6-16s — heap growth/commit page-zeroing lands in the kernel
        # (70%+ sys time) and serializes 32 task threads. Pre-touching at
        # JVM start moves that cost into startup, where it belongs.
        .config("spark.driver.memory", os.environ.get("DQX_DRIVER_MEM", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('DQX_DRIVER_MEM', '16g')} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
