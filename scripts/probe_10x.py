"""Isolated re-measure of the bench's 10x pipeline section (not part of
the frozen bench): same read -> run_pipeline -> kept_turns -> parquet
write timing, plus /proc/stat steal accounting per rep."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPS = int(os.environ.get("PROBE_REPS", "3"))
CORPUS = os.environ.get(
    "PROBE_CORPUS", "/root/repo/.bench_cache/transcripts_50000_x10.parquet"
)


def cpu_stat():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = list(map(int, parts[1:]))
    return sum(vals), vals[7]  # total jiffies, steal jiffies


def main():
    from dataquality_box_spark.config import DEFAULT_CONFIG
    from dataquality_box_spark.plans.pipeline import kept_turns, run_pipeline
    from dataquality_box_spark.schema import TRANSCRIPT_SCHEMA
    from dataquality_box_spark.session import get_spark

    spark = get_spark("probe-10x", parallelism=32, shuffle_partitions=32)
    df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(CORPUS)
    n = df.count()
    out = "/tmp/dqx_probe_out"
    for i in range(REPS):
        shutil.rmtree(out, ignore_errors=True)
        t_all0, s0 = cpu_stat()
        t0 = time.time()
        kept_turns(run_pipeline(df, DEFAULT_CONFIG)).write.mode("overwrite").parquet(out)
        dt = time.time() - t0
        t_all1, s1 = cpu_stat()
        steal_pct = 100.0 * (s1 - s0) / max(1, (t_all1 - t_all0))
        print(
            f"rep {i}: {dt:.2f}s  tps={n/dt:,.0f}  steal={steal_pct:.1f}%",
            flush=True,
        )
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
