"""Benchmark: end-to-end filter+scrub throughput + headline query times.

Prints ONE JSON line:
  {"metric": "...", "value": <turns/sec>, "unit": "turns/sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

Headline metric (BASELINE.md): turns/sec of the full pipeline —
read parquet -> per-turn features + langid/ppl pandas UDFs ->
conversation window flags -> keep/drop decision -> regex PII scrub ->
write kept turns — on a deterministic synthetic transcript corpus sized
to the scale factor (seed 42, cached under .bench_cache/).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), DQX_BENCH_CONVS (override corpus size).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# corpus size follows the sf of the input dir: sf0.1 -> 50k conversations
# (~1.4M turns); sf0.01 -> 5k; sf0.001 -> 500
def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_of(SF_DIR)
N_CONVS = int(os.environ.get("DQX_BENCH_CONVS", str(max(500, int(500_000 * SF)))))

# best-of-N reps (shared host with steal bursts: a single run can crater
# 3-5x through no fault of the engine; best-of-N measures the engine)
N_PIPELINE_REPS = 5
N_QUERY_REPS = 2

HEADLINE_QUERIES = (
    "pricing_summary",
    "window_lag_gaps",
    "two_tier_reconciliation",
    "transcript_keep_scrub",
    "dedup_jaccard_lsh",
    "embedding_cosine_topk",
    "neardup_ann",
)


def bench_corpus_path() -> str:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_{N_CONVS}.parquet")
    if not os.path.exists(path):
        from dataquality_box_spark.synth import write_transcripts_parquet

        write_transcripts_parquet(path, N_CONVS)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from dataquality_box_spark.config import DEFAULT_CONFIG
    from dataquality_box_spark.driver_queries import PAIRS
    from dataquality_box_spark.plans.pipeline import kept_turns, run_pipeline
    from dataquality_box_spark.schema import TRANSCRIPT_SCHEMA
    from dataquality_box_spark.session import get_spark

    corpus = bench_corpus_path()
    spark = get_spark("dqx-bench", parallelism=CPUS, shuffle_partitions=CPUS)

    # --- headline: end-to-end pipeline throughput.
    # Best of N_PIPELINE_REPS runs: this VM shares a host with bursty neighbors
    # (steal spikes up to ~17% were measured); a single run can crater 3-5x
    # through no fault of the engine. Best-of-N measures the engine.
    df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(corpus)
    n_rows = df.count()  # warm the file cache / JVM before timing
    out_dir = "/tmp/dqx_bench_out"
    pipeline_sec = float("inf")
    for _ in range(N_PIPELINE_REPS):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        result = run_pipeline(df, DEFAULT_CONFIG)
        kept_turns(result).write.mode("overwrite").parquet(out_dir)
        pipeline_sec = min(pipeline_sec, time.time() - t0)
    turns_per_sec = n_rows / pipeline_sec

    # --- headline queries at SF_DIR (best-of-N, same reasoning)
    query_secs: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn = PAIRS[name][0]
        best = float("inf")
        for _ in range(N_QUERY_REPS):
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        query_secs[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "turns/sec end-to-end filter+scrub throughput",
                "value": round(turns_per_sec, 1),
                "unit": "turns/sec",
                "queries": query_secs,
                "sf": SF,
                "pipeline_sec": round(pipeline_sec, 2),
                "rows": n_rows,
                "cpus": CPUS,
                "methodology": f"best of {N_PIPELINE_REPS} pipeline runs / {N_QUERY_REPS} per query "
                "(shared-host steal-burst damping)",
            }
        )
    )


if __name__ == "__main__":
    main()
