"""Scaling-efficiency evidence: the same pipeline job at two parallelism
levels (local[8] vs local[32]) on the same input — the in-sandbox stand-in
for the N- vs 4N-executor criterion (BASELINE.md).

Each level runs in a fresh JVM via spark-submit so nothing is shared.
Writes the measured table into BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--convs 50000] [--runs 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from dataquality_box_spark.config import DEFAULT_CONFIG
from dataquality_box_spark.plans.pipeline import kept_turns, run_pipeline
from dataquality_box_spark.schema import TRANSCRIPT_SCHEMA

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet({corpus!r})
n = df.count()  # warm up scan + JVM
t0 = time.time()
result = run_pipeline(df, DEFAULT_CONFIG)
kept_turns(result).write.mode("overwrite").parquet({out!r})
sec = time.time() - t0
print("RESULT " + json.dumps({{"rows": n, "sec": sec}}))
"""


def run_once(cpus: int, corpus: str) -> dict:
    job_path = f"/tmp/dqx_scale_job_{cpus}.py"
    out = f"/tmp/dqx_scale_out_{cpus}"
    with open(job_path, "w") as f:
        f.write(JOB.format(repo=REPO, corpus=corpus, out=out))
    if True:
        proc = subprocess.run(
            [
                "spark-submit",
                "--master", f"local[{cpus}]",
                "--conf", f"spark.sql.shuffle.partitions={cpus}",
                "--conf", "spark.sql.adaptive.enabled=true",
                "--conf", "spark.sql.session.timeZone=UTC",
                "--conf", "spark.sql.ansi.enabled=false",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.driver.memory=48g",
                job_path,
            ],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            raise RuntimeError(f"no RESULT line (cpus={cpus}):\n{proc.stderr[-2000:]}")
        r = json.loads(line[0][len("RESULT "):])
    r["cpus"] = cpus
    return r


def run_levels(corpus: str, runs: int) -> tuple[dict, dict]:
    """Interleave the two levels and take the best run of each.

    The sandbox is a shared-host VM with bursty CPU steal (observed up to
    ~17%); interleaving samples both levels under the same noise and
    best-of-N recovers the machine's actual capability at each level.
    """
    best: dict[int, dict] = {}
    for _ in range(runs):
        for cpus in (8, 32):
            r = run_once(cpus, corpus)
            if cpus not in best or r["sec"] < best[cpus]["sec"]:
                best[cpus] = r
    for r in best.values():
        r["turns_per_sec"] = r["rows"] / r["sec"]
    return best[8], best[32]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    os.environ.setdefault("DQX_BENCH_CONVS", str(args.convs))
    from bench import bench_corpus_path  # reuses the cached corpus

    corpus = bench_corpus_path()
    levels = run_levels(corpus, args.runs)
    t8, t32 = levels[0]["sec"], levels[1]["sec"]
    eff = (t8 / t32) / 4.0
    report = {
        "rows": levels[0]["rows"],
        "local8": {"sec": round(t8, 2), "turns_per_sec": round(levels[0]["turns_per_sec"], 1)},
        "local32": {"sec": round(t32, 2), "turns_per_sec": round(levels[1]["turns_per_sec"], 1)},
        "scaling_efficiency": round(eff, 3),
        "criterion": "eff = (T_8 / T_32) / 4 >= 0.8",
        "methodology": "best-of-N interleaved runs (shared-host CPU steal)",
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput + scaling efficiency\n\n"
            "End-to-end filter+scrub pipeline (features + langid/ppl pandas\n"
            "UDFs + conversation window + decision + PII scrub + parquet\n"
            "write) on the deterministic synthetic transcript corpus\n"
            f"(seed 42, {report['rows']:,} turns), fresh JVM per level via\n"
            "`spark-submit --py-files`-equivalent job.\n\n"
            "| parallelism | wall sec | turns/sec |\n|---|---|---|\n"
            f"| local[8]  (N)  | {report['local8']['sec']} | {report['local8']['turns_per_sec']:,} |\n"
            f"| local[32] (4N) | {report['local32']['sec']} | {report['local32']['turns_per_sec']:,} |\n\n"
            f"**Scaling efficiency (T_8 / T_32) / 4 = {report['scaling_efficiency']}**"
            " (criterion: >= 0.8, BASELINE.json north rule; in-sandbox\n"
            "two-parallelism-level evidence per driver instruction).\n\n"
            f"Measured {report['measured_at']} on the 32-core local[32] host.\n"
        )


if __name__ == "__main__":
    main()
