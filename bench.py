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
import math
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
    "lm_perplexity_report",
    "chunk_rewrite_dedup",
    "winnow_fingerprint_report",
)


def bench_corpus_path() -> str:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"transcripts_{N_CONVS}.parquet")
    if not os.path.exists(path):
        from dataquality_box_spark.synth import write_transcripts_parquet

        write_transcripts_parquet(path, N_CONVS)
    return path


def scaled_corpus_path(factor: int) -> str:
    """FACTOR-times transcript corpus: seed-shifted replicas with
    disjoint conv_id spaces, generated in chunks so driver memory stays
    one replica wide. Per-conversation structure (turn counts, planted
    defect rates) is identical to the base corpus by construction, so
    throughput differences at FACTOR-times scale measure the ENGINE."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    path = os.path.join(cache, f"transcripts_{N_CONVS}_x{factor}.parquet")
    if not os.path.exists(path):
        from concurrent.futures import ProcessPoolExecutor

        # stage + atomic rename: an interrupted generation must not leave
        # a half-corpus that later runs silently bench against
        staging = f"{path}.__staging__"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        # replicas are seed-independent, so generation parallelizes across
        # processes (each replica is ~1.4M rows of pandas work; at factor
        # 100 a serial loop would be ~8 min, the pool ~1 min)
        workers = min(8, max(1, (os.cpu_count() or 8) // 4), factor)
        with ProcessPoolExecutor(max_workers=workers) as pool:
            list(pool.map(_write_replica, [(staging, N_CONVS, k) for k in range(factor)]))
        os.replace(staging, path)
    return path


def _write_replica(job: tuple[str, int, int]) -> None:
    """One seed-shifted replica of the transcript corpus, written as
    row-bounded parquet parts (module-level so ProcessPoolExecutor can
    pickle it)."""
    staging, n_convs, k = job
    from dataquality_box_spark.synth import gen_transcripts

    pdf = gen_transcripts(n_convs, seed=42 + k)
    pdf["conv_id"] = pdf["conv_id"].astype(str) + f"_r{k}"
    n_files = max(8, len(pdf) // 25_000)
    bounds = [round(i * len(pdf) / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        pdf.iloc[bounds[i] : bounds[i + 1]].to_parquet(
            os.path.join(staging, f"part-{k:03d}-{i:05d}.parquet"),
            index=False,
        )


# --- dedup-route scaling evidence (Σ bucket² claim): run the bucketed
# near-dup operators on the base corpus and on a FACTOR-times corpus with
# the same duplication RATE, and report the wall-time ratio. Linear
# growth (ratio ≈ FACTOR) is the bucket-first design working; an
# all-pairs route would grow ~FACTOR².
SCALE_FACTOR = int(os.environ.get("DQX_BENCH_SCALE_FACTOR", "10"))

# XXL flagship-pipeline scale point (0 disables). Default 100× of the
# sf0.1 corpus ≈ 143M turns — big enough that a stage accumulating
# superlinear state shows as a throughput cliff the 10× run can't see.
XXL_FACTOR = int(os.environ.get("DQX_BENCH_XXL_FACTOR", "100"))
XXL_REPS = int(os.environ.get("DQX_BENCH_XXL_REPS", "2"))


def _scaled_paths(spark) -> tuple[str, str]:
    """Cache FACTOR-times documents/embeddings corpora as parquet.

    Constant duplication rate by construction: doc replicas suffix every
    token with the replica id (disjoint token spaces -> no cross-replica
    near-dups, intra-replica structure identical); embedding replicas are
    sign-flipped by a deterministic per-replica ±1 diagonal (cosine
    within a replica unchanged — the common flips cancel — while
    cross-replica cosines decorrelate). So true near-dup pairs scale
    linearly with the corpus, and any superlinear wall growth is the
    ENGINE, not the data.
    """
    import hashlib

    from pyspark.sql import functions as F

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    tag = os.path.basename(SF_DIR.rstrip("/"))
    dpath = os.path.join(cache, f"docs_{tag}_x{SCALE_FACTOR}.parquet")
    epath = os.path.join(cache, f"emb_{tag}_x{SCALE_FACTOR}.parquet")
    if not os.path.exists(dpath):
        base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        parts = [
            base.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1x{k}").alias("text"),
            )
            for k in range(SCALE_FACTOR)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dpath)
    if not os.path.exists(epath):
        base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        hi = set("89abcdef")
        parts = []
        for k in range(SCALE_FACTOR):
            signs = F.array(
                *[
                    F.lit(
                        1.0
                        if hashlib.md5(f"rep{k}#{i}".encode()).hexdigest()[0] in hi
                        else -1.0
                    )
                    for i in range(64)
                ]
            )
            parts.append(
                base.select(
                    (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                    F.zip_with(
                        F.transform("embedding", lambda x: x.cast("double")),
                        signs,
                        lambda x, s: (x * s).cast("float"),
                    ).alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(epath)
    return dpath, epath


# the neardup route itself is shared with the driver query
# (driver_queries.neardup_ann_over) so the scaling evidence measures the
# exact plan production ships


def bench_dedup_scaling(spark) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from dataquality_box_spark.driver_queries import neardup_ann_over
    from dataquality_box_spark.operators.dedup import jaccard_pairs_lsh

    dpath, epath = _scaled_paths(spark)

    def best_of(fn, reps=N_QUERY_REPS):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    docsN = spark.read.parquet(dpath)
    # df_cap_inv scales with the factor so the per-replica cap population
    # is identical to the base run (df * (5*N) > N*n_docs <=> df*5 > n_docs)
    j1 = best_of(lambda: jaccard_pairs_lsh(docs1, threshold=0.8, df_cap_inv=5))
    jN = best_of(
        lambda: jaccard_pairs_lsh(docsN, threshold=0.8, df_cap_inv=5 * SCALE_FACTOR)
    )

    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    embN = spark.read.parquet(epath)
    a1 = best_of(lambda: neardup_ann_over(emb1, n_planes=8))
    # sign-LSH's bucket space is 2^planes, so the N× corpus runs with
    # +ceil(log2(N)) planes — constant expected bucket occupancy, the
    # actual production lever (a FIXED bucket space would grow candidate
    # pairs ~N² per bucket and measure the misconfiguration, not the route)
    extra = max(1, math.ceil(math.log2(SCALE_FACTOR)))
    aN = best_of(lambda: neardup_ann_over(embN, n_planes=8 + extra))

    return {
        "factor": SCALE_FACTOR,
        "jaccard_lsh_sec_1x": round(j1, 3),
        "jaccard_lsh_sec_Nx": round(jN, 3),
        "jaccard_growth": round(jN / j1, 2),
        "neardup_ann_sec_1x": round(a1, 3),
        "neardup_ann_sec_Nx": round(aN, 3),
        "ann_growth": round(aN / a1, 2),
        "ann_planes_1x_Nx": [8, 8 + extra],
        "note": "growth ≈ factor ⇒ linear (bucket-first; ann bucket space "
        "scaled with the corpus via +log2(N) hyperplanes); all-pairs would "
        "be ≈ factor²",
    }


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

    scaling = bench_dedup_scaling(spark)

    # --- flagship pipeline at FACTOR-times corpus: the filter+scrub
    # pipeline is embarrassingly parallel outside the one conv_id
    # shuffle, so turns/sec should hold ~flat as the corpus grows (a
    # throughput CLIFF here would mean a stage accumulates superlinear
    # work). Best-of-2 at 10x (one run is ~10x the base wall time).
    big = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(
        scaled_corpus_path(SCALE_FACTOR)
    )
    big_rows = big.count()
    big_out = "/tmp/dqx_bench_out_big"
    big_sec = float("inf")
    for _ in range(2):
        shutil.rmtree(big_out, ignore_errors=True)
        t0 = time.time()
        kept_turns(run_pipeline(big, DEFAULT_CONFIG)).write.mode("overwrite").parquet(
            big_out
        )
        big_sec = min(big_sec, time.time() - t0)
    pipeline_scaling = {
        "factor": SCALE_FACTOR,
        "rows_1x": n_rows,
        "sec_1x": round(pipeline_sec, 2),
        "tps_1x": round(n_rows / pipeline_sec, 1),
        "rows_Nx": big_rows,
        "sec_Nx": round(big_sec, 2),
        "tps_Nx": round(big_rows / big_sec, 1),
        "tps_ratio": round((big_rows / big_sec) / (n_rows / pipeline_sec), 3),
        "note": "tps_ratio ≈ 1 ⇒ flat throughput at 10x corpus "
        "(per-turn stages narrow; one conv_id shuffle)",
    }

    # --- flagship pipeline at XXL (default 100×, ~143M turns, ~2.4 GB
    # parquet): the scale point the 10× run is too small to stress —
    # superlinear state in the window stage, Arrow batching, or the
    # shuffle would surface here as a throughput cliff. The corpus is
    # cached (parallel seed-shifted generation above); reps kept low
    # because one rep is ~6-7 min of wall.
    pipeline_scaling_xxl = None
    if XXL_FACTOR > SCALE_FACTOR:
        xxl = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(
            scaled_corpus_path(XXL_FACTOR)
        )
        xxl_rows = xxl.count()
        xxl_out = "/tmp/dqx_bench_out_xxl"
        xxl_sec = float("inf")
        for _ in range(XXL_REPS):
            shutil.rmtree(xxl_out, ignore_errors=True)
            t0 = time.time()
            kept_turns(run_pipeline(xxl, DEFAULT_CONFIG)).write.mode(
                "overwrite"
            ).parquet(xxl_out)
            xxl_sec = min(xxl_sec, time.time() - t0)
        shutil.rmtree(xxl_out, ignore_errors=True)
        pipeline_scaling_xxl = {
            "factor": XXL_FACTOR,
            "rows": xxl_rows,
            "sec": round(xxl_sec, 2),
            "tps": round(xxl_rows / xxl_sec, 1),
            "tps_vs_1x": round((xxl_rows / xxl_sec) / (n_rows / pipeline_sec), 3),
            "tps_vs_10x": round((xxl_rows / xxl_sec) / (big_rows / big_sec), 3),
            "reps": XXL_REPS,
            "note": "ratios ≈ 1 ⇒ flat throughput at "
            f"{XXL_FACTOR}x corpus; << 1 would flag a superlinear stage. "
            "tps_vs_10x is the cleaner read: a ~9-min run AVERAGES over "
            "this host's steal bursts while short best-of-N reps can land "
            "entirely inside a low-steal window (BENCH/BASELINE.md)",
        }

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
                "dedup_scaling": scaling,
                "pipeline_scaling": pipeline_scaling,
                "pipeline_scaling_xxl": pipeline_scaling_xxl,
                "methodology": f"best of {N_PIPELINE_REPS} pipeline runs / {N_QUERY_REPS} per query "
                "(shared-host steal-burst damping)",
            }
        )
    )


if __name__ == "__main__":
    main()
