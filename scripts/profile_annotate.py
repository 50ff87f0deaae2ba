"""Isolate the flagship annotate stage's per-expression cost (guide §1.4).

Times each text-flag expression alone over the bench corpus with the noop
sink, so the JVM expression cost is separated from the Arrow UDF cost.
Not part of the frozen bench; numbers feed OPTIMIZATION_r06.md only.

Usage: python scripts/profile_annotate.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataquality_box_spark.config import DEFAULT_CONFIG  # noqa: E402
from dataquality_box_spark.functions.scoring import score_udf  # noqa: E402
from dataquality_box_spark.functions.text import (  # noqa: E402
    is_boilerplate,
    has_toxicity,
    symbol_ratio,
    text_flag_columns,
    tokens,
)
from dataquality_box_spark.schema import TRANSCRIPT_SCHEMA  # noqa: E402
from dataquality_box_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    from bench import bench_corpus_path

    spark = get_spark("dqx-profile-annotate", parallelism=CPUS, shuffle_partitions=CPUS)
    df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(bench_corpus_path())
    df.count()  # warm file cache

    text = F.col("text")
    toks = tokens(text)
    cases = {
        "scan_only": lambda d: d.select("conv_id", "turn_idx"),
        "tokens_size": lambda d: d.select(F.size(toks).alias("nt")),
        "tokens_distinct_ratio": lambda d: d.select(
            (F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))).alias("r")
        ),
        "symbol_ratio": lambda d: d.select(symbol_ratio(text).alias("s")),
        "boilerplate_rlike": lambda d: d.select(is_boilerplate(text).alias("b")),
        "toxicity_rlike": lambda d: d.select(has_toxicity(text).alias("t")),
        "all_flags": lambda d: d.select(
            *[c.alias(n) for n, c in text_flag_columns(text, DEFAULT_CONFIG).items()]
        ),
        "all_flags_shared_toks": lambda d: d.select(
            F.col("text"),
        ).withColumn("__toks", toks).select(
            *[
                c.alias(n)
                for n, c in text_flag_columns(
                    text, DEFAULT_CONFIG, toks=F.col("__toks")
                ).items()
            ]
        ),
        "score_udf_narrow": lambda d: d.select(score_udf(text).alias("s")),
    }
    for name, fn in cases.items():
        best = float("inf")
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"profile: {name}")
            t0 = time.time()
            fn(df).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        print(f"{name:28s} {best:7.3f} s")


if __name__ == "__main__":
    main()
