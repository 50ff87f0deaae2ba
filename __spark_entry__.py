"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship filter+scrub pipeline over transcripts derived
               deterministically from the sf0.001 driver tables.
queries()    — one entry per implemented operator family (SURVEY.md §2),
               implemented in dataquality_box_spark.driver_queries.
oracle_sql() — DuckDB twins for the same names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dataquality_box_spark.config import MIXED_LANG_CONFIG
    from dataquality_box_spark.plans.pipeline import run_pipeline
    from dataquality_box_spark.sources.driver_tables import transcripts_view

    transcripts = transcripts_view(spark, "/root/testdata/sf0.001")
    result = run_pipeline(transcripts, MIXED_LANG_CONFIG)
    return result.select(
        "conv_id",
        "turn_idx",
        "role",
        "lang",
        "ppl",
        "keep",
        "drop_reasons",
        "scrubbed_text",
        "ts",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataquality_box_spark.driver_queries import PAIRS

    return {name: fn for name, (fn, _sql) in PAIRS.items()}


def oracle_sql() -> dict[str, str]:
    from dataquality_box_spark.driver_queries import PAIRS

    return {name: sql for name, (_fn, sql) in PAIRS.items() if sql is not None}
