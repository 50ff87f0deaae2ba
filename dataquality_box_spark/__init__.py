"""dataquality_box_spark — a PySpark-native data-quality / quality-filter engine.

A from-scratch reimplementation of the capabilities of
``xiyanz907-lgtm/DataQuality_Box`` (an Airflow+Polars data-governance platform)
as an idiomatic PySpark library: a language-ID + quality-filter + PII/toxicity
scrub pipeline over tables of multi-turn conversation / agent transcripts,
plus the generic relational operator library the reference implements
(tolerance joins, rule engine, window checks, dedup, similarity search).

Design stance (see SURVEY.md §7):
  * ``pyspark.sql`` DataFrames everywhere; no RDDs, no per-row Python.
  * Model scoring (langid, perplexity) runs in Arrow-batched pandas UDFs.
  * Stages are pure DataFrame -> DataFrame functions; persistence is
    partitioned parquet with an Iceberg-shaped writer seam (TableIO).
  * Catalyst/AQE do pushdown, pruning and join selection; the library adds
    only what they cannot: explicit repartitioning before shuffle-heavy
    grouped stages, salting helpers for skewed conv_ids, and a resume ledger.
"""

__version__ = "0.1.0"
