"""Register the driver's parquet tables as temp views + shared SQL snippets.

The grading driver provides TPC-H-ish tables (TESTDATA.md) and runs each
``__spark_entry__.queries()`` entry in Spark while running the matching
``oracle_sql()`` string in DuckDB over the same files. Everything here is
written in the ANSI-SQL intersection both engines execute identically.

``TRANSCRIPTS_SQL`` derives a deterministic transcripts table (BASELINE
input_hint shape) from events x documents so the transcript pipeline
itself is oracle-checkable: same rows in both engines, including planted
PII / too-short / repetition cases keyed off event_id residues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views named exactly like the driver's DuckDB views; also pins
    session tz to UTC and ANSI off so timestamp/cast semantics match."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# Deterministic transcript derivation — identical text in Spark and DuckDB.
# Residue classes of event_id plant: PII (mod 37), too-short (mod 41),
# high-repetition (mod 43), boilerplate (mod 47), toxicity (mod 53).
TRANSCRIPTS_SQL = """
SELECT
  'conv_' || CAST(e.user_id AS STRING) AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1 AS INT)
    AS turn_idx,
  CASE e.event_type
    WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
    WHEN 'purchase' THEN 'assistant' WHEN 'signup' THEN 'system'
    ELSE 'tool' END AS role,
  CASE
    WHEN e.event_id % 37 = 0 THEN d.text
      || ' contact me at user' || CAST(e.event_id AS STRING)
      || '@example.com or call (555) 123-4567 my ssn is 123-45-6789'
    WHEN e.event_id % 41 = 0 THEN 'ok'
    WHEN e.event_id % 43 = 0 THEN repeat('spam spam ', 40)
    WHEN e.event_id % 47 = 0 THEN 'As an AI language model I cannot comment on '
      || CAST(e.event_id AS STRING)
    WHEN e.event_id % 53 = 0 THEN 'well frak this ' || d.text
    ELSE d.text END AS text,
  CASE WHEN e.event_type = 'error'
       THEN 'tool_' || CAST(e.event_id % 5 AS STRING) END AS tool,
  e.ts AS ts
FROM events e
JOIN documents d
  ON e.event_id % {n_docs} = d.doc_id
"""

# DuckDB form: scalar subquery (fine there); Spark inlines the literal
# count because a scalar subquery inside a join condition trips Spark 4's
# subquery-reuse when pandas UDFs appear downstream.
TRANSCRIPTS_SQL_DUCKDB = TRANSCRIPTS_SQL.format(n_docs="(SELECT COUNT(*) FROM documents)")


def transcripts_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived transcripts DataFrame (registers base views first)."""
    register_views(spark, sf_dir)
    n_docs = spark.table("documents").count()
    df = spark.sql(TRANSCRIPTS_SQL.format(n_docs=n_docs))
    df.createOrReplaceTempView("transcripts")
    return df
