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


def _dir_bytes(sf_dir: str) -> int:
    import os

    total = 0
    try:
        for t in TABLES:
            total += os.path.getsize(f"{sf_dir}/{t}.parquet")
    except OSError:
        pass  # remote/partial dir: tune from what was seen
    return total


# applicationId -> sf_dir whose tables the views CURRENTLY point at.
# Re-reading ten parquet footers on EVERY query call was pure per-query
# driver overhead; temp views are session-lived, so registration only
# needs to re-run when the target dir actually changes (the views are
# overwritten then — tracking the current dir, not a seen-set, keeps
# alternating-dir callers correct). Keyed by applicationId so a fresh
# session re-registers.
_REGISTERED: dict[str, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views named exactly like the driver's DuckDB views; also pins
    session tz to UTC and ANSI off so timestamp/cast semantics match.
    Idempotent and memoized per (session, dir): repeat calls cost two
    conf sets, not ten parquet-footer reads."""
    from ..session import tune_shuffle_for

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # input-sized shuffle partitions for whatever query is built next
    # (guide §2.2; no-op at sf0.1 where the tables are < 64 MB total)
    tune_shuffle_for(spark, _dir_bytes(sf_dir))
    app = spark.sparkContext.applicationId
    if _REGISTERED.get(app) == sf_dir:
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _REGISTERED[app] = sf_dir


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

# Spark-side twin, restructured (SAME rows bit-for-bit): the projection
# computes conv_id first and the ROW_NUMBER window partitions by the
# conv_id ATTRIBUTE — 'conv_' || user_id is bijective with user_id, so
# the grouping and therefore every turn_idx is identical. Why: the
# flagship pipeline's conversation window and per-conversation
# aggregations partition by conv_id; when the derivation's window
# already hash-partitioned on that attribute, Catalyst's
# partitioning-reuse drops their Exchange entirely (guide §2.4 — two
# operations keyed the same way share one shuffle; measured: the
# transcript queries go 2 shuffles -> 1). Partitioning by the inline
# expression is NOT enough — Spark extracts it into a fresh `_w0`
# attribute that the downstream conv_id requirement doesn't match. The
# ORACLE text (TRANSCRIPTS_SQL_DUCKDB, embedded in every
# transcript-query oracle) is untouched — this changes only what Spark
# executes, not what either engine returns.
TRANSCRIPTS_SQL_SPARK = """
SELECT conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1 AS INT)
    AS turn_idx,
  role, text, tool, ts
FROM (
  SELECT
    'conv_' || CAST(e.user_id AS STRING) AS conv_id,
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
    e.ts AS ts,
    e.event_id AS event_id
  FROM events e
  JOIN documents d
    ON e.event_id % {n_docs} = d.doc_id
)
"""


# (applicationId, sf_dir) -> document count; the count is a property of
# the static input dir, so one tiny job per (session, dir) instead of one
# per query call.
_NDOCS: dict[tuple[str, str], int] = {}


def transcripts_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived transcripts DataFrame (registers base views first)."""
    register_views(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    n_docs = _NDOCS.get(key)
    if n_docs is None:
        n_docs = spark.table("documents").count()
        _NDOCS[key] = n_docs
    df = spark.sql(TRANSCRIPTS_SQL_SPARK.format(n_docs=n_docs))
    df.createOrReplaceTempView("transcripts")
    return df
