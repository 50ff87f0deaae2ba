"""Iceberg-shaped table IO with a partitioned-parquet fallback.

The reference persists every stage as hive-layout parquet partitions with
explicit delete-before-write idempotency (reference: plugins/infra/
io_strategy.py:43-120 write/read/clean, plugins/infra/operators.py:335-372
_clean_partition). Here the same contract is one seam:

  * ``catalog`` mode: named tables under a catalog/database prefix.
    On a V2 catalog (Iceberg) the write path is
    ``df.writeTo(table).overwritePartitions()`` — snapshot-isolated,
    idempotent per partition. V1 session-catalog tables (what this
    sandbox has) reject the V2 write path, so the same contract runs as
    dynamic-partition-overwrite ``insertInto`` (INSERT OVERWRITE of
    exactly the partitions present in the frame); partition DDL goes
    through ``ALTER TABLE .. DROP PARTITION`` / ``SHOW PARTITIONS``.
    Catalog mode is exercised for real against the session catalog in
    tests/test_catalog.py — swapping in Iceberg changes the catalog
    name, not the code.
  * fallback mode (no catalog): hive-layout parquet
    ``root/table/<part_col>=<value>/`` written with mode=overwrite, which
    has the same idempotent-replace semantics per partition directory.

All writer call sites go through TableIO so the storage backend is a
constructor argument, not a code change.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-stage parquet compression defaults (reference: plugins/infra/
# io_strategy.py:33-37).
DEFAULT_COMPRESSION = {"RAW": "zstd", "ENTITY": "zstd", "RESULT": "zstd"}


def stage_compression(stage: str, env=None) -> str:
    """Codec resolution chain for a pipeline stage (reference:
    io_strategy.py:301-338): stage-specific env var
    (``PARQUET_COMPRESSION_<STAGE>``) > global env var
    (``PARQUET_COMPRESSION``) > per-stage default > zstd. ``env`` is
    injectable for tests."""
    env = os.environ if env is None else env
    return (
        env.get(f"PARQUET_COMPRESSION_{stage}")
        or env.get("PARQUET_COMPRESSION")
        or DEFAULT_COMPRESSION.get(stage, "zstd")
    )


class TableIO:
    def __init__(self, root: str, catalog: str | None = None, compression: str = "zstd"):
        self.root = root
        self.catalog = catalog  # e.g. "iceberg_cat.db" when the jar exists
        # accept the reference's "codec:level" form (e.g. "zstd:5",
        # io_strategy.py:36): Spark's parquet writer takes the bare codec
        # in `compression` and the level via the hadoop-parquet property
        codec, _, level = compression.partition(":")
        self.compression = codec or "zstd"
        self.codec_level = int(level) if level else None
        self._v2_probe: bool | None = None

    def write_options(self) -> dict[str, str]:
        out = {"compression": self.compression}
        if self.codec_level is not None:
            out[f"parquet.compression.codec.{self.compression}.level"] = str(
                self.codec_level
            )
        return out

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _part_dir(self, table: str, part_col: str, value) -> str:
        return os.path.join(self._dir(table), f"{part_col}={value}")

    def _qualified(self, table: str) -> str:
        return f"{self.catalog}.{table}"

    def _is_v2_catalog(self, spark: SparkSession) -> bool:
        """True when the catalog prefix names a registered V2 catalog
        (e.g. Iceberg). Probed up front via the ``spark.sql.catalog.<name>``
        registration conf — V2 catalogs are always registered there while
        the session (v1) catalog is not — instead of string-matching
        writer exception messages, whose phrasing is Spark-version-
        specific. Cached per instance (the registration is session-static)."""
        if self._v2_probe is None:
            name = self.catalog.split(".", 1)[0]
            self._v2_probe = (
                spark.conf.get(f"spark.sql.catalog.{name}", None) is not None
            )
        return self._v2_probe

    def table_exists(self, spark: SparkSession, table: str) -> bool:
        """Backend-respecting existence check: catalog lookup in catalog
        mode, directory probe in the parquet fallback — so callers (the
        stored LSH index, the work queue) never silently miss a
        catalog-managed table by poking the filesystem."""
        if self.catalog:
            return spark.catalog.tableExists(self._qualified(table))
        return os.path.isdir(self._dir(table))

    @staticmethod
    def _sql_lit(value) -> str:
        if isinstance(value, str):
            return "'" + value.replace("'", "''") + "'"
        return str(value)

    def _ensure_catalog_table(self, df: DataFrame, table: str, part_col: str) -> None:
        spark = df.sparkSession
        if not spark.catalog.tableExists(self._qualified(table)):
            # partition column last (hive layout). The empty frame that
            # pins the schema is built FROM the schema, never by running
            # df.limit(0): limit(0) executes the caller's plan skeleton,
            # and if that plan carries an Observation (CollectMetrics),
            # the optimizer's empty-relation propagation eliminates the
            # metrics node and completes the observation with a
            # schemaless empty row — poisoning the caller's obs.get.
            cols = [c for c in df.columns if c != part_col] + [part_col]
            schema = df.select(*cols).schema
            (
                spark.createDataFrame([], schema)
                .write.partitionBy(part_col)
                .format("parquet")
                .options(**self.write_options())
                .saveAsTable(self._qualified(table))
            )

    def overwrite_partition(
        self, df: DataFrame, table: str, part_col: str, value
    ) -> None:
        """Idempotent partition replace (INSERT OVERWRITE semantics)."""
        if self.catalog:
            self._catalog_overwrite_partitions(df, table, part_col)
            return
        out = self._part_dir(table, part_col, value)
        (
            df.drop(part_col)
            .write.mode("overwrite")
            .options(**self.write_options())
            .parquet(out)
        )

    def _catalog_overwrite_partitions(
        self, df: DataFrame, table: str, part_col: str
    ) -> None:
        """Catalog-mode replace of exactly the partitions present in
        ``df``. The write path is chosen by the up-front catalog
        capability probe (``_is_v2_catalog``): V2 catalogs (Iceberg) get
        the snapshot-atomic ``overwritePartitions``; session-catalog (v1)
        tables run the equivalent dynamic partition-overwrite
        ``insertInto`` (only partitions in ``df`` rewrite). The probe is
        per-CATALOG, but a registered V2 SparkSessionCatalog can still
        DELEGATE individual v1 (parquet saveAsTable) tables to the
        session catalog — those reject the V2 writer with error class
        ``_LEGACY_ERROR_TEMP_1012`` ("Cannot write into v1 table"), and
        fall through to the insertInto path per table (matched on the
        error-class id, never the version-specific message text)."""
        from pyspark.errors import AnalysisException

        self._ensure_catalog_table(df, table, part_col)
        spark = df.sparkSession
        if self._is_v2_catalog(spark):
            try:
                (
                    df.writeTo(self._qualified(table))
                    .option("compression-codec", self.compression)
                    .overwritePartitions()
                )
                return
            except AnalysisException as ex:
                cond = (
                    ex.getCondition()
                    if hasattr(ex, "getCondition")
                    else ex.getErrorClass()
                )
                if cond != "_LEGACY_ERROR_TEMP_1012":
                    raise
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            cols = spark.table(self._qualified(table)).columns
            df.select(*cols).write.mode("overwrite").insertInto(
                self._qualified(table)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def overwrite_partitions_dynamic(
        self, df: DataFrame, table: str, part_col: str
    ) -> None:
        """Replace exactly the partitions PRESENT in ``df``, possibly
        many at once — untouched partitions' files are never read or
        rewritten (the partition-bounded MERGE write side). Catalog mode
        is snapshot-atomic on V2; the fallback relies on Spark's dynamic
        partition-overwrite commit, which replaces each touched partition
        directory idempotently (re-running the same write heals a crash —
        the same contract as ``overwrite_partition``)."""
        if self.catalog:
            self._catalog_overwrite_partitions(df, table, part_col)
            return
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.write.mode("overwrite")
                .partitionBy(part_col)
                .options(**self.write_options())
                .parquet(self._dir(table))
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def overwrite_table(self, df: DataFrame, table: str) -> None:
        """Whole-table atomic replace (the MERGE write side for small
        keyed digest tables). Catalog mode: V2 catalogs get the
        snapshot-atomic ``writeTo().createOrReplace()``; the session
        catalog (v1) gets ``saveAsTable(mode=overwrite)`` after an eager
        localCheckpoint — the checkpoint breaks lineage to the table
        being replaced, so the overwrite never reads from itself (the
        same self-read hazard the parquet fallback solves with a staging
        dir + rename in ``merge._atomic_overwrite``)."""
        if not self.catalog:
            from .merge import _atomic_overwrite

            _atomic_overwrite(df, self, table)
            return
        spark = df.sparkSession
        q = self._qualified(table)
        if spark.catalog.tableExists(q):
            df = df.localCheckpoint(eager=True)
        if self._is_v2_catalog(spark):
            from pyspark.errors import AnalysisException

            try:
                (
                    df.writeTo(q)
                    .option("compression-codec", self.compression)
                    .createOrReplace()
                )
                return
            except AnalysisException as ex:
                cond = (
                    ex.getCondition()
                    if hasattr(ex, "getCondition")
                    else ex.getErrorClass()
                )
                if cond != "_LEGACY_ERROR_TEMP_1012":
                    raise
        (
            df.write.mode("overwrite")
            .format("parquet")
            .options(**self.write_options())
            .saveAsTable(q)
        )

    def append_rows(self, df: DataFrame, table: str) -> None:
        """Append-only write (the INSERT side of MERGE WHEN NOT MATCHED).
        Catalog mode appends to the named table — columns are reordered
        to the existing table's layout first, so the position-resolved
        append can never silently transpose columns; the fallback appends
        parquet files under the table dir."""
        if self.catalog:
            spark = df.sparkSession
            q = self._qualified(table)
            if spark.catalog.tableExists(q):
                cols = spark.table(q).columns
                df = df.select(*cols)
                df.write.mode("append").format("parquet").options(
                    **self.write_options()
                ).saveAsTable(q)
            else:
                df.write.format("parquet").options(
                    **self.write_options()
                ).saveAsTable(q)
            return
        df.write.mode("append").options(**self.write_options()).parquet(
            self._dir(table)
        )

    def drop_table(self, spark: SparkSession, table: str) -> None:
        """Remove a table entirely (both backends). Only for DERIVED
        tables that are fully reconstructible from their source (e.g. a
        Bloom seen-set rebuilt from the target's keys) — never for data."""
        if self.catalog:
            spark.sql(f"DROP TABLE IF EXISTS {self._qualified(table)}")
            return
        shutil.rmtree(self._dir(table), ignore_errors=True)

    def get_table_property(self, spark: SparkSession, table: str, key: str) -> str | None:
        """Read one table property (None when absent). Properties carry
        layout pins (bucket counts) in catalog mode — the catalog-side
        twin of the fallback's dot-files, and exactly what Iceberg table
        properties are for."""
        rows = spark.sql(
            f"SHOW TBLPROPERTIES {self._qualified(table)}"
        ).collect()
        for r in rows:
            if r["key"] == key:
                return r["value"]
        return None

    def set_table_property(self, spark: SparkSession, table: str, key: str, value: str) -> None:
        spark.sql(
            f"ALTER TABLE {self._qualified(table)} "
            f"SET TBLPROPERTIES ('{key}'='{value}')"
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if self.catalog:
            return spark.read.table(self._qualified(table))
        return spark.read.option("basePath", self._dir(table)).parquet(self._dir(table))

    def read_partition(self, spark: SparkSession, table: str, part_col: str, value) -> DataFrame:
        if self.catalog:
            # the equality filter prunes to the partition on both v1
            # (hive-style pruning) and v2 (partition transforms) tables
            return (
                spark.read.table(self._qualified(table)).filter(F.col(part_col) == value)
            )
        # directory-level read == partition pruning in the fallback
        return spark.read.parquet(self._part_dir(table, part_col, value))

    def drop_partition(self, table: str, part_col: str, value, spark=None) -> None:
        if self.catalog:
            if spark is None:
                raise ValueError("catalog mode needs the SparkSession for DDL")
            spark.sql(
                f"ALTER TABLE {self._qualified(table)} DROP IF EXISTS "
                f"PARTITION ({part_col}={self._sql_lit(value)})"
            )
            return
        shutil.rmtree(self._part_dir(table, part_col, value), ignore_errors=True)

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str,
        n_buckets: int,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Bucketed table write (``bucketBy`` + ``saveAsTable``): two
        tables bucketed on the same key and count join WITHOUT an
        exchange — the shuffle happens once at write time and every
        later co-located join/aggregation reuses it. This is the Spark
        equivalent of pre-partitioning both sides of the reference's
        recurring vehicle_id joins instead of re-sharding per run
        (reference: fixed 10-vehicle shards, dags/reconciliation_worker_
        dag.py:56-63). Registered in the session catalog; files live
        under the TableIO root."""
        writer = df.write.mode("overwrite").options(**self.write_options())
        if not self.catalog:
            # unqualified name in the session catalog, files under root
            writer = writer.option("path", self._dir(table))
        writer = writer.bucketBy(n_buckets, bucket_col)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.format("parquet").saveAsTable(
            self._qualified(table) if self.catalog else table
        )

    def has_any_partition(self, table: str, part_col: str, spark=None) -> bool:
        """True if the partitioned table still holds at least one
        ``part_col=*`` partition (used by the bucketed MERGE to detect a
        fully-emptied table, which must be dropped rather than left as a
        schema-less directory)."""
        if self.catalog:
            if spark is None:
                raise ValueError("catalog mode needs the SparkSession")
            rows = spark.sql(
                f"SHOW PARTITIONS {self._qualified(table)}"
            ).limit(1).collect()
            return bool(rows)
        d = self._dir(table)
        if not os.path.isdir(d):
            return False
        return any(e.startswith(f"{part_col}=") for e in os.listdir(d))

    def partition_exists(self, table: str, part_col: str, value, spark=None) -> bool:
        if self.catalog:
            if spark is None:
                raise ValueError("catalog mode needs the SparkSession for DDL")
            if not spark.catalog.tableExists(self._qualified(table)):
                return False
            rows = spark.sql(
                f"SHOW PARTITIONS {self._qualified(table)} "
                f"PARTITION ({part_col}={self._sql_lit(value)})"
            ).collect()
            return len(rows) > 0
        d = self._part_dir(table, part_col, value)
        return os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS"))


def for_stage(root: str, stage: str, catalog: str | None = None, env=None) -> TableIO:
    """TableIO bound to a stage's resolved compression codec."""
    return TableIO(root, catalog=catalog, compression=stage_compression(stage, env))
