"""Upsert / merge sinks on the TableIO seam.

The reference's three writeback shapes (reference: plugins/services/
reconciliation_runner.py:285-426 temp-table bulk UPDATE; :501-631 batch
insert with dedup; plugins/operators/report_writer.py:106-265
INSERT ... ON DUPLICATE KEY UPDATE) are all MERGE semantics. On Iceberg
they become ``MERGE INTO``; the parquet fallback implements the same
contract as read -> anti-join -> union -> atomic overwrite. All three
are idempotent: re-running the same merge yields the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableio import TableIO


def _atomic_overwrite(df: DataFrame, io: TableIO, table: str) -> None:
    """Rewrite a table via staging dir + swap: the overwrite must not read
    from the directory it is replacing. The staging dir lives under
    io.root — the SAME filesystem as the target by construction — so the
    os.replace below is the atomic same-fs rename it requires (an
    Iceberg catalog replaces this whole dance with a snapshot commit)."""
    import os
    import shutil
    import uuid

    target_dir = f"{io.root}/{table}"
    # unique staging dir per call: two in-flight rewrites of the same
    # table must not overwrite each other's staging output (last
    # os.replace still wins the swap, but neither sees corrupt partials).
    # A failed write removes its own staging dir — unique names must not
    # become an unbounded orphan leak under the data root.
    staging = f"{io.root}/__staging__{table}__{uuid.uuid4().hex}"
    try:
        df.write.mode("overwrite").options(**io.write_options()).parquet(
            staging
        )
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(target_dir, ignore_errors=True)
    os.replace(staging, target_dir)


def merge_upsert(
    spark: SparkSession,
    io: TableIO,
    updates: DataFrame,
    table: str,
    keys: list[str],
) -> None:
    """MERGE: update rows matching on ``keys``, insert the rest.

    Iceberg path would be `MERGE INTO t USING u ON ... WHEN MATCHED THEN
    UPDATE * WHEN NOT MATCHED THEN INSERT *`; the fallback computes
    (existing ANTI updates) UNION updates and overwrites — same result,
    still snapshot-atomic at the directory level.

    This form rewrites the WHOLE table per call — right-sized for the
    small keyed digest tables it serves (ledger, report, alerts). For
    tables that grow with the corpus (LSH index, queue state), use
    ``merge_upsert_bucketed``: it rewrites only the key-bucket partitions
    an update touches.
    """
    import os

    if io.catalog is not None:
        raise NotImplementedError(
            "merge_upsert writes raw parquet under io.root and would "
            "silently bypass a catalog-backed TableIO; use "
            "merge_upsert_bucketed (catalog-aware) or Iceberg MERGE INTO"
        )
    target_dir = f"{io.root}/{table}"
    if os.path.isdir(target_dir):
        existing = spark.read.parquet(target_dir)
        surviving = existing.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        merged = surviving.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    _atomic_overwrite(merged, io, table)


# partition column for key-bucketed MERGE targets (hive layout
# root/table/__kb=N/); readers re-derive business columns only, so the
# name is reserved
BUCKET_COL = "__kb"


def key_bucket(keys: list[str], n_buckets: int):
    """Deterministic bucket-of-key column: crc32 over the '\\x1f'-joined
    key strings mod n_buckets. crc32 (not hash()) so the bucket of a key
    is stable across Spark versions/sessions — a key must land in the
    SAME partition on every merge or stale copies survive in old buckets."""
    joined = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return F.pmod(F.crc32(joined.cast("binary")), F.lit(n_buckets)).cast("int")


def _pin_n_buckets(io: TableIO, table: str, n_buckets: int) -> None:
    """Persist the table's bucket count on first write and verify it on
    every later merge — a different n_buckets would re-bucket keys into
    different partitions while stale rows survive in the old ones (the
    same loud-mismatch contract as the partition ledger's pinned
    n_partitions). Fallback-only seam: catalog mode carries the pin as a
    table comment-free contract (Iceberg's native bucket transform
    replaces it)."""
    import os

    pin = os.path.join(io._dir(table), ".nbuckets")
    if os.path.exists(pin):
        with open(pin) as fh:
            pinned = int(fh.read().strip())
        if pinned != n_buckets:
            raise ValueError(
                f"table '{table}' was bucketed with n_buckets={pinned}; "
                f"merging with n_buckets={n_buckets} would strand stale "
                "rows in old bucket partitions"
            )
    else:
        os.makedirs(io._dir(table), exist_ok=True)
        with open(pin, "w") as fh:
            fh.write(str(n_buckets))


def merge_upsert_bucketed(
    spark: SparkSession,
    io: TableIO,
    updates: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
) -> None:
    """Partition-bounded MERGE: the target is partitioned by a crc32
    bucket of the key, and an upsert reads + rewrites ONLY the bucket
    partitions its keys touch — at 100 TB a recrawl batch rewrites
    O(batch) partitions, never the whole index/queue table (the scale
    defect of the plain ``merge_upsert`` rewrite). Untouched partitions'
    files stay byte-identical on disk (asserted in tests).

    The updates frame is localCheckpointed: it feeds the touched-bucket
    list, the anti-join and the write, and each would otherwise re-derive
    the caller's lineage. Works in catalog mode too (dynamic partition
    overwrite / Iceberg ``overwritePartitions``)."""
    up = updates.withColumn(BUCKET_COL, key_bucket(keys, n_buckets)).localCheckpoint(
        eager=True
    )
    touched = sorted(r[0] for r in up.select(BUCKET_COL).distinct().collect())
    if not touched:
        return
    # existence BEFORE pinning: the pin creates the table dir, which must
    # not turn the first-ever merge into a read of an empty directory
    exists = io.table_exists(spark, table)
    legacy = False
    if exists:
        existing = io.read(spark, table)
        if BUCKET_COL in existing.columns:
            existing = existing.filter(F.col(BUCKET_COL).isin(touched))
        else:
            # one-time migration from an unbucketed legacy target (plain
            # merge_upsert layout): bucket every existing row and rewrite
            # the whole table ONCE; later merges are partition-bounded.
            # Fallback-only path — catalog tables created here always
            # carry the bucket partition column.
            if io.catalog:
                raise NotImplementedError(
                    f"catalog table '{table}' has no {BUCKET_COL} partition "
                    "column; migrate it to the bucketed layout explicitly"
                )
            legacy = True
            existing = existing.withColumn(BUCKET_COL, key_bucket(keys, n_buckets))
        surviving = existing.join(
            up.select(*keys).distinct(), on=keys, how="left_anti"
        )
        merged = surviving.unionByName(up, allowMissingColumns=True)
    else:
        merged = up
    if legacy:
        # materialize BEFORE clearing the flat legacy files the plan
        # reads from; dynamic overwrite alone would leave them beside
        # the new __kb=* dirs as stale duplicates
        import shutil

        merged = merged.localCheckpoint(eager=True)
        shutil.rmtree(io._dir(table), ignore_errors=True)
    if not io.catalog:
        _pin_n_buckets(io, table, n_buckets)
    io.overwrite_partitions_dynamic(merged, table, BUCKET_COL)


def read_merged(spark: SparkSession, io: TableIO, table: str) -> DataFrame:
    """Read a (possibly bucket-partitioned) merge target with the
    internal bucket column stripped."""
    df = io.read(spark, table)
    return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df


def insert_missing(
    spark: SparkSession,
    io: TableIO,
    rows: DataFrame,
    table: str,
    keys: list[str],
) -> int:
    """Append only rows whose keys are absent — the reference's
    query-existing + anti-filter + batch insert (reconciliation_runner.py:
    501-631) as one anti join + append. The anti join is materialized
    ONCE (eager localCheckpoint): count and write both read the
    checkpointed rows instead of re-deriving the join (and re-reading the
    target) per action.

    Refuses a target that carries a Bloom seen-set (``{table}__bloom``):
    appending here without setting the keys' bits would leave the filter
    a non-superset of the table, and a later ``insert_missing_bloomed``
    re-delivery would rate those keys "definitely new" and double-insert
    them — the two entry points must not be mixed per table."""
    import os

    if io.catalog is not None:
        raise NotImplementedError(
            "insert_missing reads/appends raw parquet under io.root and "
            "would bypass a catalog-backed TableIO; use Iceberg MERGE "
            "WHEN NOT MATCHED THEN INSERT on the catalog path"
        )
    target_dir = f"{io.root}/{table}"
    if os.path.isdir(f"{io.root}/{_bloom_table(table)}"):
        raise ValueError(
            f"table '{table}' is bloom-tracked ({_bloom_table(table)} exists); "
            "use insert_missing_bloomed so the filter stays a superset of "
            "the table's keys"
        )
    if os.path.isdir(target_dir):
        existing_keys = spark.read.parquet(target_dir).select(*keys).distinct()
        fresh = rows.join(existing_keys, on=keys, how="left_anti")
    else:
        fresh = rows
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        fresh.write.mode("append").options(**io.write_options()).parquet(target_dir)
    return n


def latest_wins_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Pick the newest row per key before merging (CDC compaction)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


BLOOM_M, BLOOM_K = 1 << 20, 3


def _bloom_table(table: str) -> str:
    return f"{table}__bloom"


def _pin_bloom_params(io: TableIO, table: str, m: int, k: int) -> None:
    """Persist (m, k) on first use and verify on every later call — the
    same loud-mismatch contract as ``_pin_n_buckets``: probing with a
    different modulus/hash-count than the stored bits were built with
    would rate seen keys "definitely new" and silently double-insert."""
    import os

    # pin file sits BESIDE the table dir, not inside it: creating the
    # table dir here would flip the dir-based table_exists probe before
    # any bits are written and break the bootstrap/read path
    pin = os.path.join(io.root, f".bloomparams__{table}")
    if os.path.exists(pin):
        with open(pin) as fh:
            pm, pk = (int(x) for x in fh.read().split(":"))
        if (pm, pk) != (m, k):
            raise ValueError(
                f"bloom filter '{table}' was built with m={pm}, k={pk}; "
                f"probing with m={m}, k={k} would miss its bits and "
                "double-insert seen keys"
            )
    else:
        os.makedirs(io.root, exist_ok=True)
        with open(pin, "w") as fh:
            fh.write(f"{m}:{k}")


def insert_missing_bloomed(
    spark: SparkSession,
    io: TableIO,
    rows: DataFrame,
    table: str,
    keys: list[str],
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> int:
    """``insert_missing`` with a maintained Bloom seen-set prefilter.

    The plain form's cost at scale is the anti join against the target's
    full key set. A Bloom filter over the already-inserted keys makes
    "definitely new" decidable WITHOUT touching the target (no false
    negatives by construction): definitely-new rows append directly and
    only maybe-seen rows (true re-deliveries or hash collisions) run the
    exact anti join — with none, the target's keys are never read at
    all. Exactness is preserved; the filter only routes.

    The bit set lives in ``{table}__bloom`` (one ``pos`` column, <= m
    rows, so its merge is a bounded-size rewrite) and is BOOTSTRAPPED
    from the target's existing keys when absent — a pre-existing target
    without a filter must not make old keys "definitely new". Crash
    ordering: bits merge BEFORE the data append. A crash in between
    leaves keys set in the filter but absent from the target, so the
    replay routes them to the maybe side and the exact anti join admits
    them — idempotent. (Append-first would be the unsafe order: a crash
    before the bit-merge makes replayed keys "definitely new" and
    double-inserts them.)
    """
    import os

    from ..operators.dedup import _bloom_probes, bloom_probe

    if io.catalog is not None:
        raise NotImplementedError(
            "insert_missing_bloomed reads/appends raw parquet under "
            "io.root; on a catalog the filter pairs with Iceberg MERGE "
            "WHEN NOT MATCHED THEN INSERT (bits-before-merge ordering "
            "unchanged)"
        )
    kj = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys]).alias("__kj")
    target_dir = f"{io.root}/{table}"
    target_exists = os.path.isdir(target_dir)
    bloom_tbl = _bloom_table(table)
    _pin_bloom_params(io, bloom_tbl, m, k)
    if not io.table_exists(spark, bloom_tbl) and target_exists:
        seed = spark.read.parquet(target_dir).select(kj).distinct()
        merge_upsert(
            spark, io, _bloom_probes(seed, m, k, "bl", "__kj").select("pos").distinct(),
            bloom_tbl, keys=["pos"],
        )
    staged = rows.withColumn("__kj", kj).localCheckpoint(eager=True)
    if io.table_exists(spark, bloom_tbl):
        bits = read_merged(spark, io, bloom_tbl)
        verdict = bloom_probe(staged.select("__kj"), bits, m, k, id_col="__kj")
        # materialize the probe ONCE: isEmpty, both union branches and
        # the final checkpoint would each re-run the explode + broadcast
        # join + groupBy otherwise (same discipline as insert_missing)
        staged = staged.join(verdict, "__kj").localCheckpoint(eager=True)
        new_side = staged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = staged.filter(F.col("maybe_seen")).drop("maybe_seen")
        if maybe.isEmpty() or not target_exists:
            # collisions with no target to check against are still new
            # (bits from a crashed pre-append merge have no target rows)
            fresh = staged.drop("maybe_seen")
        else:
            existing_keys = spark.read.parquet(target_dir).select(*keys).distinct()
            checked = maybe.join(existing_keys, on=keys, how="left_anti")
            fresh = new_side.unionByName(checked)
    else:
        fresh = staged  # no filter and no target: everything is new
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        # bits FIRST (see crash-ordering contract above), then the data
        merge_upsert(
            spark,
            io,
            _bloom_probes(
                fresh.select("__kj"), m, k, "bl", "__kj"
            ).select("pos").distinct(),
            bloom_tbl,
            keys=["pos"],
        )
        fresh.drop("__kj").write.mode("append").options(**io.write_options()).parquet(
            target_dir
        )
    return n
