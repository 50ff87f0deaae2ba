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

    Backend-agnostic: catalog mode reads the named table and replaces it
    through ``TableIO.overwrite_table`` (snapshot ``createOrReplace`` on
    a V2/Iceberg catalog, checkpoint + ``saveAsTable`` overwrite on the
    v1 session catalog); the fallback keeps the staging-dir + rename
    swap. Same contract either way: idempotent replace keyed on ``keys``.
    """
    if io.table_exists(spark, table):
        existing = io.read(spark, table)
        surviving = existing.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        merged = surviving.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    io.overwrite_table(merged, table)


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


NBUCKETS_PROP = "dqx.nbuckets"


def _nbuckets_mismatch(table: str, pinned: int, n_buckets: int) -> ValueError:
    return ValueError(
        f"table '{table}' was bucketed with n_buckets={pinned}; "
        f"merging with n_buckets={n_buckets} would strand stale "
        "rows in old bucket partitions"
    )


def _pin_n_buckets(io: TableIO, table: str, n_buckets: int) -> None:
    """Persist the table's bucket count on first write and verify it on
    every later merge — a different n_buckets would re-bucket keys into
    different partitions while stale rows survive in the old ones (the
    same loud-mismatch contract as the partition ledger's pinned
    n_partitions). Fallback seam: catalog mode carries the pin as the
    ``dqx.nbuckets`` table property instead (``_pin_n_buckets_catalog``;
    Iceberg's native bucket transform would subsume both)."""
    import os

    pin = os.path.join(io._dir(table), ".nbuckets")
    if os.path.exists(pin):
        with open(pin) as fh:
            pinned = int(fh.read().strip())
        if pinned != n_buckets:
            raise _nbuckets_mismatch(table, pinned, n_buckets)
    else:
        os.makedirs(io._dir(table), exist_ok=True)
        with open(pin, "w") as fh:
            fh.write(str(n_buckets))


def _pin_n_buckets_catalog(
    spark: SparkSession, io: TableIO, table: str, n_buckets: int
) -> None:
    """Catalog-mode twin of ``_pin_n_buckets``: the bucket count lives in
    the ``dqx.nbuckets`` table property. Called BEFORE the data commit on
    a table that already exists (the caller creates an empty schema-pinned
    table first on the first merge): verify and raise on mismatch. A
    pre-pin legacy table (property absent) is stamped with the caller's
    count, matching the fallback's adopt-on-first-sight behavior."""
    pinned = io.get_table_property(spark, table, NBUCKETS_PROP)
    if pinned is None:
        io.set_table_property(spark, table, NBUCKETS_PROP, str(n_buckets))
    elif int(pinned) != n_buckets:
        raise _nbuckets_mismatch(table, int(pinned), n_buckets)


def merge_upsert_bucketed(
    spark: SparkSession,
    io: TableIO,
    updates: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
    replace_keys: DataFrame | None = None,
) -> None:
    """Partition-bounded MERGE: the target is partitioned by a crc32
    bucket of the key, and an upsert reads + rewrites ONLY the bucket
    partitions its keys touch — at 100 TB a recrawl batch rewrites
    O(batch) partitions, never the whole index/queue table (the scale
    defect of the plain ``merge_upsert`` rewrite). Untouched partitions'
    files stay byte-identical on disk (asserted in tests).

    ``replace_keys`` (a keys-schema frame) widens the replace set beyond
    the keys present in ``updates``: every replace_keys key has its
    existing rows dropped even when updates carries NO rows for it —
    required by wholesale-replace callers whose per-key row count can
    shrink to ZERO (a recrawled doc that no longer yields any
    fingerprint/token rows would otherwise keep its stale rows, since
    the anti-join below only sees keys that appear in updates).

    The updates frame is localCheckpointed: it feeds the touched-bucket
    list, the anti-join and the write, and each would otherwise re-derive
    the caller's lineage. Works in catalog mode too (dynamic partition
    overwrite / Iceberg ``overwritePartitions``)."""
    up = updates.withColumn(BUCKET_COL, key_bucket(keys, n_buckets)).localCheckpoint(
        eager=True
    )
    if replace_keys is not None:
        # union with updates' own keys: a key present in updates but
        # missing from replace_keys would otherwise land in a bucket
        # whose existing rows were never read — the dynamic partition
        # overwrite would then silently drop them
        replace = (
            replace_keys.select(*keys)
            .unionByName(up.select(*keys))
            .distinct()
            .withColumn(BUCKET_COL, key_bucket(keys, n_buckets))
            .localCheckpoint(eager=True)
        )
    else:
        replace = up.select(*keys, BUCKET_COL).distinct()
    touched = sorted(
        r[0] for r in replace.select(BUCKET_COL).distinct().collect()
    )
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
            replace.select(*keys), on=keys, how="left_anti"
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
    if replace_keys is not None:
        # a replace-only key (zero update rows) can EMPTY a bucket, and
        # dynamic partition overwrite cannot express "this partition now
        # has no rows" — an empty write touches nothing and the stale
        # files would survive. Drop emptied buckets explicitly. Only the
        # replace_keys path can empty a bucket (without it every touched
        # bucket contains at least the update rows that defined it).
        merged = merged.localCheckpoint(eager=True)
        kept = {r[0] for r in merged.select(BUCKET_COL).distinct().collect()}
        if exists:
            for b in touched:
                if b not in kept:
                    io.drop_partition(table, BUCKET_COL, b, spark=spark)
            # a table whose LAST partition was just dropped is a
            # schema-less directory the reader chokes on — drop it so it
            # reads as nonexistent (readers already handle absence)
            if not io.has_any_partition(table, BUCKET_COL, spark=spark):
                io.drop_table(spark, table)
        if not kept:
            return
    if io.catalog:
        if not io.table_exists(spark, table):
            # pin BEFORE data, mirroring the fallback's ordering: create
            # the empty schema-pinned table, stamp the property, THEN
            # commit rows. A crash between create and stamp leaves an
            # EMPTY unpinned table (the next merge adopts its own count
            # over zero rows — harmless); stamping after the data commit
            # would instead leave committed buckets that a later merge
            # with a different count could silently adopt and strand.
            io._ensure_catalog_table(merged, table, BUCKET_COL)
        _pin_n_buckets_catalog(spark, io, table, n_buckets)
    else:
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
    them — the two entry points must not be mixed per table.

    Backend-agnostic: catalog mode reads the named table and appends via
    ``TableIO.append_rows`` (Iceberg MERGE WHEN NOT MATCHED THEN INSERT
    is the native form; anti-join + append is the same result set), the
    fallback appends parquet files."""
    if io.table_exists(spark, _bloom_table(table)):
        raise ValueError(
            f"table '{table}' is bloom-tracked ({_bloom_table(table)} exists); "
            "use insert_missing_bloomed so the filter stays a superset of "
            "the table's keys"
        )
    if io.table_exists(spark, table):
        existing_keys = io.read(spark, table).select(*keys).distinct()
        fresh = rows.join(existing_keys, on=keys, how="left_anti")
    else:
        fresh = rows
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        io.append_rows(fresh, table)
    return n


def latest_wins_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Pick the newest row per key before merging (CDC compaction)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


BLOOM_M, BLOOM_K = 1 << 20, 3
# estimated false-positive rate that triggers a rebuild at a larger m;
# rebuilds target FPR <= REBUILD/4 for headroom so they can't thrash
BLOOM_FPR_REBUILD = 0.05


def _bloom_table(table: str) -> str:
    return f"{table}__bloom"


def _bloom_fpr(n: int, m: int, k: int) -> float:
    """Standard Bloom FPR estimate (1 - e^{-kn/m})^k for n inserted keys."""
    import math

    return (1.0 - math.exp(-k * n / m)) ** k


def _bloom_pin_path(io: TableIO, table: str) -> str:
    # pin file sits BESIDE the table dir, not inside it: creating the
    # table dir here would flip the dir-based table_exists probe before
    # any bits are written and break the bootstrap/read path. Used in
    # both backends (an Iceberg deployment would carry m:k:n as table
    # properties on the bits table instead).
    import os

    return os.path.join(io.root, f".bloomparams__{table}")


def _read_bloom_pin(io: TableIO, table: str) -> tuple[int, int, int] | None:
    """(m, k, n_inserted) or None. Legacy two-field pins ('m:k') read as
    n=0 — the count estimate catches up as later inserts accumulate."""
    import os

    pin = _bloom_pin_path(io, table)
    if not os.path.exists(pin):
        return None
    with open(pin) as fh:
        parts = fh.read().strip().split(":")
    m, k = int(parts[0]), int(parts[1])
    n = int(parts[2]) if len(parts) > 2 else 0
    return m, k, n


def _write_bloom_pin(io: TableIO, table: str, m: int, k: int, n: int) -> None:
    import os

    os.makedirs(io.root, exist_ok=True)
    with open(_bloom_pin_path(io, table), "w") as fh:
        fh.write(f"{m}:{k}:{n}")


def _resolve_bloom_params(
    io: TableIO, table: str, m: int, k: int
) -> tuple[int, int, int]:
    """Caller (m, k) vs the pin: k must match exactly, and the pinned m
    must be the caller's m grown by a power of 4 (saturation rebuilds
    quadruple m, so a steady caller passing the original default keeps
    working after the filter grew underneath it). Anything else is the
    loud mismatch — probing with a foreign modulus/hash-count would rate
    seen keys "definitely new" and silently double-insert. Returns the
    effective (m, k, n_inserted)."""
    pin = _read_bloom_pin(io, table)
    if pin is None:
        _write_bloom_pin(io, table, m, k, 0)
        return m, k, 0
    pm, pk, n = pin
    grown = pm // m if (pm >= m and pm % m == 0) else 0
    # power of 4: power of 2 with an even exponent
    pow4 = grown > 0 and (grown & (grown - 1)) == 0 and (grown.bit_length() - 1) % 2 == 0
    if pk != k or not pow4:
        raise ValueError(
            f"bloom filter '{table}' was built with m={pm}, k={pk}; "
            f"probing with m={m}, k={k} would miss its bits and "
            "double-insert seen keys"
        )
    return pm, pk, n


def _rebuild_bloom(
    spark: SparkSession, io: TableIO, table: str, bloom_tbl: str, kj, k: int, new_m: int
) -> int:
    """Rebuild the seen-set from the target's EXACT key set at capacity
    ``new_m`` — a wholesale replace, never a merge: bit positions from
    the old modulus are meaningless at the new one. Crash-safe ordering:
    (1) drop the old bits (derived data, reconstructible), (2) pin the
    new (m, k, n), (3) write the new bits. A crash after (1) leaves
    no-bits + old pin and a crash after (2) leaves no-bits + new pin —
    both recover through the bootstrap path on the next call; bits and
    pin are never simultaneously inconsistent."""
    from ..operators.dedup import _bloom_probes

    seed = io.read(spark, table).select(kj).distinct().localCheckpoint(eager=True)
    n = seed.count()
    io.drop_table(spark, bloom_tbl)
    _write_bloom_pin(io, bloom_tbl, new_m, k, n)
    bits = _bloom_probes(seed, new_m, k, "bl", "__kj").select("pos").distinct()
    io.overwrite_table(bits, bloom_tbl)
    return n


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

    Saturation contract: the pin tracks an inserted-distinct-key count n
    beside (m, k); when the estimated FPR (1-e^{-kn/m})^k crosses
    ``BLOOM_FPR_REBUILD`` the filter is REBUILT from the target's exact
    keys at 4x (or more) capacity with a loud warning — without this the
    FPR quietly climbs toward 1 and the prefilter degrades into the plain
    anti join plus wasted probe work. n is an estimate (a replayed crash
    window can skip an increment); any rebuild or bootstrap resets it to
    the target's exact distinct-key count. Callers keep passing the
    ORIGINAL m — ``_resolve_bloom_params`` accepts pinned power-of-4
    growth and still raises on a genuinely foreign (m, k).

    Backend-agnostic: target reads/appends and bits-table writes all go
    through the TableIO seam (catalog mode pairs the same routing with
    Iceberg MERGE WHEN NOT MATCHED THEN INSERT; ordering unchanged).
    """
    import warnings

    from ..operators.dedup import _bloom_probes, bloom_probe

    kj = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys]).alias("__kj")
    target_exists = io.table_exists(spark, table)
    bloom_tbl = _bloom_table(table)
    m, k, n_seen = _resolve_bloom_params(io, bloom_tbl, m, k)
    if not io.table_exists(spark, bloom_tbl) and target_exists:
        # bootstrap (also the recovery path for a crashed rebuild): bits
        # from the target's exact keys at the pinned capacity
        n_seen = _rebuild_bloom(spark, io, table, bloom_tbl, kj, k, m)
    elif (
        io.table_exists(spark, bloom_tbl)
        and target_exists
        and _bloom_fpr(n_seen, m, k) > BLOOM_FPR_REBUILD
    ):
        new_m = m
        while _bloom_fpr(n_seen, new_m, k) > BLOOM_FPR_REBUILD / 4:
            new_m *= 4
        warnings.warn(
            f"bloom filter '{bloom_tbl}' saturated (n~{n_seen}, m={m}, "
            f"est. FPR {_bloom_fpr(n_seen, m, k):.3f} > "
            f"{BLOOM_FPR_REBUILD}); rebuilding at m={new_m} from the "
            "target's keys",
            stacklevel=2,
        )
        n_seen = _rebuild_bloom(spark, io, table, bloom_tbl, kj, k, new_m)
        m = new_m
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
            existing_keys = io.read(spark, table).select(*keys).distinct()
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
        io.append_rows(fresh.drop("__kj"), table)
        n_seen += fresh.select("__kj").distinct().count()
        _write_bloom_pin(io, bloom_tbl, m, k, n_seen)
    return n
