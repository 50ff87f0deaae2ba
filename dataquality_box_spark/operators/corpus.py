"""Corpus-level statistical diagnostics: Heaps' vocabulary-growth curve,
Zipf head inspection, and CCNet-style chunk (paragraph) deduplication
statistics.

These are the "is this corpus healthy?" reports a training-data pipeline
runs before committing compute: a vocabulary curve that flattens too
early means the corpus is template traffic; a Zipf head whose products
collapse means a handful of tokens dominate; a high duplicated-chunk
fraction means paragraph-level boilerplate survived document-level dedup
(the gap CCNet's sharded paragraph dedup closes — Wenzek et al. 2020).

Every operator is plain DataFrame ops with an exact DuckDB twin in
driver_queries.py. Scale posture is documented per function.

Reference analog: the reference's scope ends at per-record validation
(plugins/services/data_quality_runner.py); these corpus-shape reports
are the brief's LLM-curation extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def heaps_curve(docs: DataFrame, points: int = 10) -> DataFrame:
    """Vocabulary size vs corpus size at ``points`` doc_id-ordered
    cutoffs (Heaps' law: V ~ k*N^beta; a curve that flattens early
    signals a vocabulary-starved / templated corpus).

    Each token's contribution to the curve is its FIRST document
    (min doc_id), so vocab(cutoff) = |{tok : first_doc <= cutoff}| —
    one explode + one tok-keyed agg, then a 10-row broadcast cross join
    and a 10-key agg with map-side partials. No per-cutoff corpus
    rescans: the corpus is read once however many points are asked for.

    Returns (cutoff BIGINT, corpus_tokens BIGINT, vocab BIGINT) —
    both measures cumulative at each cutoff.
    """
    tk = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    first = tk.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    sizes = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
    cuts = (
        docs.agg(F.max("doc_id").alias("mx"))
        .select(F.explode(F.sequence(F.lit(1), F.lit(points))).alias("i"), "mx")
        .select(
            F.ceil(F.col("mx") * F.col("i") / float(points)).cast("long").alias("cutoff")
        )
        # small corpora can collide cutoffs (ceil of adjacent i equal);
        # a duplicated cutoff row would double-count through the cross
        # join below
        .distinct()
    )
    vocab = (
        first.crossJoin(F.broadcast(cuts))
        .where(F.col("first_doc") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count("*").alias("vocab"))
    )
    corpus = (
        sizes.crossJoin(F.broadcast(cuts))
        .where(F.col("doc_id") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.sum("n").alias("corpus_tokens"))
    )
    # LEFT join + 0-coalesce: a cutoff where no token's first_doc fits
    # (all early docs empty-text) must still emit vocab=0 — the oracle's
    # correlated-subquery twin does, and an inner join would drop the
    # row, a cross-engine row-count mismatch on degenerate corpora
    # (ADVICE r5). Identical on any corpus where every cutoff has vocab.
    return corpus.join(vocab, "cutoff", "left").select(
        "cutoff",
        "corpus_tokens",
        F.coalesce(F.col("vocab"), F.lit(0)).alias("vocab"),
    )


def zipf_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Zipf head report: the ``k`` most frequent tokens with their rank
    and the rank*count product (flat products across the head = the
    corpus obeys Zipf; a collapsing product = token-concentration
    pathology, e.g. boilerplate or repetition artifacts).

    The global top-k goes through orderBy(...).limit(k), which Catalyst
    executes as TakeOrderedAndProject (per-partition heaps + one k-row
    merge — no global sort materializes at any scale); the rank window
    then runs over k rows only. Ties break on the token string so both
    engines produce the identical head.

    Returns (rank INT, tok, cnt BIGINT, zipf_product BIGINT).
    """
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    head = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return head.select(
        F.row_number().over(w).cast("int").alias("rank"), "tok", "cnt"
    ).withColumn("zipf_product", (F.col("rank") * F.col("cnt")).cast("long"))


def chunk_dedup_stats(docs: DataFrame, chunk_tokens: int = 16) -> DataFrame:
    """CCNet-style paragraph-level dedup statistics over NON-overlapping
    ``chunk_tokens``-token chunks (the complement of the OVERLAPPING
    rolling windows in duplicated_span_stats: spans measure how much text
    is shared; chunks measure what a paragraph-dedup pass would remove).

    Each doc explodes into ceil(n/chunk) chunks; chunk identity is the
    md5 of its joined tokens, so shuffles carry 16-byte keys, not text.
    A chunk is duplicated when it occurs in >= 2 DISTINCT docs. Shape:
    one explode + one hash-keyed agg + one doc_id agg — the
    shared-hash-fraction idiom that held sublinear at 10x corpus.

    Returns per doc: (doc_id, n_chunks INT, n_dup_chunks INT,
    dup_chunk_frac DOUBLE round 6).
    """
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size("toks") / float(chunk_tokens)).cast("int")
    chunks = (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
            "toks",
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("toks"), F.col("ci") * chunk_tokens + 1, chunk_tokens
                    ),
                )
            ).alias("h"),
        )
    )
    dup = (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .select("h", (F.col("ndocs") >= 2).cast("int").alias("is_dup"))
    )
    return (
        chunks.join(dup, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum("is_dup").cast("int").alias("n_dup_chunks"),
            F.round(F.sum("is_dup") / F.count("*").cast("double"), 6).alias(
                "dup_chunk_frac"
            ),
        )
    )


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Marginal novelty per document: the fraction of the doc's distinct
    n-gram shingles whose FIRST corpus occurrence (min doc_id) is this
    doc. The doc-level complement of ``heaps_curve``: a curation pass
    orders/ranks docs by how much genuinely new text they contribute —
    near-zero novelty late in the corpus = template/boilerplate traffic
    even when exact/MinHash dedup passes.

    Shape: explode -> per-doc DISTINCT shingle (md5, 16-byte shuffle
    keys) -> one shingle-keyed min agg -> join back on the same key ->
    one doc agg. Same shared-hash idiom measured sublinear at 10x.

    Returns (doc_id, n_shingles INT, n_novel INT, novelty DOUBLE r6).
    """
    from ..functions.text import ngram_explode, tokens

    sh = (
        ngram_explode(docs, ["doc_id"], tokens(F.col("text")), n)
        .select("doc_id", F.md5(F.col("g")).alias("h"))
        .distinct()
    )
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("int")
            .alias("n_novel"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
                / F.count("*").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def template_prefix_groups(
    docs: DataFrame, prefix_tokens: int = 8, min_group: int = 2
) -> DataFrame:
    """Template-traffic detection by shared document PREFIX: docs whose
    first ``prefix_tokens`` tokens are identical form a group (form
    letters, scaffolded generations, boilerplate headers). Near-dup
    routes need the whole doc similar; this catches the
    same-header-different-body shape they miss.

    One md5(prefix) hash agg; group keys are 16 bytes on the shuffle.
    Returns one row per group with >= min_group members:
    (prefix_hash, n_docs INT, min_doc_id BIGINT, sample_prefix).
    """
    toks = tokens(F.col("text"))
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    p = docs.where(F.size(toks) >= prefix_tokens).select(
        "doc_id", prefix.alias("prefix")
    )
    return (
        p.groupBy(F.md5(F.col("prefix")).alias("prefix_hash"))
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.min("prefix").alias("sample_prefix"),
        )
        .filter(F.col("n_docs") >= min_group)
    )


def chunk_dedup_rewrite(docs: DataFrame, chunk_tokens: int = 16) -> DataFrame:
    """The TRANSFORM companion to ``chunk_dedup_stats``: rebuild each
    document keeping only chunks whose FIRST corpus occurrence (ordered
    by (doc_id, chunk_idx)) is this position — C4's "discard any span
    seen before" as an actual text rewrite, not a report. Paragraph
    boilerplate that survives document-level dedup is physically removed
    while the first copy keeps the corpus lossless.

    Shape: one explode; first-occurrence is a map-side-combinable
    min(struct(doc_id, ci)) agg keyed on the 16-byte chunk md5 (no
    per-partition sort, unlike a window); the join back and the doc_id
    reassembly are the only shuffles that carry chunk text — both are
    unavoidable for a rewrite (text must move to its output row).

    Returns (doc_id, n_chunks INT, n_kept INT, new_text) for every doc
    with >= 1 token; a doc whose every chunk is a repeat gets
    new_text = ''.
    """
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size("toks") / float(chunk_tokens)).cast("int")
    chunks = (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
            "toks",
        )
        .select(
            "doc_id",
            "ci",
            F.concat_ws(
                " ",
                F.slice(F.col("toks"), F.col("ci") * chunk_tokens + 1, chunk_tokens),
            ).alias("chunk"),
        )
        .withColumn("h", F.md5(F.col("chunk")))
    )
    first = chunks.groupBy("h").agg(
        F.min(F.struct(F.col("doc_id").alias("d"), F.col("ci").alias("c"))).alias(
            "fst"
        )
    )
    keep = (F.col("doc_id") == F.col("fst.d")) & (F.col("ci") == F.col("fst.c"))
    return (
        chunks.join(first, "h")
        .withColumn("keep", keep)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum(F.col("keep").cast("int")).cast("int").alias("n_kept"),
            # field extraction via GetArrayStructFields (codegen), NOT a
            # higher-order transform(x -> x["chunk"]) lambda: interpreted
            # lambdas serialize across task threads (the repo's measured
            # 19-22x n-gram finding) and this sits on the hot path of a
            # corpus-wide rewrite. Identical output: collect_list skips
            # the non-kept NULL structs, array_sort orders by (ci, chunk),
            # .chunk extracts the same field per element.
            F.concat_ws(
                " ",
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct(
                                F.col("ci").alias("ci"),
                                F.col("chunk").alias("chunk"),
                            ),
                        )
                    )
                ).getField("chunk"),
            ).alias("new_text"),
        )
    )


def _winnow_selected(docs: DataFrame, k: int, w: int) -> DataFrame:
    """(doc_id, m, win_min) rows: each full w-window's minimum 4-gram
    hash, one row per window start (duplicates collapse downstream)."""
    from ..functions.text import ngram_explode

    grams = ngram_explode(
        docs, ["doc_id"], tokens(F.col("text")), k, pos_col="pos"
    ).select("doc_id", "pos", F.md5(F.col("g")).alias("h"))
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    per_doc = Window.partitionBy("doc_id")
    return (
        grams.withColumn("m", F.count("*").over(per_doc))
        .withColumn("win_min", F.min("h").over(frame))
        .where(F.col("pos") <= F.col("m") - w)
        .select("doc_id", "m", "win_min")
    )


def winnow_fingerprint_set(docs: DataFrame, k: int = 4, w: int = 3) -> DataFrame:
    """Distinct (doc_id, fingerprint) pairs — the raw selected set, the
    unit an overlap index stores and joins on."""
    return (
        _winnow_selected(docs, k, w)
        .select("doc_id", F.col("win_min").alias("fingerprint"))
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 3
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-gram, slide a w-hash window, keep
    each window's MINIMUM hash — the selected set is position-robust
    (guaranteed to share fingerprints with any copy of a passage longer
    than w+k-1 tokens) and ~1/w the size of the full shingle set, which
    is exactly what an extreme-scale overlap index wants to store.

    Consecutive windows usually select the same minimum, so the distinct
    step collapses runs; only the distinct hash VALUES matter (the
    standard no-position variant), which keeps the window frame a plain
    min(h) — no argmin tie-break to disagree on across engines.

    Returns per doc: (doc_id, n_grams INT, n_fingerprints INT,
    fp_digest) where fp_digest is the md5 of the sorted concatenated
    fingerprint hashes — an order-free set digest two corpora can be
    compared by.

    Shape: one explode + one per-doc window sweep (partition-local, no
    extra shuffle beyond the doc_id sort) + one doc agg.
    """
    sel = _winnow_selected(docs, k, w)
    return (
        sel.groupBy("doc_id")
        .agg(
            F.max("m").cast("int").alias("n_grams"),
            F.countDistinct("win_min").cast("int").alias("n_fingerprints"),
            # sort_array, not array_sort: identical on these null-free
            # md5 strings, but array_sort's default comparator is an
            # interpreted lambda (thread-serialized); sort_array is not
            F.md5(
                F.concat_ws(
                    "", F.sort_array(F.collect_set("win_min"))
                )
            ).alias("fp_digest"),
        )
    )


def winnow_overlap_pairs(
    docs_a: DataFrame, docs_b: DataFrame, k: int = 4, w: int = 3, min_shared: int = 1
) -> DataFrame:
    """Cross-corpus overlap at winnowing-fingerprint granularity: pairs
    (doc_a, doc_b) sharing >= ``min_shared`` selected fingerprints, with
    the shared count and each side's set size — the pairwise "query the
    overlap index" operation the fingerprint set exists for
    (decontamination and plagiarism-style audits run this between a
    training corpus and an eval/benchmark corpus).

    Scale posture: both sides reduce to distinct (doc_id, fingerprint)
    first (~1/w of the shingle volume, 16-byte hashes), the pair join is
    fingerprint-keyed equality — candidate work is Sum over fingerprints
    of |A_fp| * |B_fp|, the same bucket-bound as the LSH routes, never
    |A| * |B|.

    Returns (doc_a, doc_b, n_shared INT, n_fp_a INT, n_fp_b INT).
    """
    fa = winnow_fingerprint_set(docs_a, k, w).withColumnsRenamed(
        {"doc_id": "doc_a", "fingerprint": "fp"}
    )
    fb = winnow_fingerprint_set(docs_b, k, w).withColumnsRenamed(
        {"doc_id": "doc_b", "fingerprint": "fp"}
    )
    sizes_a = fa.groupBy("doc_a").agg(F.count("*").alias("n_fp_a"))
    sizes_b = fb.groupBy("doc_b").agg(F.count("*").alias("n_fp_b"))
    shared = (
        fa.join(fb, "fp")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes_a, "doc_a")
        .join(sizes_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.col("n_fp_a").cast("int").alias("n_fp_a"),
            F.col("n_fp_b").cast("int").alias("n_fp_b"),
        )
    )


def persist_winnow_index(
    spark,
    io,
    docs: DataFrame,
    k: int = 4,
    w: int = 3,
    prefix: str = "winnow_corpus",
    n_buckets: int = 16,
) -> None:
    """Persist the corpus's winnowing-fingerprint index through TableIO:
    ``{prefix}_fps`` (doc_id, fingerprint) — the exact-substring analog
    of the stored MinHash index (dedup.persist_corpus_index), holding
    ~1/w of the shingle volume by the winnowing density bound.

    Partition-bounded MERGE keyed on doc_id: a recrawl batch rewrites
    only the crc32 bucket partitions its doc ids touch, and a
    re-delivered doc's fingerprints are replaced WHOLESALE (stale rows
    from a changed doc would inflate n_shared) — including the
    shrink-to-zero case: the replace set is the batch's doc ids, not the
    fingerprint rows, so a recrawled doc now too short to yield any
    fingerprint still has its old rows deleted. The SAME call creates
    and grows the index.
    """
    from ..sources.merge import merge_upsert_bucketed

    merge_upsert_bucketed(
        spark,
        io,
        winnow_fingerprint_set(docs, k, w),
        f"{prefix}_fps",
        keys=["doc_id"],
        n_buckets=n_buckets,
        replace_keys=docs.select("doc_id").distinct(),
    )


def winnow_overlap_stored(
    spark,
    io,
    new_docs: DataFrame,
    k: int = 4,
    w: int = 3,
    min_shared: int = 1,
    prefix: str = "winnow_corpus",
) -> DataFrame:
    """Recrawl overlap against the PERSISTED fingerprint index: only the
    new batch is tokenized/fingerprinted; the corpus source is scanned
    zero times (plan-asserted in tests). Self-pairs from re-delivered
    ids are excluded. Returns (doc_a = new id, doc_b = corpus id,
    n_shared INT) for pairs sharing >= min_shared fingerprints —
    candidate work is Sum over fingerprints of |new_fp| * |corpus_fp|,
    the same bucket bound as the inline winnow_overlap_pairs.
    """
    from ..sources.merge import read_merged

    nf = winnow_fingerprint_set(new_docs, k, w).withColumnsRenamed(
        {"doc_id": "doc_a", "fingerprint": "fp"}
    )
    # a fully-emptied index reads as a missing table (the bucketed MERGE
    # drops a table whose last partition was deleted) — probe -> empty
    if not io.table_exists(spark, f"{prefix}_fps"):
        return (
            nf.select(
                F.col("doc_a"),
                F.col("doc_a").alias("doc_b"),
                F.lit(0).cast("int").alias("n_shared"),
            ).where(F.lit(False))
        )
    cf = read_merged(spark, io, f"{prefix}_fps").select(
        F.col("doc_id").alias("doc_b"), F.col("fingerprint").alias("fp")
    )
    return (
        nf.join(cf, "fp")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("int").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
