"""Training-data curation operators: decontamination, deterministic
sampling, sequence packing.

These extend the reference inventory with the corpus-preparation steps a
training-data pipeline runs after quality filtering (the brief's
first-class extension family). The reference has no counterpart (its
scope ends at validation/reconciliation); scale posture is stated per
operator.

* Decontamination: benchmark/eval-set n-gram overlap. The benchmark side
  is small by nature (MBs of eval suites vs a 100 TB corpus), so its
  distinct shingle set is BROADCAST and the corpus side is a map-side
  semi/inner join — no corpus shuffle at all. This is the canonical
  at-scale shape (the corpus is only ever streamed through once).
* Deterministic sampling: md5-hash gating, so the sample is stable across
  reruns/resumes and engines (no RNG state, no sort). Per-stratum rates
  compose as a CASE expression — still a narrow map-side filter.
* Sequence packing: contiguous token-budget binning per shard via a
  window cumulative sum (one shuffle on the shard key; bins never cross
  shards, so shards parallelize freely). The exact next-fit variant
  (bins guaranteed <= budget) is a sequential recurrence, implemented in
  pack_bins_nextfit via applyInPandas per shard — Arrow-batched, ordered
  within shard, used when hard budget caps matter (attention masking).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decontaminate(
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-doc count of distinct shingles shared with the
    benchmark set, plus one matched shingle as evidence. Inputs are
    (id, tok) frames (build with dedup.shingle_sets). The benchmark
    shingle set is broadcast — corpus-side work is map-only."""
    bench = F.broadcast(benchmark_shingles.select("tok").distinct())
    return (
        corpus_shingles.join(bench, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_contaminated"),
            F.min("tok").alias("sample_shingle"),
        )
    )


def _hash_bucket(id_col, salt):
    """Deterministic uniform 32-bit bucket from md5(salt || id) — the
    same expression DuckDB spells CAST('0x' || substr(md5(..),1,8) AS
    BIGINT), so oracle twins agree exactly. This is the ONE copy of the
    cross-engine hash idiom; salt may be a literal str or a Column
    (e.g. the bloom probes' per-hash 'bl{i}#' prefix)."""
    salt_col = salt if isinstance(salt, Column) else F.lit(salt)
    h = F.md5(F.concat(salt_col, id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def sample_threshold(rate: float) -> int:
    """rate -> integer keep-threshold in the 32-bit hash space, computed
    ONCE in Python and embedded as a literal on both engines. Computing
    it engine-side invites boundary divergence: Spark's double->long cast
    truncates while DuckDB's CAST rounds, so e.g. rate 0.8 gave
    3435973836 vs 3435973837 — one row in 2^32 sampled differently."""
    return int(float(rate) * 2**32)


def sample_flag(
    id_col: str,
    rate: float,
    salt: str = "s0",
    strata_rates: Mapping[str, float] | None = None,
    strata_col: str | None = None,
) -> Column:
    """Boolean keep-flag for the deterministic sample (composable into
    multi-stage funnels without re-deriving the bucket expression)."""
    bucket = _hash_bucket(F.col(id_col), salt)
    thr = F.lit(sample_threshold(rate))
    if strata_rates:
        for value, sr in sorted(strata_rates.items()):
            thr = F.when(
                F.col(strata_col) == value, F.lit(sample_threshold(sr))
            ).otherwise(thr)
    return bucket < thr


def hash_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "s0",
    strata_rates: Mapping[str, float] | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic (resume-stable) sample: keep a row iff its hash
    bucket falls under sample_threshold(rate). With strata_rates, the
    threshold is per-stratum (CASE over strata_col) with `rate` as the
    default — e.g. downsample the head language hard, keep the tail."""
    return df.where(sample_flag(id_col, rate, salt, strata_rates, strata_col))


def pack_bins_contiguous(
    df: DataFrame,
    shard_col,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Contiguous-fill packing: within each shard, order docs and assign
    bin_id = floor(cumsum_before / budget). One window shuffle on the
    shard key; bins may overflow the budget by at most one document
    (the streaming-friendly approximation — no recurrence, pure SQL,
    identical in any engine). Returns per-bin rollups.

    The frame is explicit ROWS UNBOUNDED PRECEDING..CURRENT: Spark's
    default for an ordered window is a RANGE frame, which sums ALL peer
    rows tied on order_col — with a non-unique order_col that diverges
    from the sequential packing semantics (and from the DuckDB twin)."""
    w = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        df.withColumn("shard", shard_col)
        .withColumn("bin_id", F.floor(cum_before / F.lit(budget)))
        .groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("total_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )


def pack_bins_nextfit(
    df: DataFrame,
    shard_col,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Exact next-fit packing: close the bin when the next doc would
    exceed the budget (a bin holds one oversized doc alone). The
    recurrence is per-shard sequential, so it runs as applyInPandas —
    one Arrow batch per shard, shards in parallel. Output schema matches
    pack_bins_contiguous for drop-in comparison."""
    # pandas imported lazily: this module is also imported for its pure
    # threshold arithmetic (driver_queries' oracle SQL literals), which
    # must not drag the pandas import cost into SQL-only paths
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        bins, filled, cur = [], 0, 0
        for t in pdf[tokens_col].to_numpy():
            if filled and filled + int(t) > budget:
                cur += 1
                filled = 0
            filled += int(t)
            bins.append(cur)
        pdf = pdf.assign(bin_id=bins)
        g = pdf.groupby("bin_id", sort=True)
        out = g.agg(
            n_docs=(order_col, "size"),
            total_tokens=(tokens_col, "sum"),
            first_doc=(order_col, "min"),
            last_doc=(order_col, "max"),
        ).reset_index()
        out.insert(0, "shard", pdf["shard"].iloc[0])
        return out

    staged = df.withColumn("shard", shard_col)
    order_t = dict(staged.dtypes)[order_col]
    shard_t = dict(staged.dtypes)["shard"]
    schema = (
        f"shard {shard_t}, bin_id long, n_docs long, total_tokens long, "
        f"first_doc {order_t}, last_doc {order_t}"
    )
    return staged.groupBy("shard").applyInPandas(pack, schema=schema)


def dsir_logratio_weights(
    corpus_grams: DataFrame,
    target_grams: DataFrame,
    n_buckets: int = 64,
    salt: str = "ds0",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each raw-corpus
    doc by how target-like its hashed n-gram bag is.

    Inputs are (id, g) frames with one row per gram OCCURRENCE (build
    with functions.text.ngram_explode). Each gram hashes to one
    of ``n_buckets`` buckets (md5, same expression as the sampling
    gates); bucket unigram/bigram probabilities are estimated with
    add-one smoothing on each side, and

        weight(doc) = sum_b count_b(doc) * ln(p_target(b) / p_raw(b))

    Scale shape: the bucket log-ratio table is ``n_buckets`` rows —
    BROADCAST; the corpus side is one groupBy(id, bucket) count plus a
    map-side join, so a 100 TB corpus is streamed exactly once and the
    only shuffle is the per-doc aggregation.

    Cross-engine determinism: per-bucket log-ratios are rounded to 9dp,
    per-doc terms fold in BUCKET ORDER (collect_list + array_sort +
    left fold, mirrored by the oracle's list_reduce(list(... ORDER BY
    b))), so float addition order is pinned on both engines. Residual
    risk is a last-ulp ln() divergence landing within 5e-10 of a 9dp
    rounding boundary — same accepted class as the IVF oracle's rounded
    per-term folds.
    """
    b = F.pmod(_hash_bucket(F.col("g"), salt), F.lit(n_buckets)).alias("b")
    cg = corpus_grams.select(F.col(id_col), b)
    tg = target_grams.select(b)
    raw_n = cg.groupBy("b").agg(F.count("*").alias("nr"))
    tgt_n = tg.groupBy("b").agg(F.count("*").alias("ntg"))
    # all-buckets spine so unseen buckets still carry their smoothed mass;
    # both count sides are bucket-bounded (<= n_buckets rows) — broadcast
    # explicitly so the tiny spine joins never fall to a sort-merge
    spine = cg.sparkSession.range(n_buckets).select(F.col("id").cast("long").alias("b"))
    counts = (
        spine.join(F.broadcast(raw_n), "b", "left")
        .join(F.broadcast(tgt_n), "b", "left")
        .select(
            "b",
            F.coalesce("nr", F.lit(0)).alias("nr"),
            F.coalesce("ntg", F.lit(0)).alias("ntg"),
        )
    )
    # integer totals ride the same 64-row frame (exact, order-free)
    tot = counts.agg(
        F.sum("nr").alias("tr"), F.sum("ntg").alias("tt")
    )
    lr = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log((F.col("ntg") + 1).cast("double") / (F.col("tt") + n_buckets))
            - F.log((F.col("nr") + 1).cast("double") / (F.col("tr") + n_buckets)),
            9,
        ).alias("lr"),
    )
    doc_terms = (
        cg.groupBy(id_col, "b")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(lr), "b")
        .select(
            id_col, "b", F.round(F.col("c").cast("double") * F.col("lr"), 9).alias("term")
        )
    )
    return doc_terms.groupBy(id_col).agg(
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("b", "term"))),
                F.lit(0.0),
                lambda a, x: a + x["term"],
            ),
            6,
        ).alias("dsir_weight")
    )


def mixture_plan(
    docs: DataFrame,
    weights: Mapping[str, int],
    budget_tokens: int,
    source_col: str = "source",
) -> DataFrame:
    """Training-mixture planner: given integer mixture ``weights`` per
    source and a total token ``budget_tokens``, compute what each source
    must yield — the arithmetic behind "web 60 / code 25 / wiki 15"
    mixture specs (GPT-3 Table 2.2, LLaMA pre-training mix), executed as
    one aggregation over the corpus.

    Per source: tokens_available (whitespace tokens), target_tokens =
    budget * w / sum(w) (integer division), rate_ppm = the sampling rate
    that hits the target (capped at 1e6 — you cannot sample more than
    once per epoch), epochs_micro = target/available in millionths
    (values above 1e6 mean the source must repeat — the over-epoching
    signal Muennighoff et al. 2023 bounds at ~4 epochs), and a deficit
    flag. All integer arithmetic end to end — both engines agree
    bit-for-bit and the plan is reproducible.

    Sources in the corpus but not in ``weights`` get weight 0 (excluded,
    rate 0); weights naming absent sources are reported with zero
    availability and deficit=1 so a misconfigured mix fails loudly in
    review rather than silently under-delivering.

    Shape: one count/sum agg keyed on source + a broadcast weights frame
    (mixture specs are dozens of rows); output is sources-sized.
    """
    if not weights or min(weights.values()) < 0:
        raise ValueError("weights must be non-empty and non-negative")
    w_total = sum(weights.values())
    if w_total == 0:
        # div-by-zero would NULL the whole plan under ANSI-off Spark
        # (and error outright in the DuckDB twin) — fail loudly instead
        raise ValueError("weights sum to zero; no mixture is defined")
    spark = docs.sparkSession
    w_df = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())], f"{source_col} string, w long"
    )
    from ..functions.text import tokens

    avail = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("tokens_available"),
    )
    j = avail.join(F.broadcast(w_df), source_col, "full_outer").select(
        source_col,
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("int").alias("n_docs"),
        F.coalesce(F.col("tokens_available"), F.lit(0)).alias("tokens_available"),
        F.coalesce(F.col("w"), F.lit(0)).alias("w"),
    )
    # ONE copy of the target expression; epochs derives from it and
    # rate is by construction min(1e6, epochs) — three inlined copies
    # would have to drift in lockstep with the DuckDB twin
    target = F.expr(f"({budget_tokens} * w) div {w_total}")
    staged = j.withColumn("target_tokens", target).withColumn(
        "epochs_micro",
        F.when(
            F.col("tokens_available") > 0,
            F.expr("(target_tokens * 1000000) div tokens_available"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return staged.select(
        source_col,
        "n_docs",
        "tokens_available",
        "target_tokens",
        F.least(F.lit(1_000_000).cast("long"), F.col("epochs_micro")).alias(
            "rate_ppm"
        ),
        "epochs_micro",
        (F.col("target_tokens") > F.col("tokens_available"))
        .cast("int")
        .alias("deficit"),
    )


def split_long_docs(
    docs: DataFrame, max_tokens: int = 512, overlap: int = 64
) -> DataFrame:
    """Context-window document splitting with overlap (the complement of
    sequence packing: packing fills windows with short docs, this cuts
    long docs DOWN to windows). Chunk ci covers tokens
    [ci*stride+1 .. ci*stride+max_tokens] with stride =
    max_tokens - overlap, so consecutive chunks share ``overlap`` tokens
    and no token is lost; n_chunks = max(1, ceil((n-overlap)/stride)).

    Deterministic integer arithmetic end to end; one explode, no joins.

    Returns (doc_id, chunk_idx INT, n_tokens INT, chunk_text) for every
    doc with >= 1 token.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    from ..functions.text import tokens

    stride = max_tokens - overlap
    toks = tokens(F.col("text"))
    n = F.size("toks")
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - overlap) / float(stride)).cast("int")
    )
    chunk = F.slice(F.col("toks"), F.col("ci") * stride + 1, max_tokens)
    return (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
            "toks",
        )
        .select(
            "doc_id",
            F.col("ci").cast("int").alias("chunk_idx"),
            F.size(chunk).cast("int").alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def cluster_safe_split(
    pairs: DataFrame,
    all_docs: DataFrame,
    eval_rate: float = 0.1,
    salt: str = "split0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-free train/eval split: WHOLE near-duplicate clusters land
    on one side, so no eval document has a near-copy in train (the
    failure plain random splits commit — Lee et al. 2022 measure the
    resulting eval inflation). ``pairs`` is any near-dup pair frame
    (MinHash/SimHash/semantic route); ``all_docs`` supplies singleton
    docs so the split is total.

    The side is the deterministic md5-bucket gate (hash_sample's idiom)
    keyed on CLUSTER id, not doc id — same salt + rate reproduce the
    same split on both engines and across resumes.

    Returns (doc_id, cluster_id, side 'train'|'eval').

    Scale posture: clustering is the large-star/small-star-capable CC
    route (edge-set-sized rounds); the gate adds one narrow column on
    the cluster assignment — no extra shuffle.
    """
    from .dedup import duplicate_clusters_star

    # star CC, as the docstring above promises: min-label propagation
    # (duplicate_clusters) RAISES past 20 rounds on a >20-diameter
    # duplicate chain, failing the whole split; large-star/small-star
    # converges in O(log n) rounds on exactly those chains with the same
    # (id, cluster_id) output contract — the identical swap the funnel
    # got (driver_queries.curation_funnel_clustered).
    clusters = duplicate_clusters_star(
        pairs, all_docs=all_docs, id_col=id_col
    ).select(id_col, "cluster_id")
    bucket = _hash_bucket(F.col("cluster_id"), salt)
    side = F.when(
        bucket < F.lit(sample_threshold(eval_rate)), F.lit("eval")
    ).otherwise(F.lit("train"))
    return clusters.select(id_col, "cluster_id", side.alias("side"))
