"""Corpus-trained statistical language model scoring (CCNet-style).

CCNet (Wenzek et al. 2020) filters crawl text by the perplexity of a
KenLM model trained on a trusted reference corpus. The engine's
``functions/scoring.perplexity_udf`` ships a FIXED character-bigram
model inside the UDF; this module is the complementary DISTRIBUTED
form: the word-bigram model is trained *by Spark aggregation* over a
deterministic reference slice of the corpus itself, then every document
is scored against it — the whole train+score round trip is DataFrame
ops with an exact DuckDB twin.

Cross-engine exactness: log-probabilities are rounded to micro-nats and
summed as BIGINT (order-free integer addition), so the per-doc result
is bit-identical however Spark or DuckDB order the sum. The only
floating-point ops are one division, one ln, one multiply per DISTINCT
bigram — identical inputs on both engines, disagreement bounded at 1
ulp before a 1e-6 rounding grid.

Scale posture: the LM is trained on a BOUNDED reference slice (CCNet
uses Wikipedia; here doc_id % train_mod == 0), so the count tables are
corpus-fraction-sized and broadcast to the scoring join — the corpus
streams through map-side joins and one doc_id agg, no corpus-sized
shuffle keyed on text. Bigram/unigram join keys are md5 (16 bytes).

Reference analog: the reference scores records against externally
supplied ground truth (plugins/dq_lib/ground_truth_utils.py:50-190);
training the scorer from the data itself is the LLM-curation extension
the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

MICRO = 1_000_000


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) for every adjacent token pair; docs with <2
    tokens contribute no rows (and are absent from scoring output)."""
    tk = tokens(F.col("text"))
    return (
        docs.select("doc_id", tk.alias("tk"))
        .where(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i"),
            "tk",
        )
        .select(
            "doc_id",
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
    )


def train_bigram_lm(
    docs: DataFrame, train_mod: int = 10
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Add-one-smoothed word-bigram LM from the deterministic reference
    slice ``doc_id % train_mod == 0``.

    Returns (bigram_counts(h2, c2), unigram_counts(h1, c1), vocab(vs)):
    c2 = count of the bigram in the slice, c1 = count of w1 as a bigram
    FIRST position (so p = (c2+1)/(c1+vs) is a proper conditional), vs =
    distinct tokens anywhere in the slice. Keys are md5 so the count
    tables carry 16-byte hashes, never token text.
    """
    train = docs.where(F.col("doc_id") % train_mod == 0)
    bg = _bigrams(train)
    c2 = bg.groupBy(
        F.md5(F.concat_ws("\n", "w1", "w2")).alias("h2")
    ).agg(F.count("*").alias("c2"))
    c1 = bg.groupBy(F.md5(F.col("w1")).alias("h1")).agg(
        F.count("*").alias("c1")
    )
    vocab = (
        train.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .agg(F.countDistinct("tok").alias("vs"))
    )
    return c2, c1, vocab


def lm_perplexity(
    docs: DataFrame, train_mod: int = 10, broadcast_lm: bool = True
) -> DataFrame:
    """Per-document negative log-likelihood under the corpus-trained
    bigram LM (the CCNet quality signal: high avg_nll = text unlike the
    reference slice).

    Smoothing handles every OOV case without an <unk> remap: an unseen
    bigram scores (0+1)/(c1+vs), an unseen first word (0+1)/(0+vs).

    Returns (doc_id, n_bigrams INT, micro_nll BIGINT, avg_nll DOUBLE)
    for every doc with >= 2 tokens. avg_nll is micro_nll/n rounded
    half-up IN INTEGERS ((2m+n) div 2n) then divided by 1e6 — one IEEE
    division of identical operands, so both engines emit the same bits
    (a ROUND(double, 6) here can straddle a half-boundary differently
    per engine; measured once at sf0.01).

    ``broadcast_lm`` pins the map-side join (the CCNet regime: bounded
    reference corpus, web-scale scoring side); pass False if the train
    slice is corpus-sized and the LM must shuffle-join.
    """
    c2, c1, vocab = train_bigram_lm(docs, train_mod)
    # loud guard: an empty reference slice would make every smoothed
    # probability (c2+1)/(c1+vs) a division by zero, which ANSI-off
    # Spark silently turns into NULL scores — fail at train time instead.
    # The collected count then rides the scoring expression as a LITERAL
    # (the previous crossJoin(vocab) re-ran the distinct-count agg
    # inside the returned plan).
    vs = vocab.collect()[0]["vs"] or 0
    if vs == 0:
        raise ValueError(
            f"LM reference slice doc_id % {train_mod} == 0 has no tokens; "
            "perplexity would be NULL for every document"
        )
    if broadcast_lm:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    bg = _bigrams(docs).select(
        "doc_id",
        F.md5(F.concat_ws("\n", "w1", "w2")).alias("h2"),
        F.md5(F.col("w1")).alias("h1"),
    )
    p = (F.coalesce(F.col("c2"), F.lit(0)) + 1) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vs)
    ).cast("double")
    term = F.round(F.log(p) * MICRO, 0).cast("long")
    agg = (
        bg.join(c2, "h2", "left")
        .join(c1, "h1", "left")
        .select("doc_id", term.alias("term"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            (-F.sum("term")).alias("micro_nll"),
        )
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "micro_nll",
        (
            F.expr("(2 * micro_nll + n_bigrams) div (2 * n_bigrams)")
            / F.lit(float(MICRO))
        ).alias("avg_nll"),
    )
