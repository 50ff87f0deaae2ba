"""Distributed Naive-Bayes quality classifier (fastText-supervised
analog): TRAIN a multinomial bag-of-words model on a labeled slice of
the corpus by pure aggregation, then SCORE the held-out slice with a
broadcast join — the standard "train a quality classifier on
known-good/known-bad text, filter the crawl by its score" curation step
(GPT-3/LLaMA data pipelines), expressed so the whole train+score round
trip is DataFrame ops with an exact DuckDB twin.

Labels here are a deterministic heuristic (type-token ratio >= 0.5,
compared in integers: 2*distinct >= total) so tests and oracles are
closed-form; swap in human labels by passing any 0/1 column expression.

Cross-engine exactness: the same micro-nat discipline as operators/lm —
each distinct token's log-likelihood ratio is rounded to integer
micro-nats, per-doc sums are BIGINT (order-free), priors are Laplace
(+1/+2) so an empty class never produces -inf.

Scale posture: the model (per-token class counts) is vocabulary-sized,
broadcast to the scoring join; the corpus streams through one explode +
map-side join + one doc_id agg. No corpus-sized shuffle keyed on text
(token join keys are md5, 16 bytes).

Reference analog: the reference validates records against static rule
sets (plugins/dq_lib/check_utils.py); a trained text classifier is the
LLM-curation extension the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

MICRO = 1_000_000


def ttr_label() -> Column:
    """Default deterministic label: 1 when the doc's type-token ratio is
    >= 0.5 (integer compare — no float threshold to disagree on)."""
    tk = tokens(F.col("text"))
    return (
        F.size(F.array_distinct(tk)) * 2 >= F.size(tk)
    ).cast("int")


def nb_train_score(
    docs: DataFrame,
    label: Column | None = None,
    holdout_mod: int = 3,
) -> DataFrame:
    """Train on ``doc_id % holdout_mod != 0``, score the held-out
    ``doc_id % holdout_mod == 0`` docs.

    Per class c: p(w|c) = (count(w in c) + 1) / (tokens(c) + V) with V =
    distinct train tokens; prior(c) = (docs(c)+1)/(docs+2). Score =
    micro-nats of log prior odds + sum over token OCCURRENCES of the
    per-token log-likelihood ratio.

    Returns (doc_id, n_toks INT, micro_logodds BIGINT, pred_keep INT)
    for every held-out doc (zero-token docs score prior-only).
    """
    if label is None:
        label = ttr_label()
    labeled = docs.select("doc_id", "text", label.alias("y"))
    train = labeled.where(F.col("doc_id") % holdout_mod != 0)
    score = labeled.where(F.col("doc_id") % holdout_mod == 0)

    tok_tr = train.select(
        "doc_id", "y", F.explode(tokens(F.col("text"))).alias("tok")
    )
    # model: per-token class counts keyed on md5(token); one wide row of
    # global totals (class token totals, class doc counts, vocab size)
    wc = tok_tr.groupBy(F.md5(F.col("tok")).alias("ht")).agg(
        F.sum(F.col("y")).alias("ck"),
        F.sum(1 - F.col("y")).alias("cd"),
    )
    totals = train.select(
        F.sum(F.col("y")).alias("docs_k"),
        F.sum(1 - F.col("y")).alias("docs_d"),
        F.count("*").alias("docs"),
    ).crossJoin(
        tok_tr.select(
            F.sum(F.col("y")).alias("nk"),
            F.sum(1 - F.col("y")).alias("nd"),
            F.countDistinct("tok").alias("vs"),
        )
    )

    # loud guard: an empty train slice (or one with no tokens) would
    # make (c+1)/(n_c+V) a division by zero -> silent NULL log-odds
    # under ANSI-off; fail at train time instead
    tot_row = totals.collect()[0]
    if tot_row["docs"] == 0 or (tot_row["vs"] or 0) == 0:
        raise ValueError(
            f"NB train slice doc_id % {holdout_mod} != 0 is empty or has "
            "no tokens; scores would be NULL for every held-out doc"
        )

    def micro_ln(x: Column) -> Column:
        return F.round(F.log(x) * MICRO, 0).cast("long")

    term = micro_ln(
        (F.coalesce(F.col("ck"), F.lit(0)) + 1)
        / (F.col("nk") + F.col("vs")).cast("double")
    ) - micro_ln(
        (F.coalesce(F.col("cd"), F.lit(0)) + 1)
        / (F.col("nd") + F.col("vs")).cast("double")
    )
    tok_sc = (
        score.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .select("doc_id", F.md5(F.col("tok")).alias("ht"))
        .join(F.broadcast(wc), "ht", "left")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", term.alias("term"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_toks"),
            F.sum("term").alias("tok_odds"),
        )
    )
    prior = micro_ln(
        (F.col("docs_k") + 1) / (F.col("docs") + 2).cast("double")
    ) - micro_ln((F.col("docs_d") + 1) / (F.col("docs") + 2).cast("double"))
    return (
        score.select("doc_id")
        .join(tok_sc, "doc_id", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.coalesce(F.col("n_toks"), F.lit(0)).cast("int").alias("n_toks"),
            (prior + F.coalesce(F.col("tok_odds"), F.lit(0))).alias(
                "micro_logodds"
            ),
            (
                prior + F.coalesce(F.col("tok_odds"), F.lit(0)) > 0
            ).cast("int").alias("pred_keep"),
        )
    )


def nb_eval(
    docs: DataFrame,
    label: Column | None = None,
    holdout_mod: int = 3,
) -> DataFrame:
    """Close the classifier loop: evaluate nb_train_score's held-out
    predictions against the true labels — confusion counts plus
    precision/recall/F1 in integer ppm (engine-exact; thresholds on the
    report are what decide whether the trained filter ships).

    Returns ONE row: (n_eval INT, tp INT, fp INT, fn INT, tn INT,
    precision_ppm BIGINT, recall_ppm BIGINT, f1_ppm BIGINT); empty
    denominators report 0 rather than NULL.
    """
    if label is None:
        label = ttr_label()
    scored = nb_train_score(docs, label, holdout_mod)
    truth = docs.select("doc_id", "text").where(
        F.col("doc_id") % holdout_mod == 0
    ).select("doc_id", label.alias("y"))
    j = scored.join(truth, "doc_id")

    def n(cond: Column) -> Column:
        return F.sum(cond.cast("long"))

    conf = j.agg(
        n((F.col("pred_keep") == 1) & (F.col("y") == 1)).alias("tp"),
        n((F.col("pred_keep") == 1) & (F.col("y") == 0)).alias("fp"),
        n((F.col("pred_keep") == 0) & (F.col("y") == 1)).alias("fn"),
        n((F.col("pred_keep") == 0) & (F.col("y") == 0)).alias("tn"),
    )

    def ppm(num: Column, den: Column, alias: str) -> Column:
        return (
            F.when(den > 0, F.expr(f"({alias}_num * 1000000) div {alias}_den"))
            .otherwise(F.lit(0).cast("long"))
            .alias(f"{alias}_ppm")
        )

    staged = conf.select(
        "tp", "fp", "fn", "tn",
        (F.col("tp")).alias("precision_num"),
        (F.col("tp") + F.col("fp")).alias("precision_den"),
        (F.col("tp")).alias("recall_num"),
        (F.col("tp") + F.col("fn")).alias("recall_den"),
        (2 * F.col("tp")).alias("f1_num"),
        (2 * F.col("tp") + F.col("fp") + F.col("fn")).alias("f1_den"),
    )
    return staged.select(
        (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))
        .cast("int")
        .alias("n_eval"),
        F.col("tp").cast("int").alias("tp"),
        F.col("fp").cast("int").alias("fp"),
        F.col("fn").cast("int").alias("fn"),
        F.col("tn").cast("int").alias("tn"),
        ppm(F.col("precision_num"), F.col("precision_den"), "precision"),
        ppm(F.col("recall_num"), F.col("recall_den"), "recall"),
        ppm(F.col("f1_num"), F.col("f1_den"), "f1"),
    )
