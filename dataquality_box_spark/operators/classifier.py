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
    # under ANSI-off; fail at train time instead. The collected row then
    # feeds the scoring expressions as LITERALS — the train aggregation
    # runs exactly once, not once per downstream consumer (the previous
    # crossJoin(totals) re-aggregated the train slice in the final plan)
    tot_row = totals.collect()[0]
    if tot_row["docs"] == 0 or (tot_row["vs"] or 0) == 0:
        raise ValueError(
            f"NB train slice doc_id % {holdout_mod} != 0 is empty or has "
            "no tokens; scores would be NULL for every held-out doc"
        )
    docs_k, docs_d, n_docs = tot_row["docs_k"], tot_row["docs_d"], tot_row["docs"]
    nk, nd, vs = tot_row["nk"], tot_row["nd"], tot_row["vs"]

    def micro_ln(x: Column) -> Column:
        return F.round(F.log(x) * MICRO, 0).cast("long")

    term = micro_ln(
        (F.coalesce(F.col("ck"), F.lit(0)) + 1)
        / F.lit(float(nk + vs))
    ) - micro_ln(
        (F.coalesce(F.col("cd"), F.lit(0)) + 1)
        / F.lit(float(nd + vs))
    )
    tok_sc = (
        score.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .select("doc_id", F.md5(F.col("tok")).alias("ht"))
        .join(F.broadcast(wc), "ht", "left")
        .select("doc_id", term.alias("term"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_toks"),
            F.sum("term").alias("tok_odds"),
        )
    )
    # priors as plain Python micro-nats — rounded HALF-AWAY-FROM-ZERO to
    # really match micro_ln (F.round) and the oracle's ROUND: builtin
    # round() is banker's (half-to-even), which would diverge by 1 on a
    # log-prior landing exactly on a .5 micro-nat boundary (ADVICE r5)
    import math

    def _half_away(x: float) -> int:
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    prior = F.lit(
        _half_away(math.log((docs_k + 1) / (n_docs + 2)) * MICRO)
        - _half_away(math.log((docs_d + 1) / (n_docs + 2)) * MICRO)
    ).cast("long")
    return (
        score.select("doc_id")
        .join(tok_sc, "doc_id", "left")
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
        # coalesce: an EMPTY held-out slice makes SUM() NULL — the report
        # must say 0, not None (docstring contract)
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0).cast("long"))

    conf = j.agg(
        n((F.col("pred_keep") == 1) & (F.col("y") == 1)).alias("tp"),
        n((F.col("pred_keep") == 1) & (F.col("y") == 0)).alias("fp"),
        n((F.col("pred_keep") == 0) & (F.col("y") == 1)).alias("fn"),
        n((F.col("pred_keep") == 0) & (F.col("y") == 0)).alias("tn"),
    )

    def ppm(num: Column, den: Column) -> Column:
        # try_divide is float; integer ppm needs div, gated on den > 0
        return F.when(
            den > 0, (num * 1_000_000 - (num * 1_000_000) % den) / den
        ).otherwise(F.lit(0)).cast("long")

    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return conf.select(
        (tp + fp + fn + tn).cast("int").alias("n_eval"),
        tp.cast("int").alias("tp"),
        fp.cast("int").alias("fp"),
        fn.cast("int").alias("fn"),
        tn.cast("int").alias("tn"),
        ppm(tp, tp + fp).alias("precision_ppm"),
        ppm(tp, tp + fn).alias("recall_ppm"),
        ppm(2 * tp, 2 * tp + fp + fn).alias("f1_ppm"),
    )
