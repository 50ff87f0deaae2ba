"""Closed-form tests for the corpus-trained bigram LM (operators/lm.py)
and the Naive-Bayes quality classifier (operators/classifier.py): tiny
corpora where every smoothed probability — and therefore every integer
micro-nat — is computed by hand."""

from __future__ import annotations

import math

import pandas as pd

from dataquality_box_spark.operators.classifier import nb_train_score
from dataquality_box_spark.operators.lm import lm_perplexity


def _docs(spark, texts):
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return spark.createDataFrame(pdf)


def _micro(p: float) -> int:
    return round(math.log(p) * 1_000_000)


def test_lm_perplexity_hand_computed(spark):
    # train slice (doc_id % 10 == 0) = doc0 only: "a b a b"
    # bigrams: (a,b) x2, (b,a) x1  ->  c1: a=2, b=1; V = {a,b} = 2
    texts = ["a b a b", "c c", "a b"]
    out = {
        r["doc_id"]: r
        for r in lm_perplexity(_docs(spark, texts), train_mod=10).collect()
    }
    # doc0 scored against itself: ab -> (2+1)/(2+2), ba -> (1+1)/(1+2)
    m_ab, m_ba = _micro(3 / 4), _micro(2 / 3)
    assert out[0]["n_bigrams"] == 3
    assert out[0]["micro_nll"] == -(2 * m_ab + m_ba)
    assert out[0]["avg_nll"] == (-(2 * m_ab + m_ba) // 3) / 1e6  # exact /3
    # doc1 "c c": fully OOV bigram -> (0+1)/(0+2)
    assert out[1]["n_bigrams"] == 1
    assert out[1]["micro_nll"] == -_micro(1 / 2)
    # doc2 "a b": one in-vocab bigram, same term as ab above
    assert out[2]["micro_nll"] == -m_ab


def test_lm_perplexity_short_docs_absent(spark):
    out = lm_perplexity(_docs(spark, ["solo", "a b"]), train_mod=10).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_nb_train_score_hand_computed(spark):
    # holdout_mod=3: train = docs 1,2; score = docs 0,3
    # doc1 "x x x": 2*1 >= 3 false -> y=0; doc2 "p q": 2*2 >= 2 -> y=1
    # model: ck/cd per token: x:(0,3) p:(1,0) q:(1,0)
    # totals: docs_k=1 docs_d=1 docs=2 nk=2 nd=3 vs=3; prior = 0
    texts = ["x p", "x x x", "p q", "p p q q"]
    out = {
        r["doc_id"]: r
        for r in nb_train_score(_docs(spark, texts), holdout_mod=3).collect()
    }
    t_x = _micro(1 / 5) - _micro(4 / 6)
    t_p = _micro(2 / 5) - _micro(1 / 6)
    assert set(out) == {0, 3}
    assert out[0]["n_toks"] == 2
    assert out[0]["micro_logodds"] == t_x + t_p
    assert out[0]["pred_keep"] == int(t_x + t_p > 0) == 0
    # doc3 "p p q q": q has identical counts to p -> 4 * t_p, positive
    assert out[3]["micro_logodds"] == 4 * t_p
    assert out[3]["pred_keep"] == 1


def test_nb_prior_only_for_empty_doc(spark):
    # a zero-token held-out doc scores prior-only (here prior != 0:
    # train docs 1,2 are both y=1 -> prior = micro(3/4) - micro(1/4))
    texts = ["", "p q", "r s"]
    out = {
        r["doc_id"]: r
        for r in nb_train_score(_docs(spark, texts), holdout_mod=3).collect()
    }
    assert out[0]["n_toks"] == 0
    assert out[0]["micro_logodds"] == _micro(3 / 4) - _micro(1 / 4)
    assert out[0]["pred_keep"] == 1


def test_lm_empty_reference_slice_raises(spark):
    import pytest

    # train_mod=10 but no doc_id % 10 == 0 rows -> loud failure, not
    # NULL perplexities
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b", "c d", "e f"]})
    with pytest.raises(ValueError, match="reference slice"):
        lm_perplexity(spark.createDataFrame(pdf), train_mod=10)


def test_nb_empty_train_slice_raises(spark):
    import pytest

    # holdout_mod=1 puts EVERY doc in the held-out slice -> empty train
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "c d"]})
    with pytest.raises(ValueError, match="train slice"):
        nb_train_score(spark.createDataFrame(pdf), holdout_mod=1)


def test_nb_eval_confusion_and_ppm(spark):
    from dataquality_box_spark.operators.classifier import nb_eval

    # same corpus as the hand-computed scoring test: held-out docs 0,3
    # doc0 label: "x p" -> 2 distinct / 2 total -> y=1; pred 0 -> FN
    # doc3 label: "p p q q" -> 2*2 >= 4 -> y=1; pred 1 -> TP
    texts = ["x p", "x x x", "p q", "p p q q"]
    r = nb_eval(_docs(spark, texts), holdout_mod=3).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 1, 0)
    assert r["n_eval"] == 2
    assert r["precision_ppm"] == 1_000_000  # 1/(1+0)
    assert r["recall_ppm"] == 500_000       # 1/(1+1)
    assert r["f1_ppm"] == 2 * 1_000_000 // 3


def test_nb_eval_empty_holdout_reports_zeros(spark):
    from dataquality_box_spark.operators.classifier import nb_eval

    # no doc_id is a multiple of 3 -> train non-empty, held-out EMPTY:
    # the report must be integer zeros, never NULL
    pdf = pd.DataFrame({"doc_id": [1, 2, 4, 5], "text": ["a b", "c d", "e f", "g h"]})
    r = nb_eval(spark.createDataFrame(pdf), holdout_mod=3).collect()[0]
    assert (r["n_eval"], r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 0, 0)
    assert (r["precision_ppm"], r["recall_ppm"], r["f1_ppm"]) == (0, 0, 0)
