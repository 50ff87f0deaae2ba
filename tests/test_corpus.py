"""Corpus-shape diagnostic tests (operators/corpus.py) on engineered
corpora where the Heaps curve, Zipf head and chunk duplication are
known in closed form."""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.corpus import (
    chunk_dedup_stats,
    heaps_curve,
    zipf_topk,
)
from dataquality_box_spark.functions.text import encoding_flag_columns


def _docs(spark, texts):
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    return spark.createDataFrame(pdf)


def test_heaps_curve_cumulative_vocab(spark):
    # doc 0..9: doc k introduces exactly one NEW token t{k} alongside
    # a shared token 'the' -> vocab(cutoff c) = c+2 for c>=1... built
    # explicitly below instead: vocab grows by 1 per doc after doc 0.
    texts = [f"the t{k}" for k in range(10)]
    out = {r["cutoff"]: r for r in heaps_curve(_docs(spark, texts), points=10).collect()}
    # cutoffs are ceil(9*i/10) over max doc_id 9 -> {1,2,3,4,5,6,7,8,9}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8, 9}
    for c, r in out.items():
        n_docs = c + 1  # doc_ids 0..c
        assert r["corpus_tokens"] == 2 * n_docs
        assert r["vocab"] == n_docs + 1  # 'the' + one new token per doc


def test_zipf_topk_rank_and_product(spark):
    # 'a' x6, 'b' x3, 'c' x2 -> ranks 1,2,3; products 6,6,6 (flat head)
    texts = ["a a a b b c", "a a a b c"]
    rows = zipf_topk(_docs(spark, texts), k=3).collect()
    got = [(r["rank"], r["tok"], r["cnt"], r["zipf_product"]) for r in rows]
    assert sorted(got) == [(1, "a", 6, 6), (2, "b", 3, 6), (3, "c", 2, 6)]


def test_zipf_topk_tie_breaks_on_token(spark):
    texts = ["x y", "y x"]  # both count 2 -> rank by token string
    rows = sorted(zipf_topk(_docs(spark, texts), k=2).collect(), key=lambda r: r["rank"])
    assert [r["tok"] for r in rows] == ["x", "y"]


def test_chunk_dedup_stats_planted_duplicates(spark):
    # chunk size 4: doc0 and doc1 share their FIRST 4-token chunk
    # exactly; second chunks differ; doc2 is all-unique.
    texts = [
        "a b c d e f g h",
        "a b c d x y z w",
        "p q r s t u v n",
    ]
    out = {
        r["doc_id"]: r
        for r in chunk_dedup_stats(_docs(spark, texts), chunk_tokens=4).collect()
    }
    assert out[0]["n_chunks"] == 2 and out[0]["n_dup_chunks"] == 1
    assert out[0]["dup_chunk_frac"] == 0.5
    assert out[1]["n_dup_chunks"] == 1
    assert out[2]["n_dup_chunks"] == 0 and out[2]["dup_chunk_frac"] == 0.0


def test_chunk_dedup_partial_tail_chunk(spark):
    # 6 tokens at chunk 4 -> chunks of 4 and 2; the 2-token tail is its
    # own identity (no padding), duplicated across docs
    texts = ["a b c d e f", "x y z w e f"]
    out = {
        r["doc_id"]: r
        for r in chunk_dedup_stats(_docs(spark, texts), chunk_tokens=4).collect()
    }
    for d in (0, 1):
        assert out[d]["n_chunks"] == 2
        assert out[d]["n_dup_chunks"] == 1  # the shared 'e f' tail


def test_encoding_flags_count_exactly(spark):
    import pyspark.sql.functions as F

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "clean ascii text",
                "mojibake cafÃ© and more Ã©",  # two 'Ã'
                "lost byte � here ��",  # three U+FFFD
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    flags = encoding_flag_columns(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *(c.alias(n) for n, c in flags.items())
        ).collect()
    }
    assert out[0]["n_replacement"] == 0 and out[0]["n_mojibake"] == 0
    assert out[0]["encoding_suspect"] == 0
    assert out[1]["n_mojibake"] == 2 and out[1]["encoding_suspect"] == 1
    assert out[2]["n_replacement"] == 3 and out[2]["encoding_suspect"] == 1
