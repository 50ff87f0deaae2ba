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


def test_ngram_novelty_first_occurrence_attribution(spark):
    # doc0 introduces all its shingles; doc1 copies doc0's text (zero
    # novel); doc2 shares a 3-gram window with doc0 but adds new tail
    texts = [
        "a b c d e",       # shingles: abc bcd cde (3, all novel)
        "a b c d e",       # same 3 shingles, first_doc=0 -> novelty 0
        "c d e f g",       # cde (seen), def, efg -> 2/3 novel
    ]
    out = {
        r["doc_id"]: r for r in __import__(
            "dataquality_box_spark.operators.corpus", fromlist=["ngram_novelty"]
        ).ngram_novelty(_docs(spark, texts), n=3).collect()
    }
    assert out[0]["n_shingles"] == 3 and out[0]["novelty"] == 1.0
    assert out[1]["n_novel"] == 0 and out[1]["novelty"] == 0.0
    assert out[2]["n_shingles"] == 3 and out[2]["n_novel"] == 2
    assert abs(out[2]["novelty"] - round(2 / 3, 6)) < 1e-9


def test_ngram_novelty_short_docs_absent(spark):
    # docs shorter than n produce no shingles and no row
    texts = ["a b", "x y z"]
    from dataquality_box_spark.operators.corpus import ngram_novelty

    rows = ngram_novelty(_docs(spark, texts), n=3).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_template_prefix_groups_same_header_different_body(spark):
    from dataquality_box_spark.operators.corpus import template_prefix_groups

    header = "dear customer thank you for your recent order"
    texts = [
        header + " of widgets arriving tuesday",
        header + " of gadgets arriving friday",
        "completely unrelated document body with enough tokens here",
        "short doc",  # < 8 tokens -> excluded, not grouped
    ]
    rows = template_prefix_groups(
        _docs(spark, texts), prefix_tokens=8, min_group=2
    ).collect()
    assert len(rows) == 1
    g = rows[0]
    assert g["n_docs"] == 2 and g["min_doc_id"] == 0
    assert g["sample_prefix"] == header


def test_chunk_dedup_rewrite_first_occurrence_kept(spark):
    from dataquality_box_spark.operators.corpus import chunk_dedup_rewrite

    texts = [
        "a b c d",        # chunks(2): "a b", "c d" -> both first
        "c d e f c d",    # "c d" dup, "e f" new, "c d" dup again
        "a b",            # entire doc is a repeat -> new_text ''
        "x y z",          # tail chunk "z" shorter than 2 -> kept as-is
    ]
    out = {
        r["doc_id"]: r
        for r in chunk_dedup_rewrite(_docs(spark, texts), chunk_tokens=2).collect()
    }
    assert out[0]["new_text"] == "a b c d" and out[0]["n_kept"] == 2
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["new_text"] == "e f"
    assert out[2]["n_kept"] == 0 and out[2]["new_text"] == ""
    assert out[3]["new_text"] == "x y z" and out[3]["n_kept"] == 2


def test_winnow_fingerprints_closed_form(spark):
    from dataquality_box_spark.operators.corpus import winnow_fingerprints

    # doc0: 6 tokens -> 3 4-grams -> exactly one full window of w=3:
    # fp set = {min of all three gram hashes}
    # doc1: identical text -> identical digest; doc2: too short -> absent
    texts = ["a b c d e f", "a b c d e f", "a b c d"]
    out = {
        r["doc_id"]: r
        for r in winnow_fingerprints(_docs(spark, texts), k=4, w=3).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["n_grams"] == 3 and out[0]["n_fingerprints"] == 1
    assert out[0]["fp_digest"] == out[1]["fp_digest"]


def test_winnow_shared_passage_shares_fingerprints(spark):
    from dataquality_box_spark.operators.corpus import (
        winnow_fingerprint_set,
        winnow_fingerprints,
    )

    # winnowing guarantee: a copied passage longer than w+k-1 tokens
    # shares at least one selected fingerprint between the two docs,
    # wherever it sits in each doc
    shared = "p q r s t u v w"
    texts = [shared + " x1 y1 z1", "a0 b0 c0 " + shared]
    sets: dict[int, set] = {0: set(), 1: set()}
    for r in winnow_fingerprint_set(_docs(spark, texts), k=4, w=3).collect():
        sets[r["doc_id"]].add(r["fingerprint"])
    assert sets[0] & sets[1], "copied passage must share a fingerprint"
    digests = winnow_fingerprints(_docs(spark, texts), k=4, w=3).collect()
    assert digests[0]["fp_digest"] != digests[1]["fp_digest"]


def test_winnow_overlap_pairs_counts(spark):
    from dataquality_box_spark.operators.corpus import winnow_overlap_pairs

    shared = "p q r s t u v w"
    a = _docs(spark, [shared + " x1 y1 z1", "m1 m2 m3 m4 m5 m6"])
    b = _docs(spark, ["a0 b0 c0 " + shared, "n1 n2 n3 n4 n5 n6"])
    rows = winnow_overlap_pairs(a, b, k=4, w=3, min_shared=1).collect()
    # only the (0, 0) pair shares the copied passage; the m*/n* docs
    # share nothing with anyone
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 0)
    assert r["n_shared"] >= 1
    assert r["n_fp_a"] >= r["n_shared"] and r["n_fp_b"] >= r["n_shared"]


def test_stored_winnow_index_recrawl_never_scans_corpus(spark, tmp_path):
    """Persist the fingerprint index once; a recrawl batch probes the
    STORED table only: (a) pairs match the inline route, (b) the probe
    plan reads zero corpus files, (c) re-delivered docs replace their
    fingerprints wholesale."""
    from pyspark.sql import functions as F

    from dataquality_box_spark.operators.corpus import (
        persist_winnow_index,
        winnow_overlap_pairs,
        winnow_overlap_stored,
    )
    from dataquality_box_spark.sources.tableio import TableIO

    shared = "p q r s t u v w"
    corpus_rows = [
        (11, shared + " c1 c2 c3"),
        (12, "d1 d2 d3 d4 d5 d6 d7 d8"),
    ]
    corpus_path = str(tmp_path / "corpus_docs")
    spark.createDataFrame(corpus_rows, "doc_id long, text string").write.parquet(
        corpus_path
    )
    corpus = spark.read.parquet(corpus_path)
    io = TableIO(str(tmp_path / "widx"))
    persist_winnow_index(spark, io, corpus)

    new = spark.createDataFrame(
        [(0, "a0 b0 " + shared)], "doc_id long, text string"
    )
    result = winnow_overlap_stored(spark, io, new, min_shared=1)
    files = result.inputFiles()
    assert files and not any("corpus_docs" in f for f in files)
    assert any("winnow_corpus_fps" in f for f in files)

    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in result.collect()}
    want = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(new, corpus, min_shared=1).collect()
    }
    assert got == want and (0, 11) in got

    # re-deliver doc 11 with entirely new text: old fingerprints must
    # vanish (wholesale replace), so the probe no longer pairs with it
    changed = spark.createDataFrame(
        [(11, "z1 z2 z3 z4 z5 z6 z7 z8")], "doc_id long, text string"
    )
    persist_winnow_index(spark, io, changed)
    got2 = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_overlap_stored(spark, io, new, min_shared=1).collect()
    }
    assert (0, 11) not in got2


def test_stored_winnow_index_shrink_to_zero_deletes(spark, tmp_path):
    """A re-delivered doc too short to yield ANY fingerprint must still
    have its old index rows deleted (replace_keys path)."""
    from dataquality_box_spark.operators.corpus import (
        persist_winnow_index,
        winnow_overlap_stored,
    )
    from dataquality_box_spark.sources.tableio import TableIO

    shared = "p q r s t u v w"
    io = TableIO(str(tmp_path / "widx2"))
    corpus = spark.createDataFrame(
        [(11, shared + " c1 c2")], "doc_id long, text string"
    )
    persist_winnow_index(spark, io, corpus)
    new = spark.createDataFrame([(0, "a0 " + shared)], "doc_id long, text string")
    assert winnow_overlap_stored(spark, io, new).count() == 1
    # re-deliver doc 11 shrunk below k+w-1 tokens: zero fingerprints
    shrunk = spark.createDataFrame([(11, "tiny doc")], "doc_id long, text string")
    persist_winnow_index(spark, io, shrunk)
    assert winnow_overlap_stored(spark, io, new).count() == 0
