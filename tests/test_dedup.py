"""Unit tests for the bucket-first dedup library (operators/dedup.py).

Planted cases: an exact duplicate pair, a near-duplicate pair (one token
changed), unrelated filler docs, and a ubiquitous stop-token ('the') that
the document-frequency cap must drop before any pair generation.
"""

from __future__ import annotations

import pandas as pd

from dataquality_box_spark.operators.dedup import (
    jaccard_pairs_lsh,
    lsh_candidate_pairs,
    minhash_band_signatures,
    simhash64,
    simhash_hamming_pairs,
    token_sets,
)

BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
FILLER_VOCAB = [
    "zulu yankee xray whiskey victor",
    "uniform tango sierra romeo quebec",
    "papa oscar november mike lima",
    "green blue red yellow purple",
    "one two three four five",
    "six seven eight nine ten",
    "cat dog bird fish horse",
    "oak pine elm birch maple",
    "north south east west center",
]


def _docs(spark):
    texts = ["the " + BASE, "the " + BASE, "the " + BASE.replace("juliet", "kilo")]
    texts += ["the " + v for v in FILLER_VOCAB]
    rows = pd.DataFrame({"doc_id": range(1, len(texts) + 1), "text": texts})
    return spark.createDataFrame(rows)


def test_df_cap_drops_ubiquitous_token(spark):
    # 12 docs, cap 1/2: dropped iff df*2 > 12 -> 'the' (df=12) goes,
    # the BASE vocabulary (df=3) stays
    toks = token_sets(_docs(spark), df_cap_inv=2)
    kept = {r["tok"] for r in toks.select("tok").distinct().collect()}
    assert "the" not in kept
    assert {"alpha", "juliet", "kilo", "zulu"} <= kept


def test_lsh_finds_planted_near_dups(spark):
    pairs = jaccard_pairs_lsh(_docs(spark), threshold=0.8, df_cap_inv=2).toPandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in got  # exact dup (jaccard 1.0)
    assert (1, 3) in got and (2, 3) in got  # 9/11 = 0.818 >= 0.8
    filler_ids = set(range(4, 13))
    assert all(a not in filler_ids and b not in filler_ids for a, b in got)


def test_lsh_candidates_only_within_buckets(spark):
    toks = token_sets(_docs(spark), df_cap_inv=2)
    sig = minhash_band_signatures(toks)
    cands = lsh_candidate_pairs(sig).toPandas()
    got = {(int(a), int(b)) for a, b in zip(cands["doc_a"], cands["doc_b"])}
    assert (1, 2) in got
    # disjoint-vocabulary docs never share a band (equal band key requires
    # 4 equal minhash rows)
    filler_ids = set(range(4, 13))
    assert all(not (a in filler_ids or b in filler_ids) for a, b in got)


def test_simhash64_halves(spark):
    toks = token_sets(_docs(spark), df_cap_inv=None)
    sh = simhash64(toks)
    pdf = sh.toPandas().set_index("doc_id")
    # identical token sets -> identical 64-bit simhash
    assert pdf.loc[1, "simhash_hi"] == pdf.loc[2, "simhash_hi"]
    assert pdf.loc[1, "simhash_lo"] == pdf.loc[2, "simhash_lo"]
    # halves stay in unsigned-32 range (no sign-bit overflow)
    assert (pdf[["simhash_hi", "simhash_lo"]] >= 0).all().all()
    assert (pdf[["simhash_hi", "simhash_lo"]] < (1 << 32)).all().all()
    pairs = simhash_hamming_pairs(sh, max_hamming=3).toPandas()
    got = {(int(a), int(b)): int(h) for a, b, h in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"])}
    assert got[(1, 2)] == 0  # exact dup -> distance 0
    filler_ids = set(range(4, 13))
    assert all(not (a in filler_ids or b in filler_ids) for a, b in got)


def test_simhash_banding_recall_guarantee(spark):
    # Constructed signatures: recall at hamming <= 3 is EXACT (pigeonhole
    # over 4 bands of 16); a pair with one flip in every band is missed
    # even at a higher verify threshold (documented best-effort regime).
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            # doc 2 = doc 1 with 3 bits flipped, all inside band b1 (hi low half)
            # doc 3 = doc 1 with 1 bit flipped in EACH of the 4 bands
            # doc 4 = unrelated pattern
            "simhash_hi": [
                0xAAAA5555,
                0xAAAA5555 ^ 0x00000007,          # 3 flips in b1
                0xAAAA5555 ^ 0x00010001,          # 1 flip b0, 1 flip b1
                0x12345678,
            ],
            "simhash_lo": [
                0x0F0F0F0F,
                0x0F0F0F0F,
                0x0F0F0F0F ^ 0x00010001,          # 1 flip b2, 1 flip b3
                0x0BADF00D,
            ],
        }
    )
    sh = spark.createDataFrame(rows)
    got3 = {
        (int(a), int(b)): int(h)
        for a, b, h in simhash_hamming_pairs(sh, max_hamming=3)
        .toPandas()[["doc_a", "doc_b", "hamming"]]
        .itertuples(index=False)
    }
    assert got3[(1, 2)] == 3  # guaranteed: bands b0/b2/b3 untouched
    assert (1, 3) not in got3  # hamming 4 > threshold anyway
    got8 = {
        (int(a), int(b))
        for a, b in simhash_hamming_pairs(sh, max_hamming=8)
        .toPandas()[["doc_a", "doc_b"]]
        .itertuples(index=False)
    }
    assert (1, 2) in got8
    assert (1, 3) not in got8  # every band flipped -> never a candidate


def test_jaccard_lsh_exact_values(spark):
    pairs = jaccard_pairs_lsh(_docs(spark), threshold=0.5, df_cap_inv=2).toPandas()
    m = {(int(a), int(b)): float(j) for a, b, j in
         zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"])}
    assert m[(1, 2)] == 1.0
    toks = token_sets(_docs(spark), df_cap_inv=2).toPandas()
    s1 = set(toks[toks.doc_id == 1]["tok"])
    s3 = set(toks[toks.doc_id == 3]["tok"])
    expected = round(len(s1 & s3) / len(s1 | s3), 6)
    assert m[(1, 3)] == expected


def test_incremental_lsh_only_new_vs_corpus_pairs(spark):
    from dataquality_box_spark.operators.dedup import (
        incremental_lsh_pairs,
        token_sets,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),  # "new": near-dup of corpus doc 11
        (10, "completely unrelated words about spark catalyst planner internals"),
        (11, base + " x"),  # corpus near-dup of new doc 0
        (12, base + " x"),  # corpus dup of 11 — corpus-corpus pair must NOT emit
        (13, "another distinct document body with its own vocabulary entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = token_sets(docs, df_cap_inv=None)
    new = toks.where("doc_id < 10")
    corpus = toks.where("doc_id >= 10")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in incremental_lsh_pairs(new, corpus, threshold=0.8).collect()
    }
    assert set(got) == {(0, 11), (0, 12)}  # new-vs-corpus only, both corpus dups found
    assert all(j >= 0.8 for j in got.values())


def test_incremental_redelivered_id_no_selfpair_no_inflation(spark):
    """A recrawl that re-delivers an existing doc id: the self-pair must
    not emit, and the doubled (id, tok) rows must not distort Jaccard for
    the doc's OTHER pairs (regression for the pre-distinct union)."""
    from dataquality_box_spark.operators.dedup import (
        incremental_lsh_pairs,
        token_sets,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (11, base),  # re-delivered: same id + text on both sides
        (12, base + " x"),  # corpus near-dup of 11
        (13, "another distinct document body with its own vocabulary entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = token_sets(docs, df_cap_inv=None)
    new = toks.where("doc_id = 11")
    corpus = toks  # corpus still contains 11
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in incremental_lsh_pairs(new, corpus, threshold=0.8).collect()
    }
    assert set(got) == {(11, 12)}  # no (11, 11) self-pair
    # 12 distinct base tokens vs 13 (+' x'): jaccard 12/13 — doubled
    # token rows from the id overlap would inflate this
    assert got[(11, 12)] == round(12 / 13, 6)


def test_stored_corpus_index_recrawl_never_scans_corpus(spark, tmp_path):
    """The production incremental route: persist the corpus LSH index
    once; a recrawl batch probes the STORED tables and must (a) produce
    the same pairs as the self-contained route and (b) have a plan with
    zero scans of the corpus documents source."""
    from dataquality_box_spark.operators.dedup import (
        hot_token_list,
        incremental_lsh_pairs,
        incremental_lsh_pairs_stored,
        persist_corpus_index,
        token_sets,
    )
    from dataquality_box_spark.sources.tableio import TableIO

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    # 'common' is in every doc -> the DF cap (df*2 > 5) drops it and
    # nothing else; base tokens sit at df=2 and survive
    corpus_rows = [
        (11, base + " x common"),
        (12, base + " x y common"),
        (13, "another distinct document body with its own vocabulary common"),
        (14, "more unrelated filler words entirely different lexicon common"),
        (15, "yet more padding prose completely separate content common"),
    ]
    # corpus lives in a parquet source so the plan check has a real path
    corpus_path = str(tmp_path / "corpus_docs")
    spark.createDataFrame(corpus_rows, "doc_id long, text string").write.parquet(
        corpus_path
    )
    corpus_docs = spark.read.parquet(corpus_path)
    from pyspark.sql import functions as F

    corpus_toks_uncapped = token_sets(corpus_docs, df_cap_inv=None)
    hot = hot_token_list(corpus_toks_uncapped, df_cap_inv=2)
    corpus_toks = corpus_toks_uncapped.join(F.broadcast(hot), "tok", "left_anti")

    io = TableIO(str(tmp_path / "index"))
    persist_corpus_index(spark, io, corpus_toks, hot_tokens=hot)

    new_docs = spark.createDataFrame([(0, base + " common")], "doc_id long, text string")
    new_toks_uncapped = token_sets(new_docs, df_cap_inv=None)
    result = incremental_lsh_pairs_stored(spark, io, new_toks_uncapped, threshold=0.5)

    # (b) the recrawl plan reads ONLY the persisted index, never the corpus
    files = result.inputFiles()
    assert files and not any("corpus_docs" in f for f in files)
    assert any("lsh_corpus_buckets" in f for f in files)
    assert any("lsh_corpus_tokens" in f for f in files)
    assert any("lsh_corpus_sizes" in f for f in files)

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in result.collect()}
    # the persisted hot list was re-applied to the new batch: 'common'
    # contributes nothing, so jaccard(0,11) = 12 shared / 13 union
    assert (0, 11) in got and got[(0, 11)] == round(12 / 13, 6)
    # (a) parity with the self-contained route over the same cap population
    capped_new = new_toks_uncapped.join(F.broadcast(hot), "tok", "left_anti")
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in incremental_lsh_pairs(
            capped_new, corpus_toks, threshold=0.5
        ).collect()
    }
    assert got == want


def test_stored_corpus_index_grows_with_batches(spark, tmp_path):
    """persist_corpus_index called with a processed batch MERGEs it into
    the index; the next recrawl sees it."""
    from dataquality_box_spark.operators.dedup import (
        incremental_lsh_pairs_stored,
        persist_corpus_index,
        token_sets,
    )
    from dataquality_box_spark.sources.tableio import TableIO

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    io = TableIO(str(tmp_path / "index"))
    corpus = spark.createDataFrame(
        [(13, "another distinct document body with its own vocabulary entirely")],
        "doc_id long, text string",
    )
    persist_corpus_index(spark, io, token_sets(corpus, df_cap_inv=None))

    batch1 = spark.createDataFrame([(20, base + " x")], "doc_id long, text string")
    b1_toks = token_sets(batch1, df_cap_inv=None)
    assert incremental_lsh_pairs_stored(spark, io, b1_toks, threshold=0.8).count() == 0
    persist_corpus_index(spark, io, b1_toks)  # fold batch 1 into the index

    batch2 = spark.createDataFrame([(30, base)], "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs_stored(
            spark, io, token_sets(batch2, df_cap_inv=None), threshold=0.8
        ).collect()
    }
    assert got == {(30, 20)}  # batch 2 matches batch 1 via the grown index


def test_shingles_on_short_docs_yield_empty_not_crash(spark):
    from dataquality_box_spark.operators.curation import decontaminate
    from dataquality_box_spark.operators.dedup import shingle_sets

    docs = spark.createDataFrame(
        [(0, "ok"), (1, "two tokens"), (2, ""), (3, "exactly three tokens here")],
        "doc_id long, text string",
    )
    sh = shingle_sets(docs, n=3)
    got = {r["doc_id"]: r["tok"] for r in sh.collect()}
    # docs shorter than n produce NO shingles (sequence(1,0) is the
    # descending [1,0] trap — regression for the element_at(toks,0) crash)
    assert set(got) == {3}
    # and the curation paths that route arbitrary corpora through
    # shingles survive short docs end-to-end
    out = decontaminate(sh, sh.limit(0).unionByName(sh)).count()
    assert out >= 0


def test_stored_index_redelivery_replaces_tokens_wholesale(spark, tmp_path):
    """A recrawled doc whose text CHANGED: persist must delete its old
    token rows, not leave them beside the new ones — stale tokens inflate
    n_common against the replaced size and can push Jaccard above 1."""
    from dataquality_box_spark.operators.dedup import (
        incremental_lsh_pairs_stored,
        persist_corpus_index,
        token_sets,
    )
    from dataquality_box_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path / "idx"))
    v1 = spark.createDataFrame(
        [(7, "alpha bravo charlie delta"), (8, "unrelated totally different words")],
        "doc_id long, text string",
    )
    persist_corpus_index(spark, io, token_sets(v1, df_cap_inv=None))
    # recrawl: doc 7's text changed to {alpha, echo}
    v2 = spark.createDataFrame([(7, "alpha echo")], "doc_id long, text string")
    persist_corpus_index(spark, io, token_sets(v2, df_cap_inv=None))

    toks = {
        (r["doc_id"], r["tok"])
        for r in io.read(spark, "lsh_corpus_tokens").collect()
    }
    assert {t for d, t in toks if d == 7} == {"alpha", "echo"}  # old rows gone

    # a new batch overlapping doc 7's OLD text must get the true jaccard
    new = spark.createDataFrame(
        [(100, "alpha bravo charlie delta")], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in incremental_lsh_pairs_stored(
            spark, io, token_sets(new, df_cap_inv=None), threshold=0.01
        ).collect()
    }
    for pair, j in got.items():
        assert 0.0 <= j <= 1.0, (pair, j)
    if (100, 7) in got:  # overlap {alpha}: 1/(4+2-1)
        assert got[(100, 7)] == round(1 / 5, 6)


def test_duplicate_clusters_transitive_and_keep_one(spark):
    """A~B and B~C (no direct A~C pair) must land in ONE cluster with
    exactly one kept representative; disjoint components stay separate;
    the loop converges on chain-shaped graphs (worst diameter)."""
    from dataquality_box_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (worst-case diameter), pair {10, 11}, pair {20, 21}
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert {d: c for d, (c, _) in got.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20,
    }
    kept = {d for d, (_, k) in got.items() if k}
    assert kept == {1, 10, 20}  # exactly one representative per cluster


def test_pick_representatives_by_quality(spark):
    """Quality-ranked keep-one: the cluster keeps its highest-scored doc
    (ties and missing scores break to the smaller id)."""
    from dataquality_box_spark.operators.dedup import (
        duplicate_clusters,
        pick_representatives,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, None), (11, None)],
        "doc_id long, score double",
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in pick_representatives(
            duplicate_clusters(pairs), quality
        ).collect()
    }
    assert got == {1: False, 2: True, 3: False, 10: True, 11: False}


def test_persist_corpus_index_rewrites_only_touched_partitions(spark, tmp_path):
    """Partition-bounded corpus-index MERGE: folding batch 2 into the
    index must leave every bucket partition its keys do NOT touch
    byte-identical on disk (mtime_ns + size per file) — the 100-TB
    incremental story without the full-table rewrite."""
    import os

    from dataquality_box_spark.operators.dedup import (
        incremental_lsh_pairs_stored,
        persist_corpus_index,
        token_sets,
    )
    from dataquality_box_spark.sources.merge import BUCKET_COL, key_bucket
    from dataquality_box_spark.sources.tableio import TableIO
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path / "idx"))
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} body alpha{i} beta{i} gamma{i}") for i in range(64)],
        "doc_id long, text string",
    )
    persist_corpus_index(spark, io, token_sets(corpus, df_cap_inv=None))

    def file_index(table):
        out = {}
        tdir = os.path.join(io.root, table)
        for dirpath, _dirs, files in os.walk(tdir):
            for f in files:
                if f.startswith((".", "_")):
                    continue
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, tdir)] = (st.st_mtime_ns, st.st_size)
        return out

    before = {t: file_index(f"lsh_corpus_{t}") for t in ("buckets", "tokens", "sizes")}

    batch2 = spark.createDataFrame(
        [(1000, "totally fresh recrawl document body zeta")],
        "doc_id long, text string",
    )
    persist_corpus_index(spark, io, token_sets(batch2, df_cap_inv=None))

    touched = {
        r[0]
        for r in spark.createDataFrame([(1000,)], "doc_id long")
        .select(key_bucket(["doc_id"], 16).alias("b"))
        .collect()
    }
    for t in ("buckets", "tokens", "sizes"):
        after = file_index(f"lsh_corpus_{t}")
        untouched_b = {
            k: v for k, v in before[t].items()
            if not any(f"{BUCKET_COL}={b}/" in k for b in touched)
        }
        untouched_a = {
            k: v for k, v in after.items()
            if not any(f"{BUCKET_COL}={b}/" in k for b in touched)
        }
        assert untouched_b and untouched_b == untouched_a, t

    # the grown index still answers recrawl probes (stored-route green)
    probe = spark.createDataFrame(
        [(2000, "totally fresh recrawl document body zeta")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_lsh_pairs_stored(
            spark, io, token_sets(probe, df_cap_inv=None), threshold=0.8
        ).collect()
    }
    assert got == {(2000, 1000)}


def test_inline_incremental_redelivery_prefers_new_tokens(spark):
    """Inline incremental route, re-delivered doc whose token set CHANGED:
    the new batch's rows win wholesale (union would inflate the union
    size and skew Jaccard low for its pairs with third docs)."""
    from dataquality_box_spark.operators.dedup import incremental_lsh_pairs

    # doc 7 v1 (corpus): {alpha bravo charlie delta}; v2 (new): {alpha
    # bravo charlie echo}. doc 8 (corpus) shares v2's exact tokens.
    corpus = spark.createDataFrame(
        [(7, t) for t in ["alpha", "bravo", "charlie", "delta"]]
        + [(8, t) for t in ["alpha", "bravo", "charlie", "echo"]],
        "doc_id long, tok string",
    )
    new = spark.createDataFrame(
        [(7, t) for t in ["alpha", "bravo", "charlie", "echo"]],
        "doc_id long, tok string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in incremental_lsh_pairs(new, corpus, threshold=0.5).collect()
    }
    # replace-wholesale: doc 7 == doc 8 exactly (jaccard 1.0); the stale
    # union {alpha bravo charlie delta echo} would give 4/5
    assert got == {(7, 8): 1.0}


def test_duplicate_clusters_raises_on_nonconvergence(spark):
    """Exhausting max_iters before the fixpoint must raise (a silently
    split chain keeps near-dups), pointing at the star variant."""
    import pytest

    from dataquality_box_spark.operators.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="star"):
        duplicate_clusters(chain, max_iters=3)


def test_duplicate_clusters_singletons_via_all_docs(spark):
    """With all_docs, pair-free docs come back as their own kept
    singleton clusters — joining the output to the corpus loses nothing."""
    from dataquality_box_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4)], "doc_id long"
    )
    for fn in (duplicate_clusters, duplicate_clusters_star):
        got = {
            r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in fn(pairs, all_docs=docs).collect()
        }
        assert got == {
            1: (1, True), 2: (1, False), 3: (3, True), 4: (4, True)
        }, fn.__name__


def test_star_clusters_parity_with_min_label(spark):
    """large-star/small-star must produce byte-identical clusters to
    min-label propagation on star, chain, ring and mixed fixtures."""
    from dataquality_box_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    fixtures = {
        "star": [(1, k) for k in range(2, 9)],
        "chain": [(i, i + 1) for i in range(1, 9)],
        "ring": [(i, i + 1) for i in range(1, 8)] + [(8, 1)],
        "mixed": [(1, 2), (2, 3), (10, 11), (21, 20), (30, 31), (31, 32), (30, 32)],
    }
    for name, edges in fixtures.items():
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        want = {
            (r["doc_id"], r["cluster_id"], r["keep"])
            for r in duplicate_clusters(pairs).collect()
        }
        got = {
            (r["doc_id"], r["cluster_id"], r["keep"])
            for r in duplicate_clusters_star(pairs).collect()
        }
        assert got == want, name


def test_star_clusters_long_chain_converges_in_log_rounds(spark):
    """A 1k-link chain: min-label needs ~1000 rounds (and raises at any
    reasonable cap); the star alternation converges in O(log n) — the
    documented extreme-scale upgrade, round-count asserted."""
    from dataquality_box_spark.operators.dedup import duplicate_clusters_star

    n = 1024
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    rounds: list[int] = []
    got = duplicate_clusters_star(chain, rounds_out=rounds)
    rows = got.collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 1 for r in rows)
    assert sum(1 for r in rows if r["keep"]) == 1
    assert rounds[0] <= 15, rounds  # ~log2(1024)=10 alternations, not ~1000


def test_cluster_ops_on_empty_pairs(spark):
    """Zero near-dup pairs: both CC variants return empty without error,
    and with all_docs every doc comes back as a kept singleton."""
    from dataquality_box_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    for fn in (duplicate_clusters, duplicate_clusters_star):
        assert fn(empty).count() == 0, fn.__name__
        got = {
            r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in fn(empty, all_docs=docs).collect()
        }
        assert got == {1: (1, True), 2: (2, True)}, fn.__name__


def test_bloom_probe_no_false_negatives_and_matches_python_model(spark):
    import hashlib

    from dataquality_box_spark.operators.dedup import (
        bloom_bit_positions,
        bloom_probe,
    )

    from pyspark.sql import functions as F

    m, k = 256, 3  # small m so false positives actually occur
    keys = spark.createDataFrame([(i,) for i in range(120)], "doc_id long")
    seen_ids = [i for i in range(120) if i % 3 != 0]
    seen = keys.where(F.col("doc_id") % 3 != 0)
    bits = bloom_bit_positions(seen, m, k)
    got = {r["doc_id"]: r["maybe_seen"] for r in bloom_probe(keys, bits, m, k).collect()}

    def positions(key):
        return {
            int(hashlib.md5(f"bl{i}#{key}".encode()).hexdigest()[:8], 16) % m
            for i in range(k)
        }

    # duplicate probe keys must not double hit counts past the == k gate
    dup_keys = keys.union(keys.where(F.col("doc_id") % 3 != 0))
    got_dup = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_probe(dup_keys, bits, m, k).collect()
    }
    assert got_dup == got

    bitset = set().union(*(positions(i) for i in seen_ids))
    fp = 0
    for i in range(120):
        expect = positions(i) <= bitset
        assert got[i] == expect, i
        if i % 3 != 0:
            assert got[i], f"false negative for seen key {i}"
        elif got[i]:
            fp += 1
    assert fp > 0  # m chosen so the false-positive path is exercised


def test_funnel_cluster_stage_survives_long_chain(spark):
    """The clustered funnel's dedup stage (star-CC + quality-ranked
    representatives — the exact composition curation_funnel_clustered
    runs) completes on a 100-link duplicate chain and keeps ONE doc,
    the argmax-quality one; min-label CC at its default cap would raise
    on this fixture, which is why the funnel wires the star variant."""
    import pytest

    from dataquality_box_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
        pick_representatives,
    )

    n = 100
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(1, n + 3)], "doc_id long"  # +2 pair-free docs
    )
    # quality peaks mid-chain: representative selection must pick 57,
    # not the min id
    scores = spark.createDataFrame(
        [(i, 1.0 + (57 - abs(i - 57)) * 0.01) for i in range(1, n + 3)],
        "doc_id long, score double",
    )
    reps = {
        r["doc_id"]: r["keep"]
        for r in pick_representatives(
            duplicate_clusters_star(chain, all_docs=docs), scores
        ).collect()
    }
    assert len(reps) == n + 2
    kept_chain = [d for d in range(1, n + 1) if reps[d]]
    assert kept_chain == [57]  # one survivor, the best-quality doc
    assert reps[n + 1] and reps[n + 2]  # singletons stay kept
    # the min-label walk at the funnel's old default raises here instead
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(chain, max_iters=20).collect()
