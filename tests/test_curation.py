"""Curation operators: decontamination, hash sampling, sequence packing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataquality_box_spark.operators.curation import (
    decontaminate,
    hash_sample,
    pack_bins_contiguous,
    pack_bins_nextfit,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon", "en"),
        (1, "alpha beta gamma zeta eta", "en"),  # shares "alpha beta gamma"
        (2, "one two three four five six", "de"),
        (3, "totally different words here now", "fr"),
        (4, "four five six seven eight", "de"),  # shares "four five six"
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_shared_shingles(spark, docs):
    from dataquality_box_spark.operators.dedup import shingle_sets

    sh = shingle_sets(docs, n=3)
    bench = sh.where(F.col("doc_id").isin([0, 2]))
    corpus = sh.where(~F.col("doc_id").isin([0, 2]))
    hits = {r["doc_id"]: r["n_contaminated"] for r in decontaminate(corpus, bench).collect()}
    assert hits == {1: 1, 4: 1}  # doc 3 shares nothing


def test_hash_sample_deterministic_and_stratified(spark, docs):
    s1 = hash_sample(docs, "doc_id", rate=0.5, salt="s0").collect()
    s2 = hash_sample(docs, "doc_id", rate=0.5, salt="s0").collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    # rate 0 / 1 bound the gate exactly
    assert hash_sample(docs, "doc_id", rate=0.0).count() == 0
    assert hash_sample(docs, "doc_id", rate=1.0).count() == docs.count()
    # a stratum with rate 0 is fully excluded regardless of the default
    s = hash_sample(
        docs, "doc_id", rate=1.0, strata_rates={"en": 0.0}, strata_col="lang"
    ).collect()
    assert all(r["lang"] != "en" for r in s) and len(s) == 3


def test_pack_nextfit_respects_budget(spark):
    rows = [(i, i % 4, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, shard_in long, n_tokens long")
    out = pack_bins_nextfit(df, F.col("shard_in"), "doc_id", "n_tokens", budget=128)
    pdf = out.toPandas()
    # hard cap: every bin fits the budget (no single doc exceeds 128 here)
    assert (pdf["total_tokens"] <= 128).all()
    assert pdf["n_docs"].sum() == 200
    # bins are contiguous runs: first/last doc ranges never interleave
    for _, g in pdf.groupby("shard"):
        g = g.sort_values("bin_id")
        assert (g["first_doc"].to_numpy()[1:] > g["last_doc"].to_numpy()[:-1]).all()


def test_pack_nextfit_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 0, 50), (1, 0, 500), (2, 0, 50)], "doc_id long, s long, n_tokens long"
    )
    pdf = (
        pack_bins_nextfit(df, F.col("s"), "doc_id", "n_tokens", budget=128)
        .toPandas()
        .sort_values("bin_id")
    )
    assert pdf["n_docs"].tolist() == [1, 1, 1]
    assert pdf["total_tokens"].tolist() == [50, 500, 50]


def test_pack_contiguous_conserves_docs_and_tokens(spark):
    rows = [(i, 10 + (i * 13) % 70) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_bins_contiguous(
        df, F.col("doc_id") % 8, "doc_id", "n_tokens", budget=256
    ).toPandas()
    assert out["n_docs"].sum() == 300
    assert out["total_tokens"].sum() == sum(t for _, t in rows)
    # overflow bound: a bin exceeds budget by strictly less than one doc
    max_doc = max(t for _, t in rows)
    assert (out["total_tokens"] < 256 + max_doc).all()


def test_pack_contiguous_ties_use_rows_frame(spark):
    # non-unique order_col: Spark's default RANGE frame would sum ALL
    # peer rows tied on the order value, putting every tied doc in the
    # same (overflowing) late bin; the explicit ROWS frame fills
    # sequentially (ADVICE r2)
    df = spark.createDataFrame(
        [(i, 0, 60) for i in range(4)], "doc_id long, ord long, n_tokens long"
    )
    out = (
        pack_bins_contiguous(df, F.lit(0), "ord", "n_tokens", budget=100)
        .toPandas()
        .sort_values("bin_id")
    )
    # 4 docs x 60 tokens, budget 100: sequential fill -> bins of 2+2
    # (RANGE would yield cum_before=180 for all four -> one bin)
    assert out["bin_id"].tolist() == [0, 1]
    assert out["n_docs"].tolist() == [2, 2]


def _grams(spark, rows):
    from dataquality_box_spark.functions.text import ngram_array, tokens

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        "doc_id", F.explode(ngram_array(tokens(F.col("text")), 2)).alias("g")
    )


def test_dsir_ranks_target_like_docs_higher(spark):
    from dataquality_box_spark.operators.curation import dsir_logratio_weights

    # target distribution is all about "spark shuffle"; raw corpus is
    # mostly "cat dog". A raw doc made of target-distinctive grams must
    # outscore a raw doc made of raw-common grams.
    target = _grams(spark, [(100 + i, "spark shuffle spark shuffle spark") for i in range(5)])
    raw = _grams(
        spark,
        [(i, "cat dog cat dog cat dog") for i in range(5)]
        + [(50, "spark shuffle spark shuffle"), (51, "cat dog cat dog")],
    )
    w = {r["doc_id"]: r["dsir_weight"] for r in dsir_logratio_weights(raw, target).collect()}
    assert set(w) == {0, 1, 2, 3, 4, 50, 51}
    assert w[50] > w[51]
    assert w[50] > 0 > w[51]


def test_dsir_weights_partitioning_invariant(spark):
    from dataquality_box_spark.operators.curation import dsir_logratio_weights

    texts = [
        (i, f"tok{i % 7} tok{(i * 3) % 11} tok{(i * 5) % 13} tok{i % 7} spark")
        for i in range(40)
    ]
    target = _grams(spark, [(1000 + i, "spark spark shuffle merge") for i in range(3)])
    raw = _grams(spark, texts)
    a = sorted(dsir_logratio_weights(raw, target).collect())
    b = sorted(dsir_logratio_weights(raw.repartition(7), target.repartition(3)).collect())
    # bucket-ordered folds + 9dp term rounding: weights must be
    # bit-identical under any partitioning (determinism contract)
    assert a == b


def test_ngram_array_matches_python_reference(spark):
    import re

    from dataquality_box_spark.functions.text import ngram_array, tokens

    texts = [
        "",
        "a",
        "a b",
        "a b c",
        "a b c d e",
        "  a   b  ",
        "tab\tsep\nnewline done",
        "x y z w v u t s r q",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    for n in (2, 3, 8):
        out = {
            r["id"]: r["g"]
            for r in df.select(
                "id", ngram_array(tokens(F.col("text")), n).alias("g")
            ).collect()
        }
        for i, t in enumerate(texts):
            tk = re.findall(r"\S+", t)
            exp = [" ".join(tk[j : j + n]) for j in range(len(tk) - n + 1)]
            assert out[i] == exp, (n, t)


def test_shared_hash_fraction_matches_pandas_reference(spark):
    import pandas as pd

    from dataquality_box_spark.operators.dedup import shared_hash_fraction

    # deterministic multiset: hash j is owned by owners 0..j%4 (so j%4==0
    # hashes are single-owner), plus repeated rows within an owner
    rows = []
    for j in range(30):
        for o in range(j % 4 + 1):
            rows.append((o, f"h{j}"))
            if j % 5 == 0:
                rows.append((o, f"h{j}"))  # within-owner repeat
    df = spark.createDataFrame(rows, "owner long, h string")
    got = {r["owner"]: r for r in shared_hash_fraction(df, "owner").collect()}
    pdf = pd.DataFrame(rows, columns=["owner", "h"])
    owners_per_hash = pdf.groupby("h")["owner"].nunique()
    shared_h = set(owners_per_hash[owners_per_hash >= 2].index)
    for o, g in pdf.groupby("owner"):
        n = len(g)
        s = int(g["h"].isin(shared_h).sum())
        assert got[o]["n_rows"] == n
        assert got[o]["n_shared"] == s
        assert abs(got[o]["shared_frac"] - round(s / n, 6)) < 1e-12


def test_mixture_plan_integer_exact(spark):
    import pandas as pd

    from dataquality_box_spark.operators.curation import mixture_plan

    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "source": ["web", "web", "code", "wiki"],
            "text": ["a b c d", "e f g h", "x y", "z"],
        }
    )
    docs = spark.createDataFrame(pdf)
    # weights 60/25/15 of a 100-token budget; 'absent' has weight 0 rows
    out = {
        r["source"]: r
        for r in mixture_plan(
            docs, {"web": 60, "code": 25, "wiki": 15}, budget_tokens=100
        ).collect()
    }
    web = out["web"]  # 8 tokens available, target 60 -> 7.5 epochs
    assert web["tokens_available"] == 8 and web["target_tokens"] == 60
    assert web["epochs_micro"] == 60 * 1_000_000 // 8
    assert web["rate_ppm"] == 1_000_000  # capped
    assert web["deficit"] == 1
    code = out["code"]  # 2 tokens, target 25
    assert code["target_tokens"] == 25 and code["deficit"] == 1
    wiki = out["wiki"]  # 1 token, target 15
    assert wiki["tokens_available"] == 1 and wiki["epochs_micro"] == 15_000_000


def test_mixture_plan_absent_source_fails_loudly(spark):
    import pandas as pd
    import pytest

    from dataquality_box_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "source": ["web"], "text": ["a b"]})
    )
    out = {
        r["source"]: r
        for r in mixture_plan(docs, {"web": 1, "ghost": 1}, 10).collect()
    }
    assert out["ghost"]["tokens_available"] == 0
    assert out["ghost"]["deficit"] == 1 and out["ghost"]["rate_ppm"] == 0
    # unweighted corpus source is excluded (rate 0), not an error
    out2 = {
        r["source"]: r for r in mixture_plan(docs, {"other": 1}, 10).collect()
    }
    assert out2["web"]["target_tokens"] == 0 and out2["web"]["rate_ppm"] == 0
    with pytest.raises(ValueError):
        mixture_plan(docs, {}, 10)


def test_split_long_docs_overlap_and_tail(spark):
    import pandas as pd

    from dataquality_box_spark.operators.curation import split_long_docs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": [" ".join(f"t{i}" for i in range(10)), "a b"]}
        )
    )
    out = sorted(
        split_long_docs(docs, max_tokens=8, overlap=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    # doc0: 10 tokens, stride 6 -> chunks [t0..t7], [t6..t9]
    assert [(r["doc_id"], r["chunk_idx"], r["n_tokens"]) for r in out] == [
        (0, 0, 8),
        (0, 1, 4),
        (1, 0, 2),
    ]
    assert out[0]["chunk_text"].split()[-2:] == ["t6", "t7"]
    assert out[1]["chunk_text"].split()[:2] == ["t6", "t7"]  # overlap
    assert out[2]["chunk_text"] == "a b"  # short doc -> one whole chunk


def test_split_long_docs_rejects_bad_overlap(spark):
    import pandas as pd
    import pytest

    from dataquality_box_spark.operators.curation import split_long_docs

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError):
        split_long_docs(docs, max_tokens=8, overlap=8)


def test_cluster_safe_split_keeps_clusters_whole(spark):
    import pandas as pd

    from dataquality_box_spark.operators.curation import cluster_safe_split

    # chain 1~2~3 must land on ONE side; 4 and 5 are singletons
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})
    )
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3, 4, 5]}))
    out = {
        r["doc_id"]: r
        for r in cluster_safe_split(pairs, docs, eval_rate=0.5).collect()
    }
    assert len(out) == 5
    assert len({out[d]["side"] for d in (1, 2, 3)}) == 1
    assert all(out[d]["cluster_id"] == 1 for d in (1, 2, 3))
    assert out[4]["cluster_id"] == 4 and out[5]["cluster_id"] == 5
    # deterministic: same inputs reproduce the same split
    again = {
        r["doc_id"]: r["side"]
        for r in cluster_safe_split(pairs, docs, eval_rate=0.5).collect()
    }
    assert again == {d: out[d]["side"] for d in out}


def test_cluster_safe_split_survives_long_chain(spark):
    """A duplicate chain deeper than min-label propagation's 20-round cap
    must still split (the star-CC route converges in O(log n) rounds):
    the r5 verdict's pathological case for the old duplicate_clusters
    call. All 40 chained docs form ONE cluster on ONE side."""
    import pandas as pd

    from dataquality_box_spark.operators.curation import cluster_safe_split

    n = 40  # diameter 39 > the propagation route's max_iters=20
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": list(range(n - 1)), "doc_b": list(range(1, n))})
    )
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
    out = cluster_safe_split(pairs, docs, eval_rate=0.3).collect()
    assert len(out) == n
    assert {r["cluster_id"] for r in out} == {0}
    assert len({r["side"] for r in out}) == 1


def test_mixture_plan_zero_weight_sum_raises(spark):
    import pandas as pd
    import pytest

    from dataquality_box_spark.operators.curation import mixture_plan

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "source": ["web"], "text": ["a b"]})
    )
    with pytest.raises(ValueError, match="sum to zero"):
        mixture_plan(docs, {"web": 0, "code": 0}, 10)
