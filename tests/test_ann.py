"""Unit tests for the IVF k-means ANN operator (operators/ann.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dataquality_box_spark.operators.ann import (
    assign_to_centroids,
    ivf_kmeans_centroids,
    ivf_topk,
)

DIM = 64


def _vec(axis: int, wobble: float) -> list[float]:
    v = [0.01] * DIM
    v[axis] = 1.0 + wobble
    return v


def _embeddings(spark):
    # two well-separated clusters: axis-0 heavy (ids 0-4), axis-1 heavy (5-9)
    rows = pd.DataFrame(
        {
            "vec_id": list(range(10)),
            "embedding": [_vec(0, i * 0.01) for i in range(5)]
            + [_vec(1, i * 0.01) for i in range(5)],
        }
    )
    return spark.createDataFrame(rows)


def test_kmeans_separates_clusters(spark):
    e = _embeddings(spark)
    # seed = first 2 vectors; both in cluster 0, but one Lloyd step pulls
    # a centroid to the axis-1 cluster via nearest-assignment majority
    cen = ivf_kmeans_centroids(e, k=2, iters=2)
    assign = assign_to_centroids(e, cen).toPandas()
    groups = assign.groupby("centroid_id")["vec_id"].apply(set).to_dict()
    assert set(map(frozenset, groups.values())) == {
        frozenset(range(5)),
        frozenset(range(5, 10)),
    }


def test_ivf_topk_probes_own_list_only(spark):
    e = _embeddings(spark)
    cen = ivf_kmeans_centroids(e, k=2, iters=2)
    top = ivf_topk(e, cen, F.col("vec_id") < 2, k=3).toPandas()
    # neighbors of axis-0 queries are all within the axis-0 list
    assert set(top["query_id"]) == {0, 1}
    assert set(top["cand_id"]) <= set(range(5))
    assert (top.groupby("query_id")["rnk"].max() == 3).all()


def test_kmeans_centroids_are_rounded(spark):
    e = _embeddings(spark)
    cen = ivf_kmeans_centroids(e, k=2, iters=1).toPandas()
    for emb in cen["embedding"]:
        assert all(abs(v - round(v, 4)) < 1e-12 for v in emb)


def test_multi_probe_improves_boundary_recall(spark):
    """A query vector between the two clusters finds its cross-cluster
    true neighbors only when it probes both lists (nprobe=2); candidates
    are never duplicated across lists."""
    rows = pd.DataFrame(
        {
            "vec_id": list(range(10)) + [99],
            "embedding": [_vec(0, i * 0.01) for i in range(5)]
            + [_vec(1, i * 0.01) for i in range(5)]
            # boundary query: equal pull toward both clusters
            + [[0.01] * DIM],
        }
    )
    e = spark.createDataFrame(rows)
    cen = ivf_kmeans_centroids(e.filter("vec_id < 10"), k=2, iters=2)
    pred = F.col("vec_id") == 99
    top1 = ivf_topk(e, cen, pred, k=10, nprobe=1).toPandas()
    top2 = ivf_topk(e, cen, pred, k=10, nprobe=2).toPandas()
    # nprobe=1 sees only one cluster's list; nprobe=2 sees both
    assert set(top1["cand_id"]).issubset(set(range(5))) or set(
        top1["cand_id"]
    ).issubset(set(range(5, 10)))
    assert len(top2) == 10  # every other vector reachable, no duplicates
    assert set(top2["cand_id"]) == set(range(10))
    assert top2["cand_id"].is_unique
