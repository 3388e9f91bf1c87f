"""Goldens for the PQ/cluster-quality pair: product-quantization codes
and per-cluster label purity (operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.similarity import cluster_purity, pq_assign


def _vecs(spark, rows):
    """rows = (vec_id, embedding, label)."""
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_pq_codes_identify_matching_subspace(spark):
    # 4-dim vectors, m=2 subspaces of 2 dims; codebook = ids 0 and 1.
    # centroid 0 = [1,0 | 0,1]; centroid 1 = [0,1 | 1,0].
    # query id 2 = [1,0, 1,0]: subspace 0 matches code 0 exactly
    # (cos=1), subspace 1 matches code 1 exactly.
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0], 0),
        (1, [0.0, 1.0, 1.0, 0.0], 1),
        (2, [1.0, 0.0, 1.0, 0.0], 0),
    ]
    out = pq_assign(_vecs(spark, rows), m=2, sub_dim=2, k=2).collect()
    codes = {(r["vec_id"], r["subspace"]): (r["code"], r["sub_cosine"]) for r in out}
    assert len(out) == 6  # 3 vectors x 2 subspaces
    assert codes[(2, 0)] == (0, 1.0)
    assert codes[(2, 1)] == (1, 1.0)
    # each codebook vector encodes itself perfectly in every subspace
    assert codes[(0, 0)] == (0, 1.0)
    assert codes[(1, 1)] == (1, 1.0)


def test_pq_tie_breaks_by_code(spark):
    # both centroids identical in subspace 0 -> tie -> lower code wins
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0], 0),
        (1, [1.0, 0.0, 1.0, 0.0], 1),
        (5, [2.0, 0.0, 0.0, 2.0], 0),
    ]
    out = pq_assign(_vecs(spark, rows), m=2, sub_dim=2, k=2).collect()
    codes = {(r["vec_id"], r["subspace"]): r["code"] for r in out}
    assert codes[(5, 0)] == 0


def test_purity_hand_computed(spark):
    # centroids = ids 0,1 (labels 0,1). id 2 = centroid 0's vector
    # (label 0), id 3 ~ centroid 0 but label 1, id 4 = centroid 1's
    # vector (label 1). Cluster 0: {0,2,3} labels [0,0,1] -> purity
    # 2/3; cluster 1: {1,4} labels [1,1] -> purity 1.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 1),
        (2, [2.0, 0.0], 0),
        (3, [3.0, 0.1], 1),
        (4, [0.0, 5.0], 1),
    ]
    out = cluster_purity(_vecs(spark, rows), n_centroids=2).collect()
    by = {r["centroid_id"]: r for r in out}
    assert (by[0]["n_vecs"], by[0]["n_labels"], by[0]["top_label"]) == (3, 2, 0)
    assert by[0]["purity"] == 0.666667
    assert (by[1]["n_vecs"], by[1]["purity"]) == (2, 1.0)


def test_purity_top_label_tie_by_label_asc(spark):
    # cluster with labels [7, 3] once each -> top label 3 (asc tie)
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.0, 1.0], 9),
        (2, [2.0, 0.0], 3),
    ]
    out = cluster_purity(_vecs(spark, rows), n_centroids=2).collect()
    by = {r["centroid_id"]: r for r in out}
    assert by[0]["top_label"] == 3
    assert by[0]["purity"] == 0.5
