"""Goldens for the asymmetric-dedup pair: shingle containment
(operators/dedup.py) and dup-cluster size histogram
(operators/clusters.py)."""

from __future__ import annotations

from aroma_spark.operators.clusters import cluster_size_histogram
from aroma_spark.operators.dedup import containment_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_quote_detection(spark):
    # doc 1 ("a b c d", 2 shingles) is fully inside doc 2
    # ("a b c d e", 3 shingles): containment = 2/min(2,3) = 1.0,
    # where Jaccard would only be 2/3.
    rows = [
        (1, "a b c d"),
        (2, "a b c d e"),
        (3, "x y z w"),
    ]
    out = containment_pairs(_docs(spark, rows), threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["n_inter"], r["n_a"], r["n_b"]) == (2, 2, 3)
    assert r["containment"] == 1.0


def test_containment_threshold_filters(spark):
    # docs share 1 of min-2 shingles -> 0.5; threshold 0.6 drops it
    rows = [
        (1, "a b c x"),
        (2, "a b c y"),
    ]
    # shingles: doc1 {a b c, b c x}, doc2 {a b c, b c y} -> inter 1,
    # containment = 1/2 = 0.5
    assert containment_pairs(_docs(spark, rows), threshold=0.6).count() == 0
    r = containment_pairs(_docs(spark, rows), threshold=0.5).collect()[0]
    assert r["containment"] == 0.5


def test_containment_no_shared_shingles(spark):
    rows = [(1, "a b c"), (2, "x y z")]
    assert containment_pairs(_docs(spark, rows), threshold=0.0).count() == 0


def test_cluster_histogram_hand_computed(spark):
    comp = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 30)],
        "node long, component long",
    )
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(comp).collect()
    }
    assert out == {3: (1, 3), 2: (1, 2), 1: (1, 1)}


def test_cluster_histogram_uniform(spark):
    comp = spark.createDataFrame(
        [(i, i // 2) for i in range(8)], "node long, component long"
    )
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(comp).collect()
    }
    assert out == {2: (4, 8)}
