"""Embedding similarity: brute-force top-k and LSH-bucketed ANN."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from aroma_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_ann_pairs,
    lsh_signatures,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 2.0]),        # same direction: cos=1
        (2, [float(x) for x in base + rng.normal(size=8) * 0.05]),  # near
        (3, [float(x) for x in -base]),             # opposite: cos=-1
        (4, [float(x) for x in rng.normal(size=8)]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_column(spark, vecs):
    a = vecs.where(F.col("vec_id") == 0).select(F.col("embedding").alias("a"))
    pairs = a.crossJoin(vecs.select(F.col("embedding").alias("b"), "vec_id"))
    got = {
        r.vec_id: r.c
        for r in pairs.select("vec_id", cosine(F.col("a"), F.col("b")).alias("c")).collect()
    }
    assert math.isclose(got[0], 1.0, abs_tol=1e-6)
    assert math.isclose(got[1], 1.0, abs_tol=1e-6)
    assert math.isclose(got[3], -1.0, abs_tol=1e-6)
    assert got[2] > 0.98


def test_brute_force_topk_ranks_by_cosine(spark, vecs):
    out = brute_force_topk(vecs, vecs.where(F.col("vec_id") == 0), k=3).toPandas()
    assert out.neighbor_id.tolist()[:2] == [1, 2]
    assert out["rank"].tolist() == [1, 2, 3]
    assert 3 not in out.neighbor_id.tolist()  # opposite vector not in top-3


def test_lsh_signature_scale_invariant(spark, vecs):
    """v and 2v fall in the same half-space for every hyperplane."""
    sig = lsh_signatures(vecs, n_planes=6, dim=8).toPandas().set_index("vec_id").sig
    assert sig[0] == sig[1]


def test_lsh_pairs_verified_by_cosine(spark, vecs):
    pairs = lsh_ann_pairs(vecs, n_planes=4, dim=8, min_cosine=0.9).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in got
    assert all(c >= 0.9 for c in pairs.cosine)


def test_banded_lsh_recall_dominates_single_band(spark):
    """Banded OR-of-signatures must recover strictly more true pairs
    than one wide signature on a corpus of near-duplicate clusters, and
    the Arrow matmul signature path agrees with the Catalyst fold."""
    import numpy as np

    from aroma_spark.operators.similarity import (
        ann_recall,
        brute_force_pairs,
        lsh_signatures,
        lsh_signatures_arrow,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # 3 jittered copies -> true near-dup pairs
            v = b + rng.normal(scale=0.05, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = brute_force_pairs(vecs, 0.9).persist()
    assert truth.count() >= 20
    r1 = ann_recall(vecs, 12, 16, 0.9, truth, n_bands=1)
    r8 = ann_recall(vecs, 6, 16, 0.9, truth, n_bands=8)
    assert r8 > r1
    assert r8 > 0.9
    # arrow path == catalyst path bit-for-bit on this data
    cat = lsh_signatures(vecs, 6, 16, n_bands=2).toPandas()
    arr = lsh_signatures_arrow(vecs, 6, 16, n_bands=2).toPandas()
    key = ["vec_id", "band"]
    cat = cat.sort_values(key).reset_index(drop=True)
    arr = arr.sort_values(key).reset_index(drop=True)
    assert (cat.sig.to_numpy() == arr.sig.to_numpy()).all()
