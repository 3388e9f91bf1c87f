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


@pytest.fixture(scope="module")
def big_vecs(spark):
    """40 vectors in 8 dims: enough that IVF probing prunes real work."""
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_assign_is_argmax_centroid(spark, big_vecs):
    from aroma_spark.operators.similarity import ivf_assign

    got = ivf_assign(big_vecs, n_centroids=4, vec_col="embedding").collect()
    assert len(got) == 40  # every vector assigned exactly once
    vecs_pd = {r.vec_id: np.array(r.embedding) for r in big_vecs.collect()}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    for r in got:
        v = vecs_pd[r.vec_id]
        best = max(
            range(4), key=lambda c: (cos(v, vecs_pd[c]), -c)
        )
        assert r.centroid_id == best, (r.vec_id, r.centroid_id, best)


def test_ivf_full_probe_equals_exact(spark, big_vecs):
    """Probing every list must reproduce the brute-force result."""
    from aroma_spark.operators.similarity import ivf_topk

    q = big_vecs.where(F.col("vec_id") < 3)
    exact = brute_force_topk(big_vecs, q, k=5)
    ivf = ivf_topk(big_vecs, q, k=5, n_centroids=4, n_probe=4)
    e = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in exact.collect()}
    g = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in ivf.collect()}
    assert e == g


def test_ivf_partial_probe_recall(spark, big_vecs):
    from aroma_spark.operators.similarity import ivf_recall

    q = big_vecs.where(F.col("vec_id") < 3)
    r_full = ivf_recall(big_vecs, q, k=5, n_centroids=4, n_probe=4)
    r_one = ivf_recall(big_vecs, q, k=5, n_centroids=4, n_probe=1)
    assert r_full == 1.0
    assert r_one is not None and 0.0 < r_one <= 1.0


def test_kmeans_codebook_deterministic_and_valid(spark, big_vecs):
    from aroma_spark.operators.similarity import ivf_topk, kmeans_codebook

    cb1 = kmeans_codebook(big_vecs, n_centroids=4, sample_size=40).toPandas()
    cb2 = kmeans_codebook(big_vecs, n_centroids=4, sample_size=40).toPandas()
    assert len(cb1) == 4
    # reproducible run-to-run (deterministic hash-sample + numpy Lloyd)
    for a, b in zip(
        cb1.sort_values("centroid_id").cent_vec, cb2.sort_values("centroid_id").cent_vec
    ):
        assert np.allclose(a, b, atol=0, rtol=0)
    # unit-norm centroids (spherical k-means)
    for v in cb1.cent_vec:
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # full probe with the trained codebook still reproduces brute force
    q = big_vecs.where(F.col("vec_id") < 3)
    cb = kmeans_codebook(big_vecs, n_centroids=4, sample_size=40)
    exact = brute_force_topk(big_vecs, q, k=5)
    ivf = ivf_topk(big_vecs, q, k=5, n_probe=4, centroids=cb)
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    g = {(r.query_id, r.rank): r.neighbor_id for r in ivf.collect()}
    assert e == g


def test_kmeans_codebook_beats_placeholder_recall(spark):
    """On clustered data a trained quantizer should recall at least as
    well as the lowest-id placeholder at the same probe budget."""
    from aroma_spark.operators.similarity import (
        brute_force_topk,
        ivf_recall,
        kmeans_codebook,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 12))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(12):
            v = c + rng.normal(scale=0.15, size=12)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = vecs.where(F.col("vec_id") % 12 == 0)
    truth = brute_force_topk(vecs, q, k=5).persist()
    truth.count()
    cb = kmeans_codebook(vecs, n_centroids=8, sample_size=96)
    r_trained = ivf_recall(vecs, q, k=5, n_centroids=8, n_probe=2,
                           centroids=cb, truth=truth)
    r_placeholder = ivf_recall(vecs, q, k=5, n_centroids=8, n_probe=2,
                               truth=truth)
    truth.unpersist()
    assert r_trained is not None and r_placeholder is not None
    assert r_trained >= r_placeholder
    assert r_trained > 0.8


def test_codebook_fixture_matches_spark_path(spark):
    """The oracle's parquet codebook fixture (duckdb sample ->
    train_codebook) must be byte-identical to the live Spark path
    (md5-hash-ordered toPandas sample -> train_codebook): same sample
    rule, same numpy trainer, so ivf_topk_trained's oracle reads the
    exact centroids the engine would train."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from aroma_spark.operators.similarity import kmeans_codebook
    from aroma_spark.sources.transcripts import load_table

    sf = "/root/testdata/sf0.001"
    path = entrymod._ensure_codebook_fixture(sf)
    fixture = spark.read.parquet(path).toPandas().sort_values("centroid_id")
    live = (
        kmeans_codebook(load_table(spark, sf, "embeddings"), n_centroids=16)
        .toPandas()
        .sort_values("centroid_id")
    )
    assert fixture.centroid_id.tolist() == live.centroid_id.tolist()
    for a, b in zip(fixture.cent_vec, live.cent_vec):
        assert np.allclose(a, b, atol=0, rtol=0)


def test_norm_profile_fixed_point(spark):
    from aroma_spark.operators.similarity import norm_profile

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.5], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.00006, 0.0], 1),  # rounds to 1 fx unit at 1e4
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["label"]: r for r in norm_profile(df).collect()}
    # label 0: vec1 -> 5000^2 + (-5000)^2 = 50e6; vec2 -> 1e8
    l0 = out[0]
    assert (l0["n_vecs"], l0["dim"]) == (2, 2)
    assert l0["sum_sq_fx"] == 50_000_000 + 100_000_000
    assert (l0["min_sq_fx"], l0["max_sq_fx"]) == (50_000_000, 100_000_000)
    assert l0["mean_sq_fx"] == 75_000_000.0
    # label 1: 0.00006*1e4 = 0.6 -> floor(0.6+0.5)=1 -> sq 1
    assert out[1]["sum_sq_fx"] == 1


def test_dim_profile_fixed_point(spark):
    from aroma_spark.operators.similarity import dim_profile

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.5], 0),
            (2, [0.25, 1.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["dim"]: r for r in dim_profile(df).collect()}
    d1 = out[1]
    # fx: 5000 and 2500
    assert (d1["n_vecs"], d1["sum_fx"], d1["min_fx"], d1["max_fx"]) == (
        2, 7500, 2500, 5000)
    assert d1["mean_fx"] == 3750.0
    d2 = out[2]
    assert (d2["sum_fx"], d2["min_fx"], d2["max_fx"]) == (
        5000, -5000, 10000)


def test_centroid_alignment_exact(spark):
    from aroma_spark.operators.similarity import centroid_alignment

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.5, 0.5], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = centroid_alignment(df).collect()
    assert len(out) == 1
    r = out[0]
    # label0 sum = (20000, 0); label1 sum = (5000, 5000)
    assert (r["label_a"], r["label_b"], r["n_a"], r["n_b"]) == (0, 1, 2, 1)
    assert r["dot_fx2"] == 20000 * 5000
    assert r["mean_align"] == round(20000 * 5000 / 2, 6)


def test_sparsity_by_label(spark):
    from aroma_spark.operators.similarity import sparsity_by_label

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.5, 0.00004], 0),   # 2 zeros at 1e4 scale
            (2, [1.0, 1.0, 1.0], 0),
            (3, [0.0, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["label"]: r for r in sparsity_by_label(df).collect()}
    l0 = out[0]
    assert (l0["n_vecs"], l0["n_components"], l0["n_zero"]) == (2, 6, 2)
    assert l0["sparsity"] == round(2 / 6, 6)
    assert out[1]["sparsity"] == 1.0


def test_norm_quartiles_by_label(spark):
    from aroma_spark.operators.similarity import norm_quartiles_by_label

    # sq_fx values: 1e8 * [1, 4, 9, 16] (vectors [1],[2],[3],[4] @ 1e4)
    df = spark.createDataFrame(
        [(i, [float(i)], 0) for i in range(1, 5)],
        "vec_id long, embedding array<float>, label int",
    )
    r = norm_quartiles_by_label(df).collect()[0]
    assert r["n_vecs"] == 4
    # ranks: p25 -> 1, p50 -> 2, p75 -> 3
    assert (r["p25_sq_fx"], r["p50_sq_fx"], r["p75_sq_fx"]) == (
        100_000_000, 400_000_000, 900_000_000)


# --- r6 batch 3: task-local top-k pruning (slack-filtered) ---------------


def test_topk_keep_mask_superset_and_slack():
    """The keep-mask must retain every row the final rounded-DESC window
    could pick: the top-k by raw score, anything within the rounding
    slack of the k-th best, and every non-finite score."""
    from aroma_spark.operators.similarity import _topk_keep_mask

    g = np.array([1, 1, 1, 1, 2, 2, 2])
    s = np.array([0.9, 0.9 - 1e-6, 0.5, 0.1, np.nan, 0.3, 0.2])
    m = _topk_keep_mask(g, s, 1)
    # group 1: 0.9 kept, 0.9-1e-6 within slack (could round-tie), rest out
    assert m.tolist() == [True, True, False, False, True, True, False]
    # group of size <= k keeps everything
    assert _topk_keep_mask(np.array([7]), np.array([0.0]), 3).tolist() == [True]
    # randomized superset property vs exact raw top-k
    rng = np.random.default_rng(11)
    g = rng.integers(0, 40, 4000)
    s = rng.random(4000)
    m = _topk_keep_mask(g, s, 5)
    for grp in np.unique(g):
        sel = s[g == grp]
        top5 = set(np.sort(sel)[-5:])
        assert top5 <= set(s[(g == grp) & m])


def test_brute_force_topk_prune_matches_reference(spark):
    """The batch-local pruned emission must reproduce the full-emission
    result exactly, including engineered rounding near-ties where the
    raw order and the rounded order disagree."""
    rng = np.random.default_rng(23)
    base = rng.normal(size=16)
    rows = []
    for i in range(60):
        # a cloud of correlated vectors so many cosines land close
        rows.append(
            (int(i), [float(x) for x in base + rng.normal(size=16) * (0.01 + 0.02 * (i % 7))])
        )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = corpus.where(F.col("vec_id") < 4)
    got = brute_force_topk(corpus, q, k=3).collect()
    vec = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in corpus.collect()}

    def cos6(a, b):
        acc = 0.0
        for d in range(len(a)):
            acc += a[d] * b[d]
        na = math.sqrt(sum(a[d] * a[d] for d in range(len(a))))
        nb = math.sqrt(sum(b[d] * b[d] for d in range(len(b))))
        return acc / (na * nb)

    for qid in range(4):
        scored = sorted(
            (
                (round(cos6(vec[qid], vec[nid]), 6), -nid, nid)
                for nid in vec
                if nid != qid
            ),
            reverse=True,
        )
        want = [(nid, c) for (c, _negid, nid) in scored[:3]]
        have = sorted(
            ((r.rank, r.neighbor_id, r.cosine) for r in got if r.query_id == qid)
        )
        assert [(n, c) for (_rk, n, c) in have] == want, (qid, have, want)


def test_score_pairs_prune_topk_equals_unpruned(spark):
    """prune_topk is a row-count reduction only: after the caller's
    top-k-per-group cut, pruned and unpruned paths must agree."""
    from pyspark.sql import Window

    from aroma_spark.operators.similarity import score_pairs_exact

    rng = np.random.default_rng(5)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = (
        vecs.select(F.col("vec_id").alias("qid"))
        .where(F.col("qid") < 3)
        .crossJoin(vecs.select(F.col("vec_id").alias("nid")))
        .where(F.col("qid") != F.col("nid"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))

    def topk(df):
        return (
            df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 4)
            .select("qid", "nid", "cosine", "rk")
        )

    left = vecs.select("vec_id", "embedding")
    a = topk(
        score_pairs_exact(pairs, left, left, "qid", "nid", prune_topk=4)
    ).collect()
    b = topk(score_pairs_exact(pairs, left, left, "qid", "nid")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
