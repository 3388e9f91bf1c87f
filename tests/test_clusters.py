"""Connected components / dedup survivors vs a union-find oracle."""

from __future__ import annotations

import pytest

from aroma_spark.operators.clusters import connected_components, dedup_survivors


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


EDGES = [
    (1, 2), (2, 3),          # chain -> {1,2,3}
    (10, 11),                # pair -> {10,11}
    (20, 21), (21, 22), (20, 22),  # triangle -> {20,21,22}
    (30, 31), (32, 33), (31, 32),  # two pairs bridged -> {30..33}
    (40, 41), (41, 40),      # duplicate edge both ways
]


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(EDGES, "doc_a long, doc_b long")


def test_connected_components(spark, pairs):
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == _uf_components(EDGES)


def test_long_chain_converges(spark):
    # diameter 9: exercises multi-round propagation
    chain = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(10)}


def test_dedup_survivors(spark, pairs):
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 30, 31, 32, 33, 40, 41, 99]],
        "doc_id long",
    )
    kept = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    # cluster minima + the unpaired doc survive
    assert kept == {1, 10, 20, 30, 40, 99}


def test_non_convergence_raises(spark):
    # a 12-node path graph needs 11 propagation rounds; a budget of 3
    # must fail loudly instead of returning stale labels
    import pytest
    from aroma_spark.operators.clusters import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=3)


def test_zero_iteration_budget_rejected(spark, pairs):
    # max_iterations=0 must not silently return identity labels
    with pytest.raises(ValueError, match="max_iterations"):
        connected_components(pairs, max_iterations=0)
    with pytest.raises(ValueError, match="max_iterations"):
        connected_components(pairs, max_iterations=-2)


def test_dedup_survivors_keep_best_string_ids(spark):
    # string doc ids: the struct-min tie-break must order them correctly
    docs = spark.createDataFrame(
        [("a", 0.2), ("b", 0.9), ("c", 0.9), ("z", 0.1)],
        "doc_id string, quality double",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "doc_a string, doc_b string"
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_survivors(
            docs, pairs, keep="best", quality_col="quality"
        ).collect()
    )
    assert got == ["b", "z"]


def test_dedup_survivors_keep_best(spark):
    from aroma_spark.operators.clusters import dedup_survivors

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    # cluster {1,2,3}: best quality 0.9 tie between 2 and 3 -> lowest id 2
    # cluster {4}: unpaired via pairs? 4 pairs with nothing -> survives
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = sorted(
        r["doc_id"]
        for r in dedup_survivors(
            docs, pairs, keep="best", quality_col="quality"
        ).collect()
    )
    assert got == [2, 4, 9]
    # min_id policy keeps 1 instead
    got_min = sorted(
        r["doc_id"] for r in dedup_survivors(docs, pairs).collect()
    )
    assert got_min == [1, 4, 9]


def test_embedding_dup_clusters_composition(spark):
    """lsh_ann_pairs -> connected_components: identical vectors land in
    one component; the antipodal vector shares no signature bucket (all
    plane signs flip) and emits no pairs, so it is absent from the
    label frame (unpaired = trivially its own cluster downstream)."""
    from aroma_spark.operators.clusters import connected_components
    from aroma_spark.operators.similarity import lsh_ann_pairs

    base = [1.0, 0.25, -0.5, 2.0]
    rows = [(0, base), (1, list(base)), (2, list(base)),
            (3, [-v for v in base])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = lsh_ann_pairs(emb, n_planes=4, dim=4, min_cosine=0.9)
    comp = connected_components(
        pairs, "id_a", "id_b", id_out="vec_id", component_out="component"
    )
    got = {r.vec_id: r.component for r in comp.collect()}
    assert got == {0: 0, 1: 0, 2: 0}
