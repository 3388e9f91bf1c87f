"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline — a broadcast of the
  (small) query set against the full corpus; dot products computed
  JVM-side with ``aggregate``/``zip_with`` (sequential double fold, so
  the DuckDB oracle's list fold matches bit-for-bit);
- LSH-bucketed ANN: the scale path — random-hyperplane signatures
  (deterministic, md5-seeded) bucket the corpus; candidates only meet
  inside a bucket join. Recall is tunable by bands/bits.

At 100 TB the broadcast side must stay small (queries), never the
corpus; the LSH path shuffles on the signature key only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in float64 (portable order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries: (query_id, embedding). The query frame is broadcast;
    ranking uses the 6-dp-rounded score with an id tie-break so results
    are deterministic across engines and partitionings.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes.

    Public-knowledge construction (random projection LSH, Charikar
    2002); md5 gives portability and seed stability without RNG state.
    """
    import hashlib

    vals: list[float] = []
    ctr = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane:{plane_idx}:{ctr}".encode()).digest()
        for byte in h:
            vals.append(float(byte) - 127.5)
            if len(vals) == dim:
                break
        ctr += 1
    return vals


def lsh_signatures(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig): n_planes sign bits from fixed random hyperplanes."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + bit.cast("long") * F.lit(2**p).cast("long")
    return vectors.select(F.col(id_col).alias(id_col), sig.alias("sig"))


def lsh_ann_pairs(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate pairs from identical LSH signatures, verified by exact
    cosine — the bucketed near-dup path for embedding columns."""
    sigs = lsh_signatures(vectors, n_planes, dim, id_col, vec_col)
    v = vectors.select(F.col(id_col), F.col(vec_col))
    tagged = v.join(sigs, id_col)
    a = tagged.select(
        F.col("sig"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = tagged.select(
        F.col("sig"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    return (
        a.join(b, "sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )
