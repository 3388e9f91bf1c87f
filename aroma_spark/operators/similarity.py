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


# --- exact Arrow scoring (r6) -------------------------------------------
#
# The Catalyst fold above is a CodegenFallback higher-order function:
# every element is an interpreted lambda call (measured ~14 us per
# 64-dim cosine — the dominant cost of every ANN query). The Arrow
# implementations below are BIT-IDENTICAL to the fold: float32 ->
# float64 cast per element, products accumulated SEQUENTIALLY over
# dimensions with a 0.0 init (`acc += A[:, d] * B[:, d]` is the same
# left-fold order, vectorized across rows), norms sqrt'd and multiplied
# the same way (IEEE ops are correctly rounded; multiplication is
# commutative bitwise). Verified: 0 mismatching rounded cosines on the
# sf1.0 cross product, and every oracle-checked ANN query stays
# hash-green. Rounding stays in Catalyst (F.round's HALF_UP-on-
# shortest-decimal semantics are not numpy's), so Python emits raw
# doubles only.

# Corpus-in-closure gate for pair scoring: below this many vectors the
# (id -> vector) table ships inside the task closure (the
# brute_force_pairs discipline) and the shuffle carries ONLY skinny
# (id_a, id_b) pairs — guide §8 "move decisions on lightweight
# proxies". Above it, scoring falls back to the join path with
# PRE-COMPUTED per-vector norms (one fold per vector instead of one
# per pair). 250k x 64 floats ~= 128 MB per executor — the documented
# broadcast budget.
MAX_CLOSURE_VECTORS = 250_000

# Task-local top-k pre-filter slack (r6 batch 3). The global top-k /
# argmax windows downstream rank by the 6-dp-ROUNDED cosine with an id
# tie-break, while the Arrow tasks see raw doubles. A raw gap wider
# than 1e-6 can never invert under rounding (round moves a value by at
# most 5e-7 + one ulp each side), so keeping every row within 1.5e-6 of
# the task-local k-th best raw score is a strict superset of the rows
# the final window can select — the filter changes row COUNTS crossing
# the shuffle (|batch| -> ~k per group), never the query result. Rows
# with non-finite scores are always kept: Spark orders NaN ABOVE every
# double under DESC, so they are potential winners the threshold math
# cannot see.
TOPK_PRUNE_SLACK = 1.5e-6


def _topk_keep_mask(groups, scores, k, slack=TOPK_PRUNE_SLACK):
    """Boolean keep-mask: per group, every row within ``slack`` of the
    group's k-th best finite score (all rows when the group has <= k),
    plus every non-finite row. Groups bound the Python loop — callers
    pass the query id, so iterations per batch <= |query set|."""
    import numpy as np

    finite = np.isfinite(scores)
    keep = ~finite
    idx = np.flatnonzero(finite)
    if not len(idx):
        return keep
    g = np.asarray(groups)[idx]
    s = scores[idx]
    order = np.lexsort((-s, g))
    gs, ss = g[order], s[order]
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    ends = np.r_[starts[1:], len(gs)]
    th = np.full(len(gs), -np.inf)
    for a, b in zip(starts, ends):
        if b - a > k:
            th[a:b] = ss[a + k - 1] - slack
    keep[idx[order]] = ss >= th
    return keep


def _seq_rowdot(A, B):
    """Per-row dot in the fold's exact order: sequential over dims,
    vectorized over rows, 0.0 init."""
    import numpy as np

    acc = np.zeros(len(A))
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin a sub-parallel scan before an Arrow corpus pass —
    a single-file corpus otherwise runs the whole numpy work in one
    task (r6; same guard as dedup._spread_small_input, no-op at real
    input sizes)."""
    from aroma_spark.operators.dedup import _spread_small_input

    return _spread_small_input(df)


def _vec_table(df: DataFrame, id_col: str, vec_col: str):
    """(ids array, float64 matrix, fold-order norms) from a SMALL frame
    (queries / codebooks / gate-checked corpora) — the closure payload."""
    import numpy as np

    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    M = (
        np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        if len(pdf)
        else np.zeros((0, 1))
    )
    norms = np.sqrt(_seq_rowdot(M, M))
    return ids, M, norms


def score_pairs_exact(
    pairs: DataFrame,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    out_col: str = "cosine",
    max_closure_rows: int = MAX_CLOSURE_VECTORS,
    prune_topk: int | None = None,
) -> DataFrame:
    """Exact (fold-order) cosine for every (left_key, right_key) pair.

    ``left``/``right`` are two-column (id, vec) frames; ``pairs``
    references them via ``left_key``/``right_key``. Small corpora
    (measured row count <= ``max_closure_rows``): the two vector
    tables ride the task closure and only the skinny pair ids cross
    the Python boundary — one gather + one vectorized sequential-dim
    fold per batch. Larger corpora: two hash joins attach the vectors
    WITH per-vector norms precomputed before the join, so each pair
    pays one fold, not three. Both paths emit the bit-identical raw
    double; rounding is applied here in Catalyst.

    ``prune_topk=k`` (closure path only): the caller promises to keep
    only the top-k rows per ``left_key`` group downstream (by rounded
    score DESC, id ASC — the ANN window contract), so each batch emits
    only its local top-k (+ rounding slack, see TOPK_PRUNE_SLACK) per
    group — a pure row-count reduction into the shuffle, provably
    containing every row the final window can pick. The join path
    ignores it (same result either way; the window dedups).
    """
    l_id, l_vec = left.columns[0], left.columns[1]
    r_id, r_vec = right.columns[0], right.columns[1]
    n_left = left.count()
    n_right = right.count()
    if max(n_left, n_right) <= max_closure_rows:
        import numpy as np  # noqa: F401 (np used via _seq_rowdot path)
        import pandas as pd

        lids, LM, lnorm = _vec_table(left, l_id, l_vec)
        rids, RM, rnorm = _vec_table(right, r_id, r_vec)
        lix = pd.Index(lids)
        rix = pd.Index(rids)

        def fn(it):
            for pdf in it:
                if not len(pdf):
                    continue
                li = lix.get_indexer(pdf[left_key].to_numpy())
                ri = rix.get_indexer(pdf[right_key].to_numpy())
                dd = _seq_rowdot(LM[li], RM[ri])
                out = pdf.copy()
                out["__cos_raw"] = dd / (lnorm[li] * rnorm[ri])
                if prune_topk is not None:
                    kp = _topk_keep_mask(
                        out[left_key].to_numpy(),
                        out["__cos_raw"].to_numpy(),
                        prune_topk,
                    )
                    out = out[kp]
                yield out

        # every pair column passes through (they are skinny by
        # contract); the heavy vectors never leave the closure
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema
        )
        scored = pairs.mapInPandas(fn, f"{schema}, __cos_raw double")
        return scored.select(
            *pairs.columns, F.round(F.col("__cos_raw"), 6).alias(out_col)
        )
    va = left.select(
        F.col(l_id).alias(left_key),
        F.col(l_vec).alias("__va"),
        _norm(F.col(l_vec)).alias("__na"),
    )
    vb = right.select(
        F.col(r_id).alias(right_key),
        F.col(r_vec).alias("__vb"),
        _norm(F.col(r_vec)).alias("__nb"),
    )
    return (
        pairs.join(va, left_key)
        .join(vb, right_key)
        .select(
            *pairs.columns,
            F.round(
                _dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias(out_col),
        )
    )


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

    # r6: the query set (small by contract — it was broadcast before)
    # rides the task closure; the corpus STREAMS through one Arrow pass
    # that scores every query against each batch with the exact
    # fold-order arithmetic (see the header note) — replacing the
    # interpreted per-pair Catalyst fold, the dominant ANN cost.
    import numpy as np
    import pandas as pd

    qids, QM, qnorm = _vec_table(queries, id_col, vec_col)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nid = pdf[id_col].to_numpy()
            cn = np.sqrt(_seq_rowdot(C, C))
            outs = []
            for j in range(len(qids)):
                dd = np.zeros(len(C))
                for d in range(C.shape[1]):
                    dd += QM[j, d] * C[:, d]
                mask = nid != qids[j]
                cos = (dd / (qnorm[j] * cn))[mask]
                # r6 batch 3: emit only the batch-local top-k (+slack)
                # per query — the global top-k window downstream cannot
                # select a row that lost to k rows of its own batch
                # (see TOPK_PRUNE_SLACK). Shuffle rows drop from
                # |Q| x |corpus| to ~|Q| x k x n_batches.
                kp = _topk_keep_mask(np.zeros(len(cos), dtype=np.int8), cos, k)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(int(kp.sum()), qids[j]),
                            "neighbor_id": nid[mask][kp],
                            "__cos_raw": cos[kp],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = (
        _spread(vectors.select(id_col, vec_col))
        .mapInPandas(fn, "query_id long, neighbor_id long, __cos_raw double")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__cos_raw"), 6).alias("cosine"),
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


def _centroids(
    vectors: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_centroids`` lowest-id
    vectors. A production IVF trains centroids by k-means over a sample
    (IVFADC, Jégou et al. 2011); a fixed pick keeps the quantizer
    bit-reproducible across engines while exercising the identical
    assign/probe dataflow. Swap this function for a trained codebook
    without touching the rest of the index."""
    return vectors.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
    )


def train_codebook(X, n_centroids: int, max_iters: int = 64):
    """Spherical k-means over a bounded in-memory sample — pure
    deterministic numpy, shared by the Spark path
    (:func:`kmeans_codebook`) and the fixture writer the DuckDB oracle
    reads, so both engines see byte-identical centroids.

    Quality levers (round-3 verdict item 3 — the old first-k-in-hash-
    order init with 8 fixed Lloyd rounds LOST to the placeholder
    quantizer at probe4):

    - **farthest-point init** (k-means++ without RNG): c0 = first
      sample vector, each next centroid = the sample point with the
      smallest max-cosine to the chosen set (ties -> lowest index via
      argmin). Spreads the codebook over the sphere instead of seeding
      k near-collinear vectors from the hash head.
    - **Lloyd to convergence**: iterate until the assignment vector is
      unchanged (or ``max_iters``), not a fixed small round count.
    - **empty-list repair**: an empty cluster is re-seeded with the
      point farthest from its current centroid among the largest
      cluster's members, so every inverted list ends non-empty.

    Returns the (k, dim) float64 unit-norm centroid matrix.
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(X))
    # farthest-point init
    C = np.empty((k, X.shape[1]))
    C[0] = X[0]
    best = X @ C[0]  # max cosine to chosen set, per sample point
    for j in range(1, k):
        nxt = int(np.argmin(best))
        C[j] = X[nxt]
        best = np.maximum(best, X @ C[j])
    assign = np.full(len(X), -1)
    for _ in range(max_iters):
        new_assign = np.argmax(X @ C.T, axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        counts = np.bincount(assign, minlength=k)
        for j in range(k):
            if counts[j]:
                C[j] = X[assign == j].sum(axis=0)
            else:
                # re-seed from the largest cluster's worst-fit member
                big = int(np.argmax(counts))
                members = np.flatnonzero(assign == big)
                worst = members[int(np.argmin(X[members] @ C[big]))]
                C[j] = X[worst]
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def kmeans_codebook(
    vectors: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 8192,
    max_iters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained IVF codebook: spherical k-means on a deterministic
    hash-sample — (centroid_id, cent_vec), drop-in for the placeholder
    quantizer via the ``centroids=`` parameter of :func:`ivf_assign` /
    :func:`ivf_topk`.

    Scale shape: the sample is picked by md5-hash order (sort+limit
    collapses to TakeOrdered — no full sort), so it is a uniform,
    engine-portable pseudo-random subset bounded at ``sample_size``
    rows; Lloyd runs on the driver in numpy over that bounded sample
    (standard IVF practice — IVFADC, Jégou et al. 2011, trains on a
    sample, not the corpus). Training = :func:`train_codebook`
    (farthest-point init, converge-to-stable-assignment, empty-list
    repair) — deterministic numpy, reproducible run-to-run and
    byte-identical to the fixture the DuckDB oracle reads."""
    import numpy as np

    sample = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.concat(F.lit("kmeans:"), F.col(id_col).cast("string"))))
        .limit(sample_size)
        .toPandas()
    )
    X = np.stack(sample[vec_col].to_numpy())
    C = train_codebook(X, n_centroids, max_iters)
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(int(j), [float(v) for v in C[j]]) for j in range(len(C))],
        "centroid_id int, cent_vec array<double>",
    )


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF list assignment: each vector goes to its max-cosine centroid
    (ties broken by centroid id). One broadcast of the (tiny) codebook +
    one pass over the corpus — the inverted-file build step. At 100 TB
    the output is the thing to persist, bucketed by ``centroid_id``, so
    probes become partition-pruned scans.

    ``centroids``: optional trained codebook (centroid_id, cent_vec)
    from :func:`kmeans_codebook`; default is the bit-reproducible
    placeholder quantizer (lowest-id vectors) the DuckDB oracle mirrors."""
    from pyspark.sql import Window

    cents = (
        centroids.select("centroid_id", "cent_vec")
        if centroids is not None
        else _centroids(vectors, n_centroids, id_col, vec_col)
    )
    # r6: the (tiny, broadcast-sized) codebook rides the task closure;
    # one Arrow pass over the corpus scores all centroids per batch in
    # exact fold order — same values as the old crossJoin + interpreted
    # Catalyst fold, ~4x less per-task work (see module header note)
    import numpy as np
    import pandas as pd

    cids, CM, cnorm = _vec_table(cents, "centroid_id", "cent_vec")

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vid = pdf[id_col].to_numpy()
            vn = np.sqrt(_seq_rowdot(V, V))
            cols = []
            for j in range(len(cids)):
                dd = np.zeros(len(V))
                for d in range(V.shape[1]):
                    dd += V[:, d] * CM[j, d]
                cols.append(dd / (vn * cnorm[j]))
            if not cols:
                continue
            # r6 batch 3: per-row argmax with the rounding slack — emit
            # only centroids within TOPK_PRUNE_SLACK of the row max
            # (plus non-finite scores, which Spark's DESC sort ranks
            # first), so the argmax window downstream sees ~1 row per
            # vector instead of n_centroids. A raw gap > 1e-6 cannot
            # invert under 6-dp rounding, so the winner is always kept.
            COS = np.column_stack(cols)  # (n, k)
            rowmax = np.max(COS, axis=1)  # NaN-propagating, see below
            keep = ~np.isfinite(COS) | (
                COS >= (rowmax - TOPK_PRUNE_SLACK)[:, None]
            )
            ri, cj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    id_col: vid[ri],
                    "centroid_id": np.asarray(cids)[cj],
                    "__cos_raw": COS[ri, cj],
                }
            )

    scored = (
        _spread(vectors.select(id_col, vec_col))
        .mapInPandas(fn, f"{id_col} long, centroid_id long, __cos_raw double")
        .select(
            id_col,
            "centroid_id",
            F.round(F.col("__cos_raw"), 6).alias("cent_cosine"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cent_cosine"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "centroid_id", "cent_cosine")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k ANN: probe the ``n_probe`` nearest inverted lists per
    query, score candidates exactly, keep the top ``k``.

    Scale shape: the corpus is touched once to build the assignment
    (reusable across queries); the candidate join shuffles only
    (query x probed-list) rows — cost scales with n_probe/n_centroids
    of the corpus, not all of it. Recall < 1 by design; measure with
    :func:`ivf_recall` and tune (n_centroids, n_probe)."""
    from pyspark.sql import Window

    assign = ivf_assign(vectors, n_centroids, id_col, vec_col, centroids).select(
        F.col(id_col).alias("neighbor_id"), "centroid_id"
    )
    cents = (
        centroids.select("centroid_id", "cent_vec")
        if centroids is not None
        else _centroids(vectors, n_centroids, id_col, vec_col)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("q_cosine"), F.asc("centroid_id")
    )
    probed = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "q_vec",
            "centroid_id",
            F.round(cosine(F.col("q_vec"), F.col("cent_vec")), 6).alias(
                "q_cosine"
            ),
        )
        .withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    # r6: the candidate set stays SKINNY (query_id, neighbor_id) through
    # the probe join — q_vec no longer rides every candidate row — and
    # exact scoring happens in score_pairs_exact (closure gather under
    # the gate, norm-precomputed join above it; bit-identical either way)
    # r6 batch 3: probed is |queries| x n_probe rows — broadcast it so
    # the assignment stream is joined map-side (no hash exchange of the
    # |corpus|-row assign frame on centroid_id; the planner cannot see
    # probed's size through the window).
    cand = (
        assign.join(F.broadcast(probed), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    scored = score_pairs_exact(
        cand,
        queries.select(id_col, vec_col),
        vectors.select(id_col, vec_col),
        "query_id",
        "neighbor_id",
        out_col="cosine",
        # the window below keeps exactly top-k per query, so each Arrow
        # batch may pre-drop candidates that lost to k rows of its own
        # batch (r6 batch 3; see TOPK_PRUNE_SLACK)
        prune_topk=k,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    truth: DataFrame | None = None,
) -> float | None:
    """Fraction of exact top-k neighbor pairs the IVF probe recovers.

    Pass a persisted ``truth`` (from :func:`brute_force_topk`) when
    sweeping codebooks/probe settings so the exact pass runs once."""
    if truth is None:
        truth = brute_force_topk(vectors, queries, k)
    t = truth.select("query_id", "neighbor_id")
    n_truth = t.count()
    if not n_truth:
        return None
    got = ivf_topk(vectors, queries, k, n_centroids, n_probe, centroids=centroids).select(
        "query_id", "neighbor_id"
    )
    return t.join(got, ["query_id", "neighbor_id"], "left_semi").count() / n_truth


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
    n_bands: int = 1,
) -> DataFrame:
    """(id, band, sig): per band, ``n_planes`` sign bits from fixed
    random hyperplanes (band b uses planes b*n_planes..b*n_planes+n-1).

    Banding is the standard recall lever (Charikar 2002 / LSH banding):
    a pair is a candidate if ANY band's signature matches — recall
    1-(1-s^b)^L for bit-agreement probability s. One band keeps the
    legacy behavior."""

    def band_sig(band: int) -> F.Column:
        sig = F.lit(0).cast("long")
        for i in range(n_planes):
            plane = F.array(
                *[F.lit(v) for v in _hyperplane(dim, band * n_planes + i)]
            )
            bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(
                F.lit(0)
            )
            sig = sig + bit.cast("long") * F.lit(2**i).cast("long")
        return sig

    return vectors.select(
        F.col(id_col),
        F.posexplode(F.array(*[band_sig(b) for b in range(n_bands)])).alias(
            "band", "sig"
        ),
    )


def lsh_signatures_arrow(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
) -> DataFrame:
    """Arrow-vectorized banded signatures: one (batch x L*b) matmul per
    Arrow batch instead of L*b Catalyst fold expressions.

    Same hyperplanes as :func:`lsh_signatures`; sign bits may differ
    from the Catalyst path only where a dot product is within float
    round-off of zero (matmul reassociates the sum) — immaterial for
    bucketing, so this is the path for large band counts, while the
    Catalyst path stays bit-reproducible for the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [_hyperplane(dim, i) for i in range(n_bands * n_planes)]
    ).T  # (dim, L*b)
    weights = (2 ** np.arange(n_planes)).astype(np.int64)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (V @ planes) >= 0  # (n, L*b)
            sigs = (
                bits.reshape(len(V), n_bands, n_planes) * weights
            ).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int32), len(V)
                    ),
                    "sig": sigs.ravel(),
                }
            )

    return _spread(vectors.select(id_col, vec_col)).mapInPandas(
        fn, f"{id_col} long, band int, sig long"
    )


def brute_force_pairs(
    vectors: DataFrame,
    min_cosine: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ground truth — quadratic work; recall
    measurement and ground-truth only.

    Broadcast-corpus shape: the normalized corpus matrix rides into an
    Arrow ``mapInPandas`` closure; each task matmuls its block of rows
    against the whole matrix (vectorized, one matmul per batch). Memory
    = corpus matrix per executor — correct while the measured corpus is
    dimension-table-sized, which is the only sanctioned use."""
    import numpy as np
    import pandas as pd

    corpus = vectors.select(id_col, vec_col).toPandas()
    ids = corpus[id_col].to_numpy()
    M = np.stack(corpus[vec_col].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            S = V @ M.T
            bid = pdf[id_col].to_numpy()
            # pre-mask on the RAW score with a half-ulp-of-rounding
            # slack, round only the surviving entries (r6: np.round over
            # the full |batch| x |corpus| matrix was ~2/3 of the pass),
            # then re-apply the threshold on the rounded value — same
            # output set: raw >= t - 5.0001e-7 is necessary for
            # round6(raw) >= t
            ii, jj = np.nonzero(
                (S >= min_cosine - 5.0001e-7)
                & (bid[:, None] < ids[None, :])
            )
            cos = np.round(S[ii, jj], 6)
            keep = cos >= min_cosine
            yield pd.DataFrame(
                {
                    "id_a": bid[ii][keep],
                    "id_b": ids[jj][keep],
                    "cosine": cos[keep],
                }
            )

    return _spread(vectors.select(id_col, vec_col)).mapInPandas(
        fn, "id_a long, id_b long, cosine double"
    )


def ann_recall(
    vectors: DataFrame,
    n_planes: int,
    dim: int = 64,
    min_cosine: float = 0.5,
    truth: DataFrame | None = None,
    n_bands: int = 1,
) -> float | None:
    """Recall of the LSH-bucketed pair search against exact ground truth.

    Pass a persisted ``truth`` (from :func:`brute_force_pairs`) when
    sweeping several (n_bands, n_planes) settings so the quadratic pass
    runs once.
    """
    if truth is None:
        truth = brute_force_pairs(vectors, min_cosine)
    t = truth.select("id_a", "id_b")
    n_truth = t.count()
    if not n_truth:
        return None
    got = lsh_ann_pairs(
        vectors, n_planes, dim, min_cosine, n_bands=n_bands
    ).select("id_a", "id_b")
    hits = t.join(got, ["id_a", "id_b"], "left_semi").count()
    return hits / n_truth


def _bucket_candidates_closure(
    sigs: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    min_cosine: float,
) -> DataFrame:
    """(id_a, id_b) candidates whose APPROXIMATE bucket-matmul cosine
    clears ``min_cosine`` minus a strict error slack — closure-gated
    helper for :func:`lsh_ann_pairs` (see its comment for the exactness
    argument; survivors are always re-scored exactly).

    One ``applyInPandas`` over (band, sig) buckets: gather the bucket's
    normalized rows from the closure matrix, matmul in row chunks
    (bounded temporaries), keep the upper triangle above the slacked
    threshold. Work is sum of bucket^2 BLAS flops — the LSH banding
    quadratic — instead of materializing every bucket pair as a row.
    """
    import numpy as np
    import pandas as pd

    ids, M, norms = _vec_table(vectors, id_col, vec_col)
    with np.errstate(divide="ignore", invalid="ignore"):
        Mn = M / norms[:, None]
    ix = pd.Index(ids)
    # round-half-up boundary (5.0001e-7) + matmul reassociation bound
    thresh = min_cosine - 1.5e-6

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        vid = pdf[id_col].to_numpy()
        n = len(vid)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        sub = Mn[ix.get_indexer(vid)]
        chunk = max(1, 8_000_000 // n)
        outs_a, outs_b = [], []
        for s in range(0, n, chunk):
            S = sub[s : s + chunk] @ sub.T
            ii, jj = np.nonzero(
                (S >= thresh) & (vid[s : s + chunk, None] < vid[None, :])
            )
            outs_a.append(vid[s + ii])
            outs_b.append(vid[jj])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(outs_a),
                "id_b": np.concatenate(outs_b),
            }
        )

    return sigs.groupBy("band", "sig").applyInPandas(
        fn, "id_a long, id_b long"
    )


def lsh_ann_pairs(
    vectors: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 1,
) -> DataFrame:
    """Candidate pairs from identical LSH signatures in ANY band,
    verified by exact cosine — the bucketed near-dup path for embedding
    columns. Candidates only ever meet inside a (band, sig) bucket join;
    the distinct() dedups pairs that collide in several bands before the
    (more expensive) cosine verification.

    Single-band signatures use the Catalyst fold (bit-reproducible vs
    the DuckDB oracle); multi-band uses the Arrow matmul path (the
    per-band Catalyst expression count would explode codegen)."""
    if n_bands > 1:
        sigs = lsh_signatures_arrow(
            vectors, n_planes, dim, id_col, vec_col, n_bands
        )
    else:
        sigs = lsh_signatures(vectors, n_planes, dim, id_col, vec_col, n_bands)
    v2 = vectors.select(id_col, vec_col)
    if vectors.count() <= MAX_CLOSURE_VECTORS:
        # r6 closure path: candidate generation AND approximate
        # pre-filtering happen per (band, sig) bucket in one Arrow pass
        # — each bucket is gathered from the closure matrix and scored
        # as a (chunked) BLAS matmul, so the 10^8-row candidate
        # self-join never materializes (measured 108 s -> the pair join
        # + per-pair gather moved ~100 GB of vector bytes at sf1.0
        # b8p4). The matmul is a PRE-FILTER only: its threshold carries
        # a 1.5e-6 slack that strictly covers reassociation error
        # (<=1e-12 for unit 64-dim vectors) plus the round-half-up
        # boundary, and every surviving pair is re-scored by the exact
        # fold-order arithmetic below — the output set is decided
        # solely by round6(exact_cos) >= min_cosine, as before.
        cand = _bucket_candidates_closure(
            sigs, vectors, id_col, vec_col, min_cosine
        )
        return (
            score_pairs_exact(cand, v2, v2, "id_a", "id_b")
            .where(F.col("cosine") >= min_cosine)
            .distinct()
        )
    # above the gate: dedup candidates FIRST so the vector-attach joins
    # (norm-precomputed — one fold per pair, not three) never see
    # duplicate pairs
    a = sigs.select("band", "sig", F.col(id_col).alias("id_a"))
    b = sigs.select("band", "sig", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return score_pairs_exact(cand, v2, v2, "id_a", "id_b").where(
        F.col("cosine") >= min_cosine
    )


def pq_assign(
    vectors: DataFrame,
    m: int = 4,
    sub_dim: int = 16,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011, the PQ half
    of IVFADC): split each vector into ``m`` contiguous ``sub_dim``
    subspaces and record, per subspace, the max-cosine sub-centroid —
    the 8-bit-code-per-subspace compression that makes billion-vector
    ANN memory-resident (m codes replace m*sub_dim floats).

    The codebook is the deterministic placeholder quantizer of
    :func:`_centroids` (lowest-``k`` ids, sliced per subspace) so both
    engines share it bit-for-bit — swap in a trained codebook exactly
    as :func:`ivf_assign` does. Ties break by centroid id; cosines
    round to 6 (the house cross-engine float discipline).

    Scale shape: ONE pass over the corpus — vectors explode to
    (vec_id, subspace, subvec) rows (m-fold, map-local), the m*k
    sub-centroid table broadcasts, and one window per (vec_id,
    subspace) picks the code. Nothing shuffles but the tiny argmax
    exchange.

    Emits ``vec_id, subspace, code, sub_cosine`` — m rows per vector.
    """
    from pyspark.sql import Window

    cents = vectors.where(F.col(id_col) < k).select(
        F.col(id_col).alias("code"), F.col(vec_col).alias("cv")
    )
    def _explode_subs(df, col, out):
        return df.select(
            *[c for c in df.columns if c != col],
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("long").alias("subspace"),
                            F.slice(F.col(col), s * sub_dim + 1, sub_dim).alias(out),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("p"),
        ).select(
            *[c for c in df.columns if c != col],
            F.col("p.subspace").alias("subspace"),
            F.col(f"p.{out}").alias(out),
        )

    sub_vecs = _explode_subs(vectors.select(id_col, vec_col), vec_col, "sv")
    sub_cents = _explode_subs(cents, "cv", "csv")
    scored = sub_vecs.join(
        F.broadcast(sub_cents), "subspace"
    ).select(
        id_col,
        "subspace",
        "code",
        F.round(cosine(F.col("sv"), F.col("csv")), 6).alias("sub_cosine"),
    )
    w = Window.partitionBy(id_col, "subspace").orderBy(
        F.desc("sub_cosine"), F.asc("code")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "subspace", "code", "sub_cosine")
    )


def cluster_purity(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster label purity of the IVF assignment — the standard
    external clustering-quality check ("do the coarse cells respect
    the labels?") that decides whether the placeholder quantizer is
    good enough or k-means training (kmeans_codebook) is warranted.

    Rides :func:`ivf_assign` unchanged, joins labels back on the id,
    and reduces to exact int64 counts: cluster size, distinct labels,
    and the majority label (ties by label asc). Purity =
    top_count / n_vecs is the one shared float.

    Emits ``centroid_id, n_vecs, n_labels, top_label, top_count,
    purity``.
    """
    from pyspark.sql import Window

    asg = ivf_assign(vectors, n_centroids, id_col=id_col, vec_col=vec_col)
    j = asg.join(
        vectors.select(id_col, F.col(label_col).cast("long").alias("lbl")),
        id_col,
    )
    per = j.groupBy("centroid_id", "lbl").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("centroid_id").orderBy(F.desc("c"), F.asc("lbl"))
    w_tot = Window.partitionBy("centroid_id")
    ranked = per.select(
        "centroid_id",
        "lbl",
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w_tot).alias("n_vecs"),
        F.count("*").over(w_tot).alias("n_labels"),
    )
    top = ranked.where(F.col("rn") == 1).select(
        "centroid_id",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.col("n_labels").cast("long").alias("n_labels"),
        F.col("lbl").alias("top_label"),
        F.col("c").alias("top_count"),
    )
    return top.select(
        "centroid_id",
        "n_vecs",
        "n_labels",
        "top_label",
        "top_count",
        F.expr(
            "round(CAST(top_count AS DOUBLE) / CAST(n_vecs AS DOUBLE), 6)"
        ).alias("purity"),
    )


def norm_profile(embeddings: DataFrame, scale: int = 10_000) -> DataFrame:
    """Per-label embedding-norm profile in exact fixed point: each
    component quantizes to ``floor(x * scale + 0.5)`` int64 (after the
    deterministic float32 -> float64 widening), the squared norm is an
    exact integer sum of squares, and the per-label rollup is exact
    int64 throughout — the drift monitor for an embedding pipeline
    ("did label 7's vectors suddenly shrink?") with none of the
    cross-engine float-summation ambiguity.

    Headroom: |x| <= ~1 at scale 1e4 gives q^2 <= ~1e8, x 64 dims
    ~6e9 per vector, so the int64 per-label sum is safe to ~1e9
    vectors per label; raise ``scale`` only with a matching headroom
    check. Scale shape: ONE map-side combinable aggregation; the
    per-vector transform+fold is a Catalyst higher-order function
    (JVM-side, no Python); |labels| output rows.

    Emits ``label, n_vecs, dim, sum_sq_fx, min_sq_fx, max_sq_fx,
    mean_sq_fx``.
    """
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("long"),
    )
    sq = F.aggregate(
        q,
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )
    per_vec = embeddings.select(
        F.col("label").cast("long").alias("label"),
        F.size("embedding").alias("dim"),
        sq.alias("sq_fx"),
    )
    agg = per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.max("dim").cast("int").alias("dim"),
        F.sum("sq_fx").cast("long").alias("sum_sq_fx"),
        F.min("sq_fx").cast("long").alias("min_sq_fx"),
        F.max("sq_fx").cast("long").alias("max_sq_fx"),
    )
    return agg.select(
        "label",
        "n_vecs",
        "dim",
        "sum_sq_fx",
        "min_sq_fx",
        "max_sq_fx",
        F.expr(
            "round(CAST(sum_sq_fx AS DOUBLE) / CAST(n_vecs AS DOUBLE), 6)"
        ).alias("mean_sq_fx"),
    )


def dim_profile(embeddings: DataFrame, scale: int = 10_000) -> DataFrame:
    """Per-DIMENSION embedding census in exact fixed point: for every
    vector position, the count / sum / min / max of the quantized
    components — the "is dimension 17 dead or saturated?" drift
    check that :func:`norm_profile` (per label) cannot see.

    The posexplode fans out |vecs| x dim rows — bounded by the fixed
    dimensionality, never data-squared — and feeds ONE map-side
    combinable aggregate into exactly ``dim`` output rows. Sums
    exact int64 (same 1e-4 fixed point and headroom note as
    norm_profile); the mean is one shared float at component
    magnitudes.

    Emits ``dim, n_vecs, sum_fx, min_fx, max_fx, mean_fx``.
    """
    q = F.floor(
        F.col("x").cast("double") * F.lit(float(scale)) + F.lit(0.5)
    ).cast("long")
    exploded = embeddings.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select((F.col("pos") + 1).cast("int").alias("dim"), q.alias("fx"))
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("fx").cast("long").alias("sum_fx"),
        F.min("fx").cast("long").alias("min_fx"),
        F.max("fx").cast("long").alias("max_fx"),
    )
    return agg.select(
        "dim",
        "n_vecs",
        "sum_fx",
        "min_fx",
        "max_fx",
        F.expr(
            "round(CAST(sum_fx AS DOUBLE) / CAST(n_vecs AS DOUBLE), 6)"
        ).alias("mean_fx"),
    )


def centroid_alignment(
    embeddings: DataFrame, scale: int = 10_000
) -> DataFrame:
    """Exact label-centroid alignment matrix: for every unordered
    label pair, the dot product of the SUMMED fixed-point vectors —
    an integer-exact proxy for centroid similarity (the normalized
    centroid dot is sum_dot / (n_a * n_b) up to the fixed-point
    scale, emitted as the one shared float). High alignment between
    two labels says their embedding clusters point the same way —
    the label-confusion early warning.

    Pipeline: posexplode to (label, dim, fx), ONE map-side
    combinable sum into |labels| x dim rows, a self-join ON dim over
    that tiny frame (the corpus is touched once; the join input is
    hundreds of rows at ANY corpus size), one |labels|^2/2-row
    aggregate. Headroom: |sum_fx| <= n*scale ~ 1e13 at 1e9
    vectors/label, so each product term stays under 2^63 for
    corpora to ~3e4 vectors/label at scale 1e4 — raise with care or
    drop to scale 1e3 (the docstring contract of norm_profile).

    Emits ``label_a, label_b, n_a, n_b, dot_fx2, mean_align``.
    """
    q = F.floor(
        F.col("x").cast("double") * F.lit(float(scale)) + F.lit(0.5)
    ).cast("long")
    per_dim = (
        embeddings.select(
            F.col("label").cast("long").alias("label"),
            F.posexplode("embedding").alias("pos", "x"),
        )
        .select("label", "pos", q.alias("fx"))
        .groupBy("label", "pos")
        .agg(F.sum("fx").cast("long").alias("sum_fx"))
    )
    counts = embeddings.groupBy(
        F.col("label").cast("long").alias("label")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    a = per_dim.select(
        F.col("label").alias("label_a"),
        F.col("pos").alias("pos_a"),
        F.col("sum_fx").alias("sfx_a"),
    )
    b = per_dim.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        F.col("sum_fx").alias("sfx_b"),
    )
    dots = (
        a.join(
            b,
            (F.col("pos_a") == F.col("pos_b"))
            & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sfx_a") * F.col("sfx_b"))
            .cast("long")
            .alias("dot_fx2")
        )
    )
    ca = counts.select(
        F.col("label").alias("la"), F.col("n_vecs").alias("n_a")
    )
    cb = counts.select(
        F.col("label").alias("lb"), F.col("n_vecs").alias("n_b")
    )
    out = (
        dots.join(F.broadcast(ca), F.col("label_a") == F.col("la"))
        .join(F.broadcast(cb), F.col("label_b") == F.col("lb"))
    )
    return out.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        "dot_fx2",
        F.expr(
            "round(CAST(dot_fx2 AS DOUBLE)"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"
        ).alias("mean_align"),
    )


def sparsity_by_label(
    embeddings: DataFrame, scale: int = 10_000
) -> DataFrame:
    """Embedding sparsity per label: the share of components that
    quantize to EXACT zero at the fixed-point scale (|x| < 0.5e-4 at
    scale 1e4) — a label whose vectors suddenly go 40% zero is a
    truncated or dead encoder.

    Same Catalyst transform+fold as :func:`norm_profile` (JVM-side,
    no Python, no explode): per vector the zero-component count is
    an integer fold, then ONE |labels|-row aggregate. The share is
    one shared float over exact ints.

    Emits ``label, n_vecs, n_components, n_zero, sparsity``.
    """
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("long"),
    )
    zeros = F.aggregate(
        q,
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.when(v == 0, 1).otherwise(0),
    )
    per_vec = embeddings.select(
        F.col("label").cast("long").alias("label"),
        F.size("embedding").cast("long").alias("dim"),
        zeros.alias("n_zero"),
    )
    agg = per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("dim").cast("long").alias("n_components"),
        F.sum("n_zero").cast("long").alias("n_zero"),
    )
    return agg.select(
        "label",
        "n_vecs",
        "n_components",
        "n_zero",
        F.expr(
            "round(CAST(n_zero AS DOUBLE)"
            " / CAST(n_components AS DOUBLE), 6)"
        ).alias("sparsity"),
    )


def norm_quartiles_by_label(
    embeddings: DataFrame, scale: int = 10_000
) -> DataFrame:
    """Exact quartiles of the fixed-point squared norm per label —
    the distribution behind :func:`norm_profile`'s min/mean/max
    envelope: a bimodal norm (half the vectors shrunk) hides
    completely in a mean. Type-1 quantiles at rank
    ``max(1, ceil(q/100 * n))`` under the deterministic
    (sq_fx, vec_id) order.

    The per-vector fold is the norm_profile Catalyst expression; the
    rank window rides one label exchange over |vecs| rows; output is
    |labels| rows. All int64.

    Emits ``label, n_vecs, p25_sq_fx, p50_sq_fx, p75_sq_fx``.
    """
    from pyspark.sql import Window

    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("long"),
    )
    sq = F.aggregate(
        q, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    per_vec = embeddings.select(
        F.col("label").cast("long").alias("label"),
        "vec_id",
        sq.alias("sq_fx"),
    )
    w = Window.partitionBy("label").orderBy("sq_fx", "vec_id")
    ranked = per_vec.select(
        "label",
        "sq_fx",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("label"))
        .cast("long")
        .alias("n_vecs"),
    )
    aggs = [F.max("n_vecs").cast("long").alias("n_vecs")]
    for qq, name in ((25, "p25"), (50, "p50"), (75, "p75")):
        target = F.greatest(
            F.lit(1), F.ceil(F.col("n_vecs") * F.lit(qq) / F.lit(100))
        )
        aggs.append(
            F.min(F.when(F.col("rk") == target, F.col("sq_fx")))
            .cast("long")
            .alias(f"{name}_sq_fx")
        )
    return ranked.groupBy("label").agg(*aggs)
