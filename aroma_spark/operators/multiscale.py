"""Multi-scale structure of a conversation signal: the
autocorrelation profile over lags 1..L in one pass, and unnormalized
Haar multiresolution detail energies.

The ACF profile is THE standard identification tool (Box-Jenkins):
lag-1 alone (stats.signal_autocorr) can't distinguish slow decay
(AR-like persistence) from a single spike (MA-like) or oscillation —
the shape over several lags can. Haar detail energy splits a signal's
variance by scale: level 1 is turn-to-turn roughness, level 3 is
8-turn-block structure; a bursty agent log and a smoothly drifting
one separate immediately.

House bit-determinism discipline (operators/stats.py): every shuffled
quantity is an exact int64 sufficient statistic — per-lag
(n, sx, sy, sxy, sxx, syy), per-level pair counts and squared
integer differences (unnormalized Haar kernel [1,-1], so no sqrt(2)
ever enters the cascade) — and the only float is stats._corr_expr's
ONE shared expression per lag.

Physical shape at 100 TB:
- The ACF profile computes ALL lags from ONE window pass over the
  canonical conv_id exchange (L lag() calls in the same window),
  explodes to (lag, x, y) — a row-count multiply of L, map-local —
  and aggregates by (conv_id, lag): one exchange, one shuffle,
  whatever L is. L sequential runs of signal_autocorr would scan and
  shuffle L times.
- The Haar cascade is `levels` successive halving aggregations keyed
  (conv_id, position>>1); every level halves the row count, so the
  total work is a geometric series bounded by 2x the first level.
  Trailing odd elements at each level are dropped (standard dyadic
  truncation), never padded, so no synthetic values enter energies.
- int64 headroom: level-l sums are block sums of 2^l values, so
  detail energies are bounded by (2^(l-1) * max|v|)^2 * n_pairs —
  safe for text_len < ~1e6 and levels <= 3 at any conversation
  length that fits a partition.

No reference analog (the reference has no spectral/multiresolution
analysis); natural extensions of the derived-signal family over the
fixed signal schema of operators/signals.py (reference
src/aroma/preprocessing/intertimes.py:44-80).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aroma_spark.operators.stats import MIN_PAIRS, _corr_expr


def acf_profile(
    signals: DataFrame,
    value_col: str = "text_len",
    max_lag: int = 4,
) -> DataFrame:
    """Autocorrelation at every lag 1..``max_lag`` per conversation,
    long format, from a single window pass.

    Each lag's pairs (v_{i-lag}, v_i) are a bivariate sample scored by
    the house Pearson expression (stats._corr_expr) over exact int64
    sufficient statistics — identical semantics to running
    stats.signal_autocorr per lag, at one scan + one shuffle total.
    Lags with fewer than MIN_PAIRS pairs are dropped (short
    conversations simply stop contributing at high lags).

    Emits ``conv_id, lag, n_pairs, autocorr`` sorted nowhere —
    ordering belongs to the consumer.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    v = F.col(value_col).cast("long")
    lagged = signals.select(
        "conv_id",
        v.alias("y"),
        *[F.lag(v, L).over(w).alias(f"x{L}") for L in range(1, max_lag + 1)],
    )
    stacked = lagged.select(
        "conv_id",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("long").alias("lag"),
                        F.col(f"x{L}").alias("x"),
                    )
                    for L in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).select("conv_id", F.col("p.lag").alias("lag"), F.col("p.x").alias("x"), "y")
    paired = stacked.where(F.col("x").isNotNull())
    agg = (
        paired.groupBy("conv_id", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        .where(F.col("n_pairs") >= MIN_PAIRS)
    )
    return agg.select(
        "conv_id",
        "lag",
        "n_pairs",
        _corr_expr(
            F.col("n_pairs"), F.col("sx"), F.col("sy"),
            F.col("sxy"), F.col("sxx"), F.col("syy"),
        ).alias("autocorr"),
    )


def haar_energy(
    signals: DataFrame,
    y_col: str = "text_len",
    levels: int = 3,
) -> DataFrame:
    """Unnormalized Haar wavelet detail energy per level per
    conversation — how much signal variance lives at each dyadic
    scale.

    Level 1 pairs adjacent turns (positions 2k, 2k+1 in turn order):
    detail d = even - odd, energy_1 = sum d^2; the pair sums
    even + odd cascade to level 2, and so on. The kernel stays [1, -1]
    with NO normalization, so every intermediate is exact int64
    (the orthonormal Haar energies are these divided by 2^level —
    a consumer-side constant). A trailing unpaired element at any
    level is dropped, exactly as in dyadic wavelet practice.

    Emits ``conv_id, level, n_pairs, energy`` — one row per level
    that has at least one complete pair.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cur = signals.select(
        "conv_id",
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("k"),
        F.col(y_col).cast("long").alias("v"),
    )
    out = None
    for lvl in range(1, levels + 1):
        paired = (
            cur.groupBy("conv_id", F.expr("k DIV 2").alias("g"))
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.when(F.col("k") % 2 == 0, F.col("v"))).alias("ev"),
                F.sum(F.when(F.col("k") % 2 == 1, F.col("v"))).alias("od"),
            )
            .filter(F.col("cnt") == 2)
        )
        lev = (
            paired.groupBy("conv_id")
            .agg(
                F.count("*").cast("long").alias("n_pairs"),
                F.sum(
                    (F.col("ev") - F.col("od")) * (F.col("ev") - F.col("od"))
                )
                .cast("long")
                .alias("energy"),
            )
            .select(
                "conv_id",
                F.lit(lvl).cast("long").alias("level"),
                "n_pairs",
                "energy",
            )
        )
        out = lev if out is None else out.unionByName(lev)
        cur = paired.select(
            "conv_id",
            F.col("g").alias("k"),
            (F.col("ev") + F.col("od")).alias("v"),
        )
    return out


def vr_sql(q: int) -> str:
    """The ONE float expression for the Lo-MacKinlay variance ratio
    over exact int64 columns m1, s1, s1sq (lag-1 diff count/sum/sum of
    squares) and mq, sq, sqsq (lag-q): VR = Var_q / (q * Var_1) with
    population variances (m*ssq - s^2)/m^2, cross-multiplied into one
    final division. NULL when the lag-1 variance is zero."""
    v1num = "(CAST(m1 AS DOUBLE) * CAST(s1sq AS DOUBLE)" \
            " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    vqnum = "(CAST(mq AS DOUBLE) * CAST(sqsq AS DOUBLE)" \
            " - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))"
    return (
        f"CASE WHEN {v1num} > 0 THEN"
        f" round(({vqnum} * CAST(m1 AS DOUBLE) * CAST(m1 AS DOUBLE))"
        f" / ({v1num} * {q}.0 * CAST(mq AS DOUBLE) * CAST(mq AS DOUBLE)),"
        " 6) END"
    )


def tp_z_sql() -> str:
    """The ONE float expression for the turning-points z-score over
    exact int64 columns n_turns, n_tp: E[T] = 2(n-2)/3,
    Var[T] = (16n - 29)/90 (Kendall); NULL when n_turns < 3."""
    n = "CAST(n_turns AS DOUBLE)"
    return (
        "CASE WHEN n_turns >= 3 THEN"
        f" round((CAST(n_tp AS DOUBLE) - 2.0 * ({n} - 2.0) / 3.0)"
        f" / sqrt((16.0 * {n} - 29.0) / 90.0), 6) END"
    )


def variance_ratio(
    signals: DataFrame,
    value_col: str = "text_len",
    q: int = 2,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test per conversation: is the
    signal a random walk (VR = 1), mean-reverting (VR < 1), or
    trending (VR > 1)?

    VR(q) = Var(x_t - x_{t-q}) / (q * Var(x_t - x_{t-1})). Both
    difference samples come from two lag() calls in the same window
    pass; their count/sum/sum-of-squares are exact int64 and the
    ratio is one shared float (:func:`vr_sql`). The natural companion
    to :func:`~aroma_spark.operators.forecast.rs_range` — VR tests a
    specific horizon q, R/S summarizes all horizons.

    Emits ``conv_id, m1, s1, s1sq, mq, sq, sqsq, vr`` for
    conversations with at least 2 lag-q differences.
    """
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    v = F.col(value_col).cast("long")
    diffed = signals.select(
        "conv_id",
        (v - F.lag(v, 1).over(w)).alias("d1"),
        (v - F.lag(v, q).over(w)).alias("dq"),
    )
    agg = (
        diffed.groupBy("conv_id")
        .agg(
            F.count("d1").cast("long").alias("m1"),
            F.sum("d1").cast("long").alias("s1"),
            F.sum(F.col("d1") * F.col("d1")).cast("long").alias("s1sq"),
            F.count("dq").cast("long").alias("mq"),
            F.sum("dq").cast("long").alias("sq"),
            F.sum(F.col("dq") * F.col("dq")).cast("long").alias("sqsq"),
        )
        .filter(F.col("mq") >= 2)
    )
    return agg.select(
        "conv_id",
        "m1",
        "s1",
        "s1sq",
        "mq",
        "sq",
        "sqsq",
        F.expr(vr_sql(q)).alias("vr"),
    )


def turning_points(
    signals: DataFrame,
    value_col: str = "text_len",
) -> DataFrame:
    """Kendall turning-points randomness test per conversation: count
    strict local extrema (sign change between consecutive
    differences) and compare with the 2(n-2)/3 expected under
    randomness.

    A turn t is a turning point when
    (x_t - x_{t-1}) * (x_{t+1} - x_t) < 0 — ties produce a zero
    product and never count, a deterministic convention both engines
    share. Counts are exact int64; the z-score is one shared float
    (:func:`tp_z_sql`). One lag + one lead in the same window pass,
    one aggregation.

    Emits ``conv_id, n_turns, n_tp, z`` for conversations with
    >= 3 turns.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    v = F.col(value_col).cast("long")
    marked = signals.select(
        "conv_id",
        (
            (v - F.lag(v, 1).over(w)) * (F.lead(v, 1).over(w) - v) < 0
        ).alias("is_tp"),
    )
    agg = (
        marked.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(F.when(F.col("is_tp"), 1).otherwise(0))
            .cast("long")
            .alias("n_tp"),
        )
        .filter(F.col("n_turns") >= 3)
    )
    return agg.select(
        "conv_id", "n_turns", "n_tp", F.expr(tp_z_sql()).alias("z")
    )
