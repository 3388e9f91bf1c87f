"""Forecast backtesting and long-memory analytics: seasonal-naive vs
naive one-step backtest over the hourly rollup, and the rescaled-range
(R/S) statistic behind the Hurst exponent, per conversation.

The backtest answers the capacity-planning question "how much better
does same-hour-yesterday predict this hour's traffic than
last-hour?" — the two canonical zero-parameter baselines every real
forecaster must beat (MASE's denominator is exactly the naive error,
Hyndman & Koehler 2006). R/S measures long-range dependence: a
persistent series (trends that keep going) has R/S growing faster
than sqrt(n), an anti-persistent one slower.

House bit-determinism discipline (operators/stats.py): absolute
errors, error counts, and the rescaled-range numerator are exact
int64 — the classic float-cumsum deviation D_k = P_k - k*mean is
multiplied through by n to D_k = n*P_k - k*S so prefix deviations
stay integral — and each emitted float is ONE fixed expression shared
verbatim with the DuckDB twin (the tau_b_sql pattern of
operators/ordinal.py).

Physical shape at 100 TB:
- The backtest runs on the HOURLY rollup, not raw turns: the raw
  table collapses by (hour) first (map-side combinable count), and the
  two lag alignments are equi-joins of that tiny table against
  hour-shifted projections of itself — broadcastable at any raw-data
  scale (a year is 8,760 rows regardless of input size).
- R/S is one window cumulative sum over the canonical conv_id
  exchange every per-conversation operator shares, then one
  aggregate. No joins, no blowup; linear in rows.
- int64 headroom: R/S prefix deviations are bounded by
  n^2 * max|value| per conversation (safe while n_turns^2 * text_len
  < 9.2e18, e.g. 1e6-turn conversations of 1e6-char turns); backtest
  errors are bounded by hourly counts.

No reference analog (the reference has no forecasting); natural
extensions of the tier-rollup family (operators/tiers.py) and the
derived-signal family of operators/signals.py (reference
src/aroma/preprocessing/intertimes.py:44-80).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# a defined variance needs a few points (family-wide threshold shared
# with ordinal.kendall_tau / nonparam.theil_sen)
MIN_TURNS = 4


def mase_like_sql() -> str:
    """The ONE float expression comparing the seasonal-naive mean
    absolute error to the naive one over exact int64 columns
    sae_seasonal, cnt_seasonal, sae_naive, cnt_naive:
    ratio = (sae_s/cnt_s) / (sae_n/cnt_n), cross-multiplied so the
    only division is the final one. NULL when the naive error is zero
    (the ratio is undefined, as in MASE)."""
    return (
        "CASE WHEN sae_naive > 0 THEN"
        " round((CAST(sae_seasonal AS DOUBLE) * CAST(cnt_naive AS DOUBLE))"
        " / (CAST(cnt_seasonal AS DOUBLE) * CAST(sae_naive AS DOUBLE)), 6)"
        " END"
    )


def rs_sql() -> str:
    """The ONE float expression for the rescaled range over exact
    int64 columns r_scaled, n_points, s_sum, q_sum. The integral
    deviations carry an extra factor n, so
    R/S = r_scaled / (n * sigma) with
    sigma = sqrt((q_sum - s_sum^2/n) / n) (population sd). NULL when
    the variance is zero (constant series)."""
    n = "CAST(n_points AS DOUBLE)"
    s = "CAST(s_sum AS DOUBLE)"
    q = "CAST(q_sum AS DOUBLE)"
    return (
        "CASE WHEN n_points * q_sum - s_sum * s_sum > 0 THEN"
        f" round(CAST(r_scaled AS DOUBLE)"
        f" / ({n} * sqrt(({q} - {s} * {s} / {n}) / {n})), 6) END"
    )


def seasonal_backtest_daily(
    signals: DataFrame, season_hours: int = 24
) -> DataFrame:
    """Backtest the two zero-parameter forecasters on hourly turn
    counts: seasonal-naive (same hour ``season_hours`` ago — 24 for
    daily seasonality, 168 for weekly) vs naive (previous hour),
    aggregated per day.

    Hours missing from the data simply produce no (h, h-24h) or
    (h, h-1h) pair — errors are computed over ALIGNED hours only, and
    the per-forecaster pair counts are reported so the ratio can't
    silently compare different coverage. ``mase_like`` =
    (seasonal MAE) / (naive MAE), cross-multiplied
    (:func:`mase_like_sql`); < 1 means daily seasonality is real
    signal, not noise.

    Emits one row per day with at least one pair of each kind:
    ``day_ts, n_hours, sae_seasonal, cnt_seasonal, sae_naive,
    cnt_naive, mase_like``.
    """
    hourly = signals.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n"))
    s24 = hourly.select(
        (
            F.col("hour_ts") + F.expr(f"INTERVAL {season_hours} HOURS")
        ).alias("hour_ts"),
        F.col("n").alias("n_s24"),
    )
    s1 = hourly.select(
        (F.col("hour_ts") + F.expr("INTERVAL 1 HOUR")).alias("hour_ts"),
        F.col("n").alias("n_s1"),
    )
    j = hourly.join(s24, "hour_ts", "left").join(s1, "hour_ts", "left")
    out = (
        j.groupBy(F.date_trunc("day", F.col("hour_ts")).alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.sum(F.abs(F.col("n") - F.col("n_s24")))
            .cast("long")
            .alias("sae_seasonal"),
            F.count("n_s24").cast("long").alias("cnt_seasonal"),
            F.sum(F.abs(F.col("n") - F.col("n_s1")))
            .cast("long")
            .alias("sae_naive"),
            F.count("n_s1").cast("long").alias("cnt_naive"),
        )
        .filter((F.col("cnt_seasonal") > 0) & (F.col("cnt_naive") > 0))
    )
    return out.select(
        F.col("day").alias("day_ts"),
        "n_hours",
        "sae_seasonal",
        "cnt_seasonal",
        "sae_naive",
        "cnt_naive",
        F.expr(mase_like_sql()).alias("mase_like"),
    )


def rs_range(
    signals: DataFrame,
    y_col: str = "text_len",
    min_turns: int = MIN_TURNS,
) -> DataFrame:
    """Rescaled range R/S of ``y_col`` per conversation — the
    statistic whose growth rate over n estimates the Hurst exponent.

    Classically R = max_k(D_k) - min_k(D_k) with
    D_k = sum_{i<=k}(x_i - mean). Multiplying through by n keeps every
    prefix deviation integral: ``D'_k = n*P_k - k*S`` where P_k is the
    k-th prefix sum and S the total; then R/S =
    (max D' - min D') / (n * sigma) in ONE shared float expression
    (:func:`rs_sql`). D'_n = 0 always, so the implicit D_0 = 0 anchor
    is in the range automatically.

    Emits ``conv_id, n_points, s_sum, q_sum, r_scaled, rs`` for
    conversations with >= ``min_turns`` turns and nonzero variance
    (rs NULL when constant).
    """
    vr = signals.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col(y_col).cast("long").alias("v"),
    )
    w_seq = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("conv_id")
    stepped = vr.select(
        "conv_id",
        (
            F.count("*").over(w_tot) * F.sum("v").over(w_seq)
            - F.count("*").over(w_seq) * F.sum("v").over(w_tot)
        ).alias("d_k"),
        F.count("*").over(w_tot).alias("n_points"),
        F.sum("v").over(w_tot).alias("s_sum"),
        F.sum(F.col("v") * F.col("v")).over(w_tot).alias("q_sum"),
    )
    agg = (
        stepped.groupBy("conv_id")
        .agg(
            F.max("n_points").cast("long").alias("n_points"),
            F.max("s_sum").cast("long").alias("s_sum"),
            F.max("q_sum").cast("long").alias("q_sum"),
            (F.max("d_k") - F.min("d_k")).cast("long").alias("r_scaled"),
        )
        .filter(F.col("n_points") >= min_turns)
    )
    return agg.select(
        "conv_id",
        "n_points",
        "s_sum",
        "q_sum",
        "r_scaled",
        F.expr(rs_sql()).alias("rs"),
    )
