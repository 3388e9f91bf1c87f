"""Gap-fill: regular grid + LOCF + linear interpolation.

The asynchronous series (irregular inter-turn arrivals, the reference's
core subject — inter-times at src/aroma/preprocessing/intertimes.py:83-104)
is densified onto a regular bucket grid per conversation:

- grid: ``sequence(min_bucket, max_bucket, interval)`` + ``explode`` —
  generated distributed, proportional to span/granularity per key, never
  a driver-side loop;
- LOCF: ``last(value, ignorenulls=True)`` over rows unbounded-preceding —
  the as-of-join of grid against irregular series, expressed as a window
  (no join needed once grid and series are unioned per key);
- linear interpolation: bracketing anchors via the mirrored
  forward/backward windows; edge policy: leading gaps take the next
  anchor, trailing gaps the previous (single-point series degenerate to
  a constant).

One shuffle on conv_id (shared with the signal window), one sort per
partition — the window frame does the rest in a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_grid(
    tier: DataFrame,
    value_col: str,
    interval: str = "1 minute",
    unit: str = "minute",
) -> DataFrame:
    """Densify a tier frame (conv_id, bucket_ts, <value_col>) onto its grid.

    Returns (conv_id, bucket_ts, value, locf_value, lerp_value,
    is_filled) where ``value`` is NULL on synthesized buckets.
    """
    src = tier.select(
        "conv_id", "bucket_ts", F.col(value_col).cast("double").alias("value")
    )
    # align span bounds to the declared unit so interval and unit cannot
    # silently disagree (no-op when the tier is already truncated, which
    # every rollup tier is; a raw-ts caller gets a proper aligned grid).
    span = src.groupBy("conv_id").agg(
        F.date_trunc(unit, F.min("bucket_ts")).alias("min_b"),
        F.date_trunc(unit, F.max("bucket_ts")).alias("max_b"),
    )
    grid = span.select(
        "conv_id",
        F.explode(
            F.sequence("min_b", "max_b", F.expr(f"interval {interval}"))
        ).alias("bucket_ts"),
    )
    dense = grid.join(src, ["conv_id", "bucket_ts"], "left")

    w_back = (
        Window.partitionBy("conv_id")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("conv_id")
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    bucket_us = F.unix_micros("bucket_ts").cast("double")
    anchor_t = F.when(F.col("value").isNotNull(), bucket_us)

    dense = dense.select(
        "conv_id",
        "bucket_ts",
        "value",
        F.last("value", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(anchor_t, ignorenulls=True).over(w_back).alias("prev_t"),
        F.first("value", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(anchor_t, ignorenulls=True).over(w_fwd).alias("next_t"),
    )
    lerp = (
        F.when(F.col("value").isNotNull(), F.col("value"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(F.col("next_t") == F.col("prev_t"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (bucket_us - F.col("prev_t"))
            / (F.col("next_t") - F.col("prev_t"))
        )
    )
    return dense.select(
        "conv_id",
        "bucket_ts",
        "value",
        F.col("prev_v").alias("locf_value"),
        lerp.alias("lerp_value"),
        (F.col("value").isNull()).alias("is_filled"),
    )


def interp_sql() -> str:
    """The ONE float expression for linear interpolation over exact
    int64 columns n_obs (observed count or NULL), pv/nv (previous and
    next observed values), dt_us/span_us (elapsed and span
    microseconds): observed hours pass through, missing hours get
    pv + (nv - pv) * dt/dT."""
    return (
        "CASE WHEN n_obs IS NOT NULL THEN CAST(n_obs AS DOUBLE)"
        " ELSE round(CAST(pv AS DOUBLE)"
        " + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))"
        " * CAST(dt_us AS DOUBLE) / CAST(span_us AS DOUBLE), 6) END"
    )


def interp_linear_hourly(signals: DataFrame) -> DataFrame:
    """Linearly interpolated dense hourly count series for the whole
    corpus — the "connect the dots" gap policy (Timescale
    ``interpolate()``, Prometheus range vectors) next to the
    step-function LOCF of :func:`gapfill_grid`.

    The observed hourly rollup spans a dense grid via
    ``sequence(min, max, 1 hour)``; each missing hour finds its
    nearest observed neighbors with two ignore-null window scans and
    takes the exact-rational position between them —
    pv + (nv-pv)*dt/dT with all four operands int64 microseconds, one
    shared float expression (:func:`interp_sql`). Grid endpoints are
    observed by construction, so every missing hour has both
    neighbors.

    Scale shape: the corpus collapses to the hourly rollup first; the
    grid, the two window scans, and the output are all
    calendar-bounded (8,760 rows/year at any corpus size — the
    seasonal_residual_outliers precedent for the single unpartitioned
    window).

    Emits ``hour_ts, n_obs (NULL when interpolated), value``.
    """
    from pyspark.sql import Window

    hourly = signals.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n_obs"))
    span = hourly.agg(
        F.min("hour_ts").alias("mn"), F.max("hour_ts").alias("mx")
    )
    grid = span.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 hour"))
        ).alias("hour_ts")
    )
    dense = grid.join(hourly, "hour_ts", "left")
    w_prev = Window.orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_next = Window.orderBy("hour_ts").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_ts = F.when(F.col("n_obs").isNotNull(), F.col("hour_ts"))
    marked = dense.select(
        "hour_ts",
        "n_obs",
        F.last("n_obs", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_ts, ignorenulls=True).over(w_prev).alias("pts"),
        F.first("n_obs", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_ts, ignorenulls=True).over(w_next).alias("nts"),
    )
    timed = marked.select(
        "hour_ts",
        "n_obs",
        "pv",
        "nv",
        (F.unix_micros(F.col("hour_ts")) - F.unix_micros(F.col("pts")))
        .cast("long")
        .alias("dt_us"),
        (F.unix_micros(F.col("nts")) - F.unix_micros(F.col("pts")))
        .cast("long")
        .alias("span_us"),
    )
    return timed.select(
        "hour_ts", "n_obs", F.expr(interp_sql()).alias("value")
    )
