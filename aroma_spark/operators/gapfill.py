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
