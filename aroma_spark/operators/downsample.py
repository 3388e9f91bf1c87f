"""Chart/observability downsampling: M4, counter rate, time-weighted avg.

Three classic time-series-store operators over the signal frame, all
pure Catalyst (no Python), all one hash exchange keyed on conv_id /
(conv_id, bucket) — the same partitioning the tier lattice uses, so at
100 TB they slot into the existing shuffle rather than adding one:

- :func:`m4_downsample` — M4 aggregation (Jugel et al., "M4: A
  Visualization-Oriented Time Series Data Aggregation", VLDB 2014):
  per (series, time bucket) keep only the first / last / min / max
  points. M4 is pixel-perfect for line charts at the bucket-per-pixel
  width and, unlike LTTB, is a pure per-group aggregation — it
  parallelizes with map-side partial combine instead of a sequential
  sweep, which is why it is the scale path here.
- :func:`counter_increase` — reset-aware monotone-counter delta (the
  semantics of PromQL ``increase``): a sample below its predecessor is
  a counter reset, contributing its own value instead of a negative
  delta. Lag-diff window + bucket aggregation, integer-exact.
- :func:`time_weighted_avg` — LOCF time-weighted mean per bucket (the
  continuous-aggregate companion of gap-fill for irregular arrivals):
  each sample's value is weighted by how long it held until the next
  sample. Integer numerator/denominator (microseconds), one rounded
  float division at the end.

The reference has no downsampling; these generalize its prepared-
dataset aggregations (reference: src/aroma/datasets/breakfast.py:621)
per BASELINE.json north_rule into the downsample family every
retention engine ships. All three have exact DuckDB SQL twins in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def m4_downsample(
    signals: DataFrame,
    unit: str = "hour",
    value_col: str = "inter_time_us",
) -> DataFrame:
    """Per (conv_id, bucket) keep the first/last/min/max points (M4).

    Selection is deterministic under any partitioning: each role is a
    lexicographic struct min/max — first = min(ts, turn_idx), last =
    max(ts, turn_idx), min = min(value, ts, turn_idx), max =
    max(value, ts, turn_idx) — so ties break identically on every
    engine. A point selected for several roles appears once (distinct).

    One aggregation shuffle on (conv_id, bucket); the explode fans out
    at most 4 rows per group, so the post-agg stage is tiny. No window
    sort: a hot conversation costs a combine, not a single-task sort.
    """
    v = F.col(value_col).cast("long")
    t = F.col("turn_idx").cast("long")
    ts_us = F.unix_micros(F.col("ts"))
    by_time = F.struct(ts_us.alias("ts_us"), t.alias("t"), v.alias("v"))
    by_value = F.struct(v.alias("v"), ts_us.alias("ts_us"), t.alias("t"))

    def _norm(prefix: str):
        c = F.col(prefix)
        return F.struct(
            c.getField("ts_us").alias("ts_us"),
            c.getField("t").alias("t"),
            c.getField("v").alias("v"),
        )

    agg = signals.groupBy(
        "conv_id", F.date_trunc(unit, F.col("ts")).alias("bucket_ts")
    ).agg(
        F.min(by_time).alias("__first"),
        F.max(by_time).alias("__last"),
        F.min(by_value).alias("__min"),
        F.max(by_value).alias("__max"),
    )
    pts = agg.select(
        "conv_id",
        "bucket_ts",
        F.explode(
            F.array(
                _norm("__first"),
                _norm("__last"),
                _norm("__min"),
                _norm("__max"),
            )
        ).alias("p"),
    )
    return pts.select(
        "conv_id",
        "bucket_ts",
        F.timestamp_micros(F.col("p.ts_us")).alias("ts"),
        F.col("p.t").alias("turn_idx"),
        F.col("p.v").alias("value"),
    ).distinct()


def counter_increase(
    df: DataFrame,
    unit: str = "hour",
    counter_col: str = "counter",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Reset-aware increase of a cumulative counter per (conv, bucket).

    PromQL ``increase`` semantics: delta = value - prev if the counter
    did not decrease, else value (a decrease means the counter reset to
    zero and re-accumulated). The first sample of a conversation has no
    predecessor and contributes 0 (no extrapolation — documented
    difference from Prometheus' range-edge interpolation, which is not
    reproducible across engines). Deltas are attributed to the bucket
    of the LATER sample.

    One window exchange on conv_id reused by the bucket aggregation key
    prefix; all arithmetic is integer.
    """
    w = Window.partitionBy("conv_id").orderBy(order_col)
    v = F.col(counter_col).cast("long")
    prev = F.lag(v, 1).over(w)
    delta = (
        F.when(prev.isNull(), F.lit(0))
        .when(v < prev, v)
        .otherwise(v - prev)
        .cast("long")
    )
    reset = F.when(prev.isNotNull() & (v < prev), F.lit(1)).otherwise(F.lit(0))
    return (
        df.select(
            "conv_id",
            F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
            delta.alias("__d"),
            reset.alias("__r"),
        )
        .groupBy("conv_id", "bucket_ts")
        .agg(
            F.sum("__d").cast("long").alias("increase"),
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum("__r").cast("long").alias("n_resets"),
        )
    )


def time_weighted_avg(
    signals: DataFrame,
    unit: str = "hour",
    value_col: str = "inter_time_us",
) -> DataFrame:
    """LOCF time-weighted mean per (conv, bucket) over irregular samples.

    Each sample's value holds from its timestamp until the next sample
    of the conversation (LOCF). Only segments whose BOTH endpoints fall
    in the same bucket are counted (segment-interior definition: no
    gap-fill grid is required, so the operator stays a single window +
    aggregation; boundary-spanning holds belong to :mod:`gapfill`'s
    grid semantics instead). Buckets whose samples have no in-bucket
    successor emit NULL weighted fields.

    ``weighted_sum`` (value x microseconds) and ``duration_us`` are
    exact integers — the re-aggregable partials; ``twa`` is the one
    rounded float division, computed last.

    Overflow bound: each segment weight is at most bucket_width_us (the
    segment lies inside one bucket), so int64 holds as long as
    max(value) x bucket_width_us x points_per_bucket < 2^63 — fine for
    bounded signals like text_len; for very large values (e.g. raw
    microsecond latencies under day-scale buckets) pre-scale the value
    or narrow the bucket.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts_us = F.unix_micros(F.col("ts"))
    b = F.date_trunc(unit, F.col("ts"))
    v = F.col(value_col).cast("long")
    nxt_ts = F.lead(ts_us, 1).over(w)
    nxt_b = F.lead(b, 1).over(w)
    dt = F.when(nxt_b == b, nxt_ts - ts_us)  # NULL outside the bucket
    out = (
        signals.select(
            "conv_id",
            b.alias("bucket_ts"),
            (v * dt).alias("__num"),
            dt.alias("__dt"),
        )
        .groupBy("conv_id", "bucket_ts")
        .agg(
            F.sum("__num").cast("long").alias("weighted_sum"),
            F.sum("__dt").cast("long").alias("duration_us"),
        )
    )
    return out.select(
        "conv_id",
        "bucket_ts",
        "weighted_sum",
        "duration_us",
        F.when(
            F.col("duration_us") > 0,
            F.round(
                F.col("weighted_sum").cast("double") / F.col("duration_us"), 6
            ),
        ).alias("twa"),
    )
