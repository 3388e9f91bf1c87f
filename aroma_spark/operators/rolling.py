"""Trailing time-window statistics over irregular series.

The rollup lattice answers "what happened inside bucket X"; operators
here answer "what happened in the WINDOW ending at each turn" — the
sliding-window view (rate limiting, burst detection, trailing SLO math)
that irregular inter-arrival series need, where row-count frames are
meaningless and the frame must be a TIME range.

Implementation is one Catalyst range-frame window over the canonical
``(conv_id)`` exchange: ``rangeBetween(-window_us, 0)`` on integer
``unix_micros(ts)`` — no explode, no self-join, no Python. At 100 TB
this rides the same single conv_id hash exchange every other
per-conversation operator shares; the frame scan is O(rows-in-window)
per row with Spark's sliding aggregate buffer. All outputs are integer
counts/sums (exact under any schedule); means are derived by the caller
so the shuffled data stays integral.

No reference analog (the reference's only window math is the lag-diff
inter-times, src/aroma/preprocessing/intertimes.py:83-104); this is the
natural generalization for the task brief's async-telemetry tier.

Skew note: a range-frame window serializes per conversation (the frame
needs the conversation's full trailing history, so salting cannot
apply). A pathological conversation with ~10^8 turns would be one long
task; the chunked-window pattern of ``signals.with_signals_chunked``
(chunk by (conv, day), repair the boundary with a bounded overlap — for
a trailing window, one window-length of tail rows) applies if that
regime ever materializes. At this engine's observed conversation sizes
the plain range frame rides the shared conv_id exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_window_stats(
    signals: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Per turn: count / latency sum / max / text volume / tool calls of
    all turns of the same conversation within the trailing ``window``
    (inclusive of the current turn; ties at equal ts are frame peers).
    """
    from aroma_spark.operators.sessions import _interval_to_us

    win_us = _interval_to_us(window)
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-win_us, 0)
    )
    return signals.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("w_n_turns"),
        F.sum("inter_time_us").over(w).cast("long").alias("w_sum_latency_us"),
        F.max("inter_time_us").over(w).cast("long").alias("w_max_latency_us"),
        F.sum("text_len").over(w).cast("long").alias("w_sum_text_len"),
        F.sum("tool_call").over(w).cast("long").alias("w_tool_calls"),
    )


def bollinger_bands(
    tier: DataFrame,
    value_col: str = "sum_text_len",
    n_buckets: int = 24,
    k: float = 2.0,
) -> DataFrame:
    """Rolling mean +- k*sigma bands over the trailing ``n_buckets``
    PRESENT tier buckets per conversation — the envelope chart every
    time-series dashboard draws over a rollup tier, and the cheap
    threshold feed for alerting ("this hour's volume left the 2-sigma
    band").

    Row frame, not range frame: a sparse tier has holes, and the
    trailing-N-present-buckets window is the standard definition over a
    materialized rollup (a range frame over wall-clock would re-densify
    what gap-fill already owns, operators/gapfill.py).

    House discipline (operators/stats.py): the window shuffles/stacks
    exact int64 partials (n, S1, S2 — all map-side window state), and
    mean / sd / bands are each ONE fixed double expression over them:

        mean  = S1/n
        sd    = sqrt(n*S2 - S1*S1) / n          (population sigma)
        upper = mean + k*sd,  lower = mean - k*sd

    +,-,*,/ and sqrt are correctly rounded, so identical int64 inputs
    give bit-identical doubles on Spark and DuckDB — no round() needed,
    and none applied (trend_1d's lesson: rounding near 1e10 magnitudes
    DESTROYS parity, never creates it). Overflow: S2 sums value^2; at
    value <= 2^30 (1e9 text chars per bucket) a 24-bucket frame is
    ~2^65 in the worst case — callers with adversarial magnitudes scale
    the value first; for every engine signal (text_len, tool calls,
    n_points) value < 2^24 and S2 < 2^53, exact.

    One window pass riding the tier's existing (conv_id) exchange; at
    100 TB there is no extra shuffle — the frame state is 3 longs.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("bucket_ts")
        .rowsBetween(-(n_buckets - 1), 0)
    )
    v = F.col(value_col).cast("long")
    base = tier.select("conv_id", "bucket_ts", v.alias("v"))
    agg = base.select(
        "conv_id",
        "bucket_ts",
        "v",
        F.count(F.lit(1)).over(w).cast("long").alias("w_n"),
        F.sum("v").over(w).cast("long").alias("w_s1"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("long").alias("w_s2"),
    )
    nd = F.col("w_n").cast("double")
    s1 = F.col("w_s1").cast("double")
    s2 = F.col("w_s2").cast("double")
    mean = s1 / nd
    sd = F.sqrt(nd * s2 - s1 * s1) / nd
    return agg.select(
        "conv_id",
        "bucket_ts",
        F.col("v").alias("value"),
        "w_n",
        mean.alias("mean"),
        sd.alias("sd"),
        (mean + F.lit(float(k)) * sd).alias("upper"),
        (mean - F.lit(float(k)) * sd).alias("lower"),
    )


def irate_sql() -> str:
    """The ONE float expression for the instantaneous rate over the
    exact int64 column last_gap_us: events/second between the hour's
    last two arrivals; NULL when they share a timestamp."""
    return (
        "CASE WHEN last_gap_us > 0 THEN"
        " round(1000000.0 / CAST(last_gap_us AS DOUBLE), 6) END"
    )


def hourly_irate(transcripts: DataFrame) -> DataFrame:
    """PromQL-style ``irate`` per hour: the instantaneous arrival rate
    implied by the gap between the hour's LAST TWO events — the
    end-of-window spot rate that reacts immediately where the hour's
    mean rate lags a burst by up to an hour.

    The hour's events are totally ordered by (ts, conv_id, turn_idx)
    — the house stable order, so timestamp ties never make the "last
    two" ambiguous — and the top-2 window keeps one exchange keyed on
    the hour. ``last_gap_us`` is exact int64; the reciprocal is one
    shared float (:func:`irate_sql`), NULL when the two share a
    timestamp.

    Emits ``hour_ts, n_points, last_ts, last_gap_us, irate_eps`` for
    hours with >= 2 events.
    """
    from pyspark.sql import Window

    base = transcripts.select(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        "ts",
        "conv_id",
        "turn_idx",
    )
    w = Window.partitionBy("hour_ts").orderBy(
        F.desc("ts"), F.desc("conv_id"), F.desc("turn_idx")
    )
    w_tot = Window.partitionBy("hour_ts")
    ranked = base.select(
        "hour_ts",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_tot).alias("n_points"),
    ).where(F.col("rn") <= 2)
    agg = (
        ranked.groupBy("hour_ts")
        .agg(
            F.max("n_points").cast("long").alias("n_points"),
            F.max(F.when(F.col("rn") == 1, F.col("ts"))).alias("last_ts"),
            (
                F.max(F.when(F.col("rn") == 1, F.unix_micros(F.col("ts"))))
                - F.max(F.when(F.col("rn") == 2, F.unix_micros(F.col("ts"))))
            )
            .cast("long")
            .alias("last_gap_us"),
        )
        .filter(F.col("n_points") >= 2)
    )
    return agg.select(
        "hour_ts",
        "n_points",
        "last_ts",
        "last_gap_us",
        F.expr(irate_sql()).alias("irate_eps"),
    )
