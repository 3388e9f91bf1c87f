"""Interval concurrency analytics: how many conversations are active
at once, per hour.

A conversation occupies the closed interval [min(ts), max(ts)]. The
classic way to get "max concurrent at any instant" is a sweep-line —
+1 at each start, -1 at each end, running sum over the global event
order — but a single global running-sum window is ONE task in any
engine. This implementation is the distributed rewrite:

1. boundary events get bucketed by hour; the within-hour prefix sums
   run under a window PARTITIONED BY hour (parallel across hours);
2. the cross-hour carry-in is a running sum over the per-hour delta
   totals — a frame with one row per calendar hour, bounded by the
   time span (a year is 8,760 rows), never by data volume;
3. a complete hour spine (sequence + explode over the single min/max
   row) fills hours that contain no boundary event but carry active
   conversations across them.

Concurrency is a step function: inside an hour its values are
carry + prefix_i after each event, plus the initial plateau at
``carry`` before the first event — hence
``max_concurrent = carry + greatest(0, within_hour_max_prefix)``.
Ties: a start and an end at the same instant count as overlapping
(closed intervals), so +1 events order before -1; among equal
(ts, delta) events the prefix multiset — and therefore its max — is
order-invariant, which is what makes the result hash-deterministic.

No reference counterpart (the reference has no interval analytics);
the hour-bucketed prefix-sum shape is the same scan-share discipline
as the tier lattice (DESIGN_SCALE.md "Shuffle economy").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_intervals(transcripts: DataFrame) -> DataFrame:
    """Per-conversation closed activity interval: one aggregation on
    the conv_id exchange the pipeline already shares."""
    return transcripts.groupBy("conv_id").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
    )


def hourly_concurrency(transcripts: DataFrame) -> DataFrame:
    """(hour_ts, max_concurrent, active_convs) for every hour of the
    corpus span.

    ``max_concurrent``: maximum number of conversations simultaneously
    active at any instant of the hour. ``active_convs``: number of
    conversations active at ANY point of the hour (carry-in at the
    hour boundary + starts within the hour — ends already netted out
    of the carry).
    """
    iv = conversation_intervals(transcripts)
    ev = iv.select(
        F.col("start_ts").alias("ts"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        iv.select(
            F.col("end_ts").alias("ts"), F.lit(-1).cast("long").alias("delta")
        )
    )
    ev = ev.select(F.date_trunc("hour", "ts").alias("hour_ts"), "ts", "delta")

    # within-hour prefix sums: parallel across hours
    w_in = (
        Window.partitionBy("hour_ts")
        .orderBy(F.col("ts").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = ev.select(
        "hour_ts", "delta", F.sum("delta").over(w_in).alias("pref")
    )
    ha = run.groupBy("hour_ts").agg(
        F.max("pref").alias("within_max"),
        F.sum("delta").alias("hour_delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_starts"),
    )

    # complete hour spine from the single (min, max) row
    spine = (
        ev.agg(F.min("hour_ts").alias("h0"), F.max("hour_ts").alias("h1"))
        .select(
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts")
        )
    )

    # cross-hour carry: running sum over the tiny per-hour frame
    # (calendar-bounded — one row per hour of span — so the single-task
    # window is a few KB, not a data-volume scan)
    w_carry = Window.orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        spine.join(ha, "hour_ts", "left")
        .select(
            "hour_ts",
            F.coalesce(F.sum("hour_delta").over(w_carry), F.lit(0)).alias(
                "carry"
            ),
            F.greatest(
                F.lit(0), F.coalesce(F.col("within_max"), F.lit(0))
            ).alias("peak_in_hour"),
            F.coalesce(F.col("n_starts"), F.lit(0)).alias("n_starts"),
        )
        .select(
            "hour_ts",
            (F.col("carry") + F.col("peak_in_hour"))
            .cast("long")
            .alias("max_concurrent"),
            (F.col("carry") + F.col("n_starts"))
            .cast("long")
            .alias("active_convs"),
        )
    )
