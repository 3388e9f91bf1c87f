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


#: exact micro-seconds per hour; all overlap arithmetic is int64 µs so
#: the Spark plan and the DuckDB twin agree bit-for-bit
HOUR_US = 3_600_000_000


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
    # one explode, not a self-union: a union of two selects over the
    # same aggregate evaluates the whole upstream (scan + conv_id
    # exchange + aggregate) TWICE — explode(array(...)) emits both
    # boundary events from the single pass
    ev = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_ts").alias("ts"),
                    F.lit(1).cast("long").alias("delta"),
                ),
                F.struct(
                    F.col("end_ts").alias("ts"),
                    F.lit(-1).cast("long").alias("delta"),
                ),
            )
        ).alias("e")
    ).select("e.ts", "e.delta")
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


def hourly_utilization(transcripts: DataFrame) -> DataFrame:
    """(hour_ts, busy_us, n_active, avg_concurrency) per hour of span.

    ``busy_us``: total conversation-active microseconds inside the hour
    (sum over conversations of the overlap between the conversation's
    closed activity interval and the hour window). ``n_active``: number
    of conversations whose interval touches the hour — by construction
    equal to :func:`hourly_concurrency`'s ``active_convs`` (independent
    derivations, useful as a cross-check). ``avg_concurrency`` =
    busy_us / 3.6e9: the time-average number of active conversations,
    the integral the peak (``max_concurrent``) bounds from above.

    Physical shape: each interval explodes to the hours it covers —
    row count bounded by interval DURATION (calendar), never by turn
    volume; a year-long conversation is 8,760 rows. One explode + one
    hour-keyed aggregation (map-side combinable) + the same calendar
    spine as :func:`hourly_concurrency`. Overlap arithmetic is exact
    int64 µs; the single float division happens once, in the final
    projection, on identical int64 inputs in both engines.
    """
    iv = conversation_intervals(transcripts)
    hours = iv.select(
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "start_ts"),
                F.date_trunc("hour", "end_ts"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_ts"),
    )
    ov = hours.select(
        "hour_ts",
        (
            F.least(
                F.unix_micros("end_ts"),
                F.unix_micros("hour_ts") + F.lit(HOUR_US),
            )
            - F.greatest(
                F.unix_micros("start_ts"), F.unix_micros("hour_ts")
            )
        ).alias("busy_us"),
    )
    agg = ov.groupBy("hour_ts").agg(
        F.sum("busy_us").alias("busy_us"),
        F.count(F.lit(1)).cast("long").alias("n_active"),
    )
    spine = hours.agg(
        F.min("hour_ts").alias("h0"), F.max("hour_ts").alias("h1")
    ).select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    return (
        spine.join(agg, "hour_ts", "left")
        .select(
            "hour_ts",
            F.coalesce(F.col("busy_us"), F.lit(0))
            .cast("long")
            .alias("busy_us"),
            F.coalesce(F.col("n_active"), F.lit(0))
            .cast("long")
            .alias("n_active"),
        )
        .withColumn(
            "avg_concurrency",
            F.col("busy_us") / F.lit(float(HOUR_US)),
        )
    )


def peak_factor_sql() -> str:
    """The ONE float expression for the hourly peak factor over exact
    int64 columns peak_minute, n_minutes, total: peak-to-mean ratio
    = peak * n_minutes / total, cross-multiplied so the only division
    is the final one. total > 0 always (hours only exist because rows
    do)."""
    return (
        "round(CAST(peak_minute AS DOUBLE) * CAST(n_minutes AS DOUBLE)"
        " / CAST(total AS DOUBLE), 6)"
    )


def hourly_peak_factor(transcripts: DataFrame) -> DataFrame:
    """Peak-to-mean load ratio inside each hour: the busiest minute's
    turn count over the mean minute count (active minutes only) — the
    burst-headroom number capacity planning actually sizes against
    (a 1.0 hour is flat; a 30x hour needs 30x the steady-state
    provisioning).

    Two map-side-combinable aggregations — (minute) counts, then
    (hour) max/sum/count — and one shared float expression
    (:func:`peak_factor_sql`). The mean is over minutes WITH data;
    empty minutes are reported via ``n_minutes`` (60 - n_minutes are
    silent) rather than imputed as zeros, so the two engines never
    disagree about a synthetic row.

    Emits ``hour_ts, n_minutes, total, peak_minute, peak_factor``.
    """
    minutes = transcripts.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("minute_ts")
    ).agg(F.count("*").cast("long").alias("n"))
    hours = minutes.groupBy(
        F.date_trunc("hour", F.col("minute_ts")).alias("hour_ts")
    ).agg(
        F.count("*").cast("long").alias("n_minutes"),
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("peak_minute"),
    )
    return hours.select(
        "hour_ts",
        "n_minutes",
        "total",
        "peak_minute",
        F.expr(peak_factor_sql()).alias("peak_factor"),
    )


def value_area_daily(transcripts: DataFrame, pct_x10: int = 7) -> DataFrame:
    """Market-profile "value area" per day: how many minute buckets
    does it take to cover ``pct_x10``/10 (default 70%) of the day's
    volume, greedily from the busiest minute down? A day where 70% of
    load fits in a handful of minutes is spike-shaped; one that needs
    hundreds is flat — the locality summary behind cache sizing and
    autoscaler step policy.

    Minutes are ranked (count DESC, minute ASC — deterministic tie
    cut) and a bucket is in the value area while the cumulative
    volume BEFORE it is still under the target:
    ``10 * (cum - n) < pct_x10 * total`` — all int64, no division.
    The per-day minute table is calendar-bounded (1,440 rows/day), so
    the rank window is cheap at any corpus size.

    Emits ``day_ts, n_minutes, total, va_minutes, va_volume,
    top_share`` (top_share = busiest minute's volume fraction, the
    one shared float).
    """
    from pyspark.sql import Window

    minutes = transcripts.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("minute_ts")
    ).agg(F.count("*").cast("long").alias("n"))
    minutes = minutes.select(
        F.date_trunc("day", F.col("minute_ts")).alias("day"),
        "minute_ts",
        "n",
    )
    w_cum = (
        Window.partitionBy("day")
        .orderBy(F.col("n").desc(), F.col("minute_ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("day")
    stepped = minutes.select(
        "day",
        "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    included = (
        F.lit(10) * (F.col("cum") - F.col("n"))
        < F.lit(pct_x10) * F.col("total")
    )
    agg = stepped.groupBy("day").agg(
        F.count("*").cast("long").alias("n_minutes"),
        F.max("total").cast("long").alias("total"),
        F.sum(F.when(included, 1).otherwise(0)).cast("long").alias("va_minutes"),
        F.sum(F.when(included, F.col("n")).otherwise(0))
        .cast("long")
        .alias("va_volume"),
        F.max("n").cast("long").alias("top_n"),
    )
    return agg.select(
        F.col("day").alias("day_ts"),
        "n_minutes",
        "total",
        "va_minutes",
        "va_volume",
        F.expr(
            "round(CAST(top_n AS DOUBLE) / CAST(total AS DOUBLE), 6)"
        ).alias("top_share"),
    )


def hour_coverage_daily(signals: DataFrame) -> DataFrame:
    """Temporal coverage per day: how many of the 24 hours saw any
    turn at all — a day with 6 covered hours is a batch dump, not
    organic traffic; the load-shape smoke test before any hourly
    model is fit.

    One exact distinct over (day, hour) — map-side combinable, at
    most 24 rows per day survive the shuffle — then a |days|-row
    count. The share is one shared float over exact ints.

    Emits ``day_ts, n_active_hours, coverage``.
    """
    hours = signals.select(
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.hour("ts").cast("int").alias("hod"),
    ).distinct()
    agg = hours.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_hours")
    )
    return agg.select(
        "day_ts",
        "n_active_hours",
        F.expr(
            "round(CAST(n_active_hours AS DOUBLE) / 24.0, 6)"
        ).alias("coverage"),
    )


def turn_density_daily(signals: DataFrame) -> DataFrame:
    """Activity density per day: turns per active conversation-hour
    — high density is rapid-fire agents, low is sparse trickle; the
    intensity number next to hour_coverage_daily's breadth.

    Two map-side combinable aggregates over one scan shape: the
    daily turn count, and the distinct (conv, hour) count collapsed
    BEFORE its rollup. Exact int64; the density is one shared
    float.

    Emits ``day_ts, n_turns, n_conv_hours, density``.
    """
    turns = signals.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
    ch = (
        signals.select(
            F.date_trunc("day", F.col("ts")).alias("day_ts"),
            "conv_id",
            F.hour("ts").cast("int").alias("hod"),
        )
        .distinct()
        .groupBy("day_ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n_conv_hours"))
    )
    j = turns.join(ch, "day_ts")
    return j.select(
        "day_ts",
        "n_turns",
        "n_conv_hours",
        F.expr(
            "round(CAST(n_turns AS DOUBLE)"
            " / CAST(n_conv_hours AS DOUBLE), 6)"
        ).alias("density"),
    )


def conv_day_turns_hist(transcripts: DataFrame) -> DataFrame:
    """How much does a conversation do in a day? Power-of-two
    histogram of turns per (conversation, day) — the activity-grain
    distribution between hour_coverage's breadth and
    turn_density's intensity.

    Per-(conv, day) counts collapse map-side, integer bit-length
    bucketing, a ~15-row histogram with its share from a global
    window. Exact int64.

    Emits ``bucket, lo_turns, n_conv_days, sum_turns, share``.
    """
    from pyspark.sql import Window

    per = transcripts.groupBy(
        "conv_id", F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
    bucketed = per.select(
        (F.length(F.conv(F.col("n_turns"), 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        "n_turns",
    )
    hist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_conv_days"),
        F.sum("n_turns").cast("long").alias("sum_turns"),
    )
    # bounded global window: frame is the power-of-two bucket histogram
    # (<= 64 rows at any corpus size), not the conv-day table
    hist = hist.withColumn(
        "total",
        F.sum("n_conv_days").over(Window.partitionBy()).cast("long"),
    )
    return hist.select(
        "bucket",
        F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)").alias("lo_turns"),
        "n_conv_days",
        "sum_turns",
        F.expr(
            "round(CAST(n_conv_days AS DOUBLE) / CAST(total AS DOUBLE), 6)"
        ).alias("share"),
    )
