"""Out-of-order arrival diagnostics: how late do events arrive?

Streaming design aid for the watermark knobs in
aroma_spark/streaming/stream.py: a watermark of W keeps state for W of
event time, so W must dominate the observed lateness distribution or
late rows are dropped. This module MEASURES that distribution on the
batch corpus — the profiling every Structured Streaming deployment runs
before picking ``withWatermark``.

Definition: arrival order is the ingest sequence (``event_id`` — the
synth/warehouse ingest key is monotone in arrival; a real pipeline uses
its ingest offset). An event's lateness is how far event time sits
behind the per-conversation high-water mark at its arrival:

    lateness_us = max(epoch_us(ts)) over arrivals-so-far  -  epoch_us(ts)

computed per conversation because that is the state key the engine's
stateful operators (session windows, LOCF gap-fill,
``applyInPandasWithState``) evict by. A global high-water mark would
serialize one cumulative window over the whole stream; the per-key form
rides the same (conv_id) hash exchange every other operator shares and
upper-bounds the per-key state any watermark must cover.

Everything is exact int64 (microsecond diffs, counts, sums) — the
DuckDB twin matches bit-for-bit.

No reference analog (the reference is batch-only); this is the
streaming tier's operational complement, same family as the
session/burst operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def arrival_lateness(events: DataFrame) -> DataFrame:
    """Per event: lateness vs the per-conversation high-water mark.

    Input is the raw ``events`` table (event_id, ts, user_id, ...).
    Returns (event_id, conv_id, ts, lateness_us) where lateness_us = 0
    for in-order arrivals. One window pass over the (user_id) exchange,
    cumulative-max frame — O(1) state per row.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    return events.select(
        "event_id",
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        (F.max(t).over(w) - t).cast("long").alias("lateness_us"),
    )


def lateness_profile(events: DataFrame, unit: str = "hour") -> DataFrame:
    """Lateness distribution per event-time bucket — the watermark-sizing
    report: pick W >= the observed max (or a documented quantile) of
    ``max_lateness_us``.

    Returns per bucket: n_events, n_late (lateness > 0), n_convs_late
    (distinct conversations with a late arrival), max_lateness_us,
    sum_lateness_us. All exact integers; one aggregation with map-side
    combine on top of the :func:`arrival_lateness` window.
    """
    late = arrival_lateness(events)
    is_late = F.col("lateness_us") > 0
    return late.groupBy(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(is_late.cast("long")).cast("long").alias("n_late"),
        F.countDistinct(F.when(is_late, F.col("conv_id")))
        .cast("long")
        .alias("n_convs_late"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
        F.sum("lateness_us").cast("long").alias("sum_lateness_us"),
    )
