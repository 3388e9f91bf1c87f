"""Cohort / engagement analytics over the transcript corpus: cohort
retention grids, rolling active-entity counts, ordered funnels.

The product-analytics layer every event warehouse ends up exposing
("of the conversations that started in week 1, how many were still
active in week 3?", "what is the 7-day active count per day?", "how
many conversations progress view -> click -> purchase in order?").
House discipline throughout (see operators/stats.py): everything
shuffled or summed is an exact int64/date — no floats anywhere in this
module — so the DuckDB twins hash-match bit-for-bit.

No reference analog (the reference prepares per-sequence tensors and
never asks corpus-level engagement questions); natural extension of the
north_star's rollup family over the same canonical transcript shape
(reference src/aroma/datasets/multithumos.py:520-521 for the stable
ordering these ride on).

Scale shapes (10^12 turns / 1000 executors):

- ``cohort_retention``: one aggregation per conversation (first-day),
  one distinct over (conv, day) — both ride the canonical conv_id
  exchange — a co-partitioned join on conv_id, then ONE map-side
  combinable aggregation whose output is |days|^2 / 2 rows (a 3-year
  corpus is ~600k rows). The corpus is touched once.
- ``rolling_active_counts``: the exact distinct-entities-in-trailing-
  window count. Dedup to (conv, day) first — the explode multiplies
  the DEDUPED row count by window_days (bounded, e.g. 7), never the
  raw turn count — then one count-distinct per emitted day. The
  classic sketch alternative (HLL per day, union over the window) is
  already available via ``sketches.hll``; this operator is the exact
  path and the oracle for it.
- ``funnel_steps``: k chained conditional aggregations on the SAME
  conv_id partitioning (k = number of steps, each a co-partitioned
  join — Catalyst inserts no new exchange after the first), then one
  tiny k-row summary. Strict in-order matching uses ``turn_idx``,
  which is total within a conversation and consistent with (ts,
  event_id) by construction — no timestamp tie ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(transcripts: DataFrame) -> DataFrame:
    """(cohort_day, offset_day) -> number of cohort conversations active
    offset_day days after their first activity.

    Returns columns ``cohort_day`` (timestamp, day-truncated),
    ``offset_day`` (int, >= 0), ``n_convs`` (long). Row (c, 0) is the
    cohort size; retention rate is n_convs / cohort size — left to the
    caller so the table stays pure integers (exact re-aggregation, and
    the rate denominator is a self-join away).
    """
    day = F.date_trunc("day", F.col("ts"))
    first_day = transcripts.groupBy("conv_id").agg(
        F.min(day).alias("cohort_day")
    )
    activity = transcripts.select(
        "conv_id", day.alias("active_day")
    ).distinct()
    joined = activity.join(first_day, "conv_id")
    return joined.groupBy(
        "cohort_day",
        F.datediff(F.col("active_day"), F.col("cohort_day"))
        .cast("int")
        .alias("offset_day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_convs"))


def rolling_active_counts(
    transcripts: DataFrame, window_days: int = 7
) -> DataFrame:
    """Exact trailing-window active-conversation counts (the WAU/MAU
    family): for each day d, the number of distinct conversations with
    any activity in [d - window_days + 1, d].

    Implementation: dedup to (conv_id, active_day), then each activity
    day CONTRIBUTES to the ``window_days`` window-end days it falls
    inside (one bounded ``sequence`` explode — fan-out is window_days
    x the deduped row count, independent of turn volume), then one
    exact count-distinct per window-end day. Window-end days beyond
    the corpus maximum are emitted too (they are real trailing windows
    that happen to end after the last event); callers slice as needed
    and the DuckDB twin reproduces them identically.

    Returns ``window_end_day`` (timestamp), ``n_active`` (long).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.date_trunc("day", F.col("ts"))
    activity = transcripts.select(
        "conv_id", day.alias("active_day")
    ).distinct()
    ends = activity.select(
        "conv_id",
        F.explode(
            F.sequence(
                F.col("active_day"),
                F.col("active_day")
                + F.expr(f"INTERVAL {int(window_days) - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("window_end_day"),
    )
    return ends.groupBy("window_end_day").agg(
        F.countDistinct("conv_id").cast("long").alias("n_active")
    )


def funnel_steps(transcripts: DataFrame, steps: list[str]) -> DataFrame:
    """Strict ordered funnel over the ``role`` column: a conversation
    reaches step k when it contains the step-k role STRICTLY AFTER the
    turn that satisfied step k-1 (first-match semantics, the standard
    product-funnel definition). Matching uses ``turn_idx`` — the stable
    (ts, event_id) total order — so simultaneous-timestamp ties are
    deterministic.

    Returns one row per step that at least one conversation reached:
    ``step`` (int, 1-based), ``role`` (string), ``n_convs`` (long).
    Counts are non-increasing in ``step`` by construction. Fully lazy
    (one tiny k-row aggregation over :func:`funnel_matches` — no driver
    counts); the role label joins in from a broadcast k-row literal.
    """
    matches = funnel_matches(transcripts, steps)
    labels = transcripts.sparkSession.createDataFrame(
        [(i + 1, r) for i, r in enumerate(steps)], "step int, role string"
    )
    counts = matches.groupBy("step").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    return counts.join(F.broadcast(labels), "step").select(
        "step", "role", "n_convs"
    )


def funnel_matches(transcripts: DataFrame, steps: list[str]) -> DataFrame:
    """Per-conversation funnel match table: one row per (conversation,
    reached step) with the matching turn_idx, suitable for joining back
    against the corpus or aggregating arbitrarily
    (:func:`funnel_steps` is its k-row summary).

    Returns ``conv_id``, ``step`` (int, 1-based), ``match_idx`` (int,
    the turn index that satisfied the step).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        transcripts.where(F.col("role") == steps[0])
        .groupBy("conv_id")
        .agg(F.min("turn_idx").alias("match_idx"))
        .select("conv_id", F.lit(1).alias("step"), "match_idx")
    )
    out = reached
    for i, role in enumerate(steps[1:], start=2):
        reached = (
            transcripts.where(F.col("role") == role)
            .join(reached.select("conv_id", "match_idx"), "conv_id")
            .where(F.col("turn_idx") > F.col("match_idx"))
            .groupBy("conv_id")
            .agg(F.min("turn_idx").alias("match_idx"))
            .select("conv_id", F.lit(i).alias("step"), "match_idx")
        )
        out = out.unionByName(reached)
    return out
