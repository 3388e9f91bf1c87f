"""Derived per-turn signals — the semantic core.

W1 inter-times (reference: src/aroma/preprocessing/intertimes.py:83-104):
per-sequence first difference of event times with the first element's
diff defined as 0 (the reference prepends ``time[first]`` before
``diff``). Here: ``ts - lag(ts) over (partition by conv_id order by
turn_idx)``, coalesced to 0 — computed in **integer microseconds**
(``unix_micros``) so every downstream aggregate is exact (no float
summation drift at 10^12 rows; the reference's float32 times,
src/aroma/datasets/breakfast.py:592-593, lose integer precision past
2^24 — we generalize rather than copy that).

F7 engine signals mandated by BASELINE.json north_star: text length and
tool-call indicator per turn.

All expressions are native ``pyspark.sql.functions`` — whole-stage
codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_signals(df: DataFrame) -> DataFrame:
    """Append (inter_time_us, text_len, tool_call) to a transcript frame.

    One window over (conv_id | turn_idx) — a single hash exchange on
    conv_id that downstream rollups (also keyed on conv_id) reuse without
    re-shuffling.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts_us = F.unix_micros(F.col("ts"))
    if "text" in df.columns:
        text_len = F.coalesce(F.length("text"), F.lit(0)).cast("long")
        carried = list(df.columns)
    else:
        # pruned frames (normalize_for_rollup) pre-compute text_len so
        # the payload never reaches the dedup exchange
        text_len = F.coalesce(F.col("text_len"), F.lit(0)).cast("long")
        carried = [c for c in df.columns if c != "text_len"]
    if "tool_call" in df.columns:
        # pruned frames also pre-compute tool_call (the tool string
        # itself never shuffles)
        tool_call = F.col("tool_call").cast("long")
        carried = [c for c in carried if c != "tool_call"]
    else:
        tool_call = (
            F.when(
                (F.col("tool").isNotNull()) & (F.col("tool") != ""),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
    return df.select(
        *carried,
        F.coalesce(ts_us - F.lag(ts_us, 1).over(w), F.lit(0))
        .cast("long")
        .alias("inter_time_us"),
        text_len.alias("text_len"),
        tool_call.alias("tool_call"),
    )


def with_signals_chunked(df: DataFrame) -> DataFrame:
    """Two-stage windowed signal computation for hot conversations.

    The plain window partitions by conv_id: a pathologically long
    conversation (Zipf head at 10^12 turns) sorts inside ONE task.
    Stage 1 windows over (conv_id, day) — bounded chunks, arbitrarily
    parallel. Stage 2 repairs each chunk's first inter-time with the
    previous chunk's last timestamp, carried through a window over the
    tiny per-chunk boundary table (one row per (conv, day)).

    Result is verified identical to :func:`with_signals` (the north
    rule's "salted repartitioning and two-stage windowed aggregation"
    applied to the window, not just the aggregate).
    """
    day = F.to_date("ts").alias("__day")
    base = df.select("*", day)
    w_chunk = Window.partitionBy("conv_id", "__day").orderBy("turn_idx")
    ts_us = F.unix_micros(F.col("ts"))

    stage1 = base.select(
        "*",
        (ts_us - F.lag(ts_us, 1).over(w_chunk)).alias("__intra"),
        F.row_number().over(w_chunk).alias("__rn"),
    )

    # boundary table: one row per chunk -> previous chunk's last ts
    bounds = (
        base.groupBy("conv_id", "__day")
        .agg(F.max(ts_us).alias("__last_us"), F.min(ts_us).alias("__first_us"))
    )
    w_conv = Window.partitionBy("conv_id").orderBy("__day")
    bounds = bounds.select(
        "conv_id",
        "__day",
        F.lag("__last_us", 1).over(w_conv).alias("__prev_last_us"),
    )

    out = stage1.join(bounds, ["conv_id", "__day"], "left")
    inter = (
        F.when(F.col("__rn") > 1, F.col("__intra"))
        .when(
            F.col("__prev_last_us").isNotNull(),
            F.unix_micros(F.col("ts")) - F.col("__prev_last_us"),
        )
        .otherwise(F.lit(0))
    )
    return out.select(
        *df.columns,
        inter.cast("long").alias("inter_time_us"),
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("text_len"),
        F.when((F.col("tool").isNotNull()) & (F.col("tool") != ""), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("tool_call"),
    )


def signals_padded_export(df: DataFrame, padding_value: float = float("nan")):
    """Parity export: ragged per-conversation sequences -> padded arrays.

    Reproduces the reference's ragged->padded batching
    (``from_sequences``; reference: src/aroma/datasets/breakfast.py:299-309,
    missing constants -1/NaN at breakfast.py:64-66) including W1a's
    documented garbage-at-pad-boundary behavior when diffing padded
    tensors (reference: src/aroma/preprocessing/intertimes.py:51-52;
    tests/unit/preprocessing/test_intertimes.py:46-56) — the parity
    harness re-pads and diffs to match those boundary values exactly.

    Relational form has no padding, so this is export-only:
    ``collect_list`` ordered by turn_idx, padded to the global max length.
    Returns (conv_id, n_turns, times array<double> padded).
    """
    agg = df.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("turn_idx"), F.unix_micros("ts").alias("us"))
            )
        ).alias("seq")
    )
    times = F.transform(F.col("seq"), lambda s: s["us"].cast("double") / 1e6)
    agg = agg.select("conv_id", times.alias("times"), F.size("seq").alias("n_turns"))
    max_len = agg.agg(F.max("n_turns")).collect()[0][0] or 0
    pad = F.array_repeat(F.lit(float(padding_value)), max_len)
    return agg.select(
        "conv_id",
        "n_turns",
        F.slice(F.concat(F.col("times"), pad), 1, max_len).alias("times_padded"),
    )
