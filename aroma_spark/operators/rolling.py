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
