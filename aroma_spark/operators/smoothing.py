"""Exponentially-weighted smoothing over per-conversation series.

EWMA is the classic irregular-series smoother (monitoring baselines,
trend extraction before anomaly rules). Its recurrence

    y_0 = x_0
    y_t = (1 - alpha) * y_{t-1} + alpha * x_t

is inherently sequential per key — the one class of operator Catalyst
cannot express (a running product has no algebraic partial). The engine
confines it to Arrow ``applyInPandas`` groups keyed on conv_id: linear
time inside a conversation, conversations embarrassingly parallel — the
same confinement pattern as ``packing.pack_nextfit``'s fill recurrence.
Skew note: a pathological 10^8-turn conversation serializes in one
task, the documented limit shared by every per-conversation window in
this engine (operators/rolling.py's skew note).

Cross-engine exactness: the recurrence is evaluated in Python floats
(IEEE-754 doubles) with the literal expression order
``(1 - alpha) * y + alpha * x`` — the DuckDB twin's recursive CTE
spells the identical expression, so both engines execute the same
sequence of correctly-rounded operations and the trajectories match
bit-for-bit (no rounding fudge needed).

No reference analog (the reference smooths nothing); natural companion
of the north_star's gap-fill + rollup telemetry tiers.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def ewma_smooth(
    signals: DataFrame,
    alpha: float = 0.3,
    value_col: str = "text_len",
) -> DataFrame:
    """Per-conversation EWMA of ``value_col`` in ``turn_idx`` order.

    Returns (conv_id, turn_idx, ts, value, ewma). ``alpha`` in (0, 1]:
    the weight of the newest sample.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    one_minus = 1.0 - alpha

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort").reset_index(
            drop=True
        )
        out = []
        y = None
        for x in pdf["value"]:
            x = float(x)
            y = x if y is None else one_minus * y + alpha * x
            out.append(y)
        pdf["ewma"] = pd.Series(out, dtype="float64")
        return pdf

    src = signals.selectExpr(
        "conv_id",
        "turn_idx",
        "ts",
        f"CAST({value_col} AS DOUBLE) AS value",
    )
    return src.groupBy("conv_id").applyInPandas(
        smooth,
        "conv_id string, turn_idx int, ts timestamp, value double, "
        "ewma double",
    )


def holt_smooth(
    signals: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    value_col: str = "text_len",
) -> DataFrame:
    """Per-conversation Holt double-exponential smoothing (level +
    trend) in ``turn_idx`` order — the trend-aware upgrade of
    :func:`ewma_smooth` (Holt 1957 / Winters 1960, public literature).

        level_t = alpha*x_t + (1-alpha)*(level_{t-1} + trend_{t-1})
        trend_t = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}

    Initialization: level_0 = x_0, trend_0 = 0 (no lookahead — the
    first turn carries no trend evidence; documented difference from
    the x_1 - x_0 init some texts use, which would make the first row
    depend on the second).

    Determinism: the recurrences are evaluated in the exact literal
    order written above — IEEE-754 multiply/add are correctly rounded,
    so the DuckDB twin (a recursive CTE spelling the identical
    expressions) reproduces every intermediate bit-for-bit, same as the
    EWMA oracle. Sequential per conversation by nature, so it runs in
    Arrow conversation groups like :func:`ewma_smooth`; conversations
    fan out across the cluster on the canonical conv_id exchange.

    Returns (conv_id, turn_idx, ts, value, level, trend).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort").reset_index(
            drop=True
        )
        levels = []
        trends = []
        lvl = trd = None
        for x in pdf["value"]:
            x = float(x)
            if lvl is None:
                lvl, trd = x, 0.0
            else:
                prev = lvl
                lvl = alpha * x + one_minus_a * (lvl + trd)
                trd = beta * (lvl - prev) + one_minus_b * trd
            levels.append(lvl)
            trends.append(trd)
        pdf["level"] = pd.Series(levels, dtype="float64")
        pdf["trend"] = pd.Series(trends, dtype="float64")
        return pdf

    src = signals.selectExpr(
        "conv_id",
        "turn_idx",
        "ts",
        f"CAST({value_col} AS DOUBLE) AS value",
    )
    return src.groupBy("conv_id").applyInPandas(
        smooth,
        "conv_id string, turn_idx int, ts timestamp, value double, "
        "level double, trend double",
    )
