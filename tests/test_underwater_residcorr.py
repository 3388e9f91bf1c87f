"""Goldens for the drawdown-duration/model-adequacy pair
(operators/seqshape.py, operators/anomaly.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.anomaly import residual_autocorr_hourly
from aroma_spark.operators.seqshape import underwater_streaks


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, text_len, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _conv(values, conv="a"):
    return [
        (conv, i, v, f"2024-01-01 0{i % 10}:00:00")
        for i, v in enumerate(values)
    ]


def test_underwater_hand_computed(spark):
    # [5,3,4,6,2,1]: underwater at t1,t2 (below 5) and t4,t5 (below 6)
    r = underwater_streaks(_sig(spark, _conv([5, 3, 4, 6, 2, 1]))).collect()[0]
    assert (r["n_turns"], r["n_underwater"]) == (6, 4)
    assert (r["n_drawdowns"], r["max_drawdown_len"]) == (2, 2)


def test_underwater_monotone_none(spark):
    r = underwater_streaks(_sig(spark, _conv([1, 2, 3]))).collect()[0]
    assert (r["n_underwater"], r["n_drawdowns"], r["max_drawdown_len"]) == (0, 0, 0)


def test_underwater_plateau_not_under(spark):
    # equal to the running max is NOT underwater (strict <)
    r = underwater_streaks(_sig(spark, _conv([5, 5, 4]))).collect()[0]
    assert (r["n_underwater"], r["n_drawdowns"]) == (1, 1)


def test_underwater_long_slump(spark):
    # peak then never recovers: one island of length 4
    r = underwater_streaks(_sig(spark, _conv([9, 1, 2, 3, 4]))).collect()[0]
    assert (r["n_drawdowns"], r["max_drawdown_len"]) == (1, 4)


# ------------------------------------------------ residual autocorr


def _hours(spark, day_counts):
    """day_counts = {day: [count for hod 0, count for hod 1, ...]}."""
    rows = []
    for day, counts in day_counts.items():
        for h, c in enumerate(counts):
            for k in range(c):
                rows.append((f"{day}h{h}k{k}", 0, 1, f"{day} {h:02d}:{k:02d}:00"))
    return _sig(spark, rows)


def test_residual_autocorr_hand_computed(spark):
    # hod medians 4 and 4; residuals in hour order:
    # -2,-2, 0,0, 2,2 -> 5 lag-1 pairs, r = 44/56
    sig = _hours(
        spark,
        {"2024-01-01": [2, 2], "2024-01-02": [4, 4], "2024-01-03": [6, 6]},
    )
    r = residual_autocorr_hourly(sig).collect()[0]
    assert r["n_pairs"] == 5
    assert (r["sx"], r["sy"], r["sxy"], r["sxx"], r["syy"]) == (-2, 2, 8, 12, 12)
    assert r["autocorr"] == round(44 / 56, 6)


def test_residual_autocorr_white_after_perfect_seasonality(spark):
    # identical days: residuals all zero -> degenerate -> NULL
    sig = _hours(
        spark,
        {"2024-01-01": [1, 5], "2024-01-02": [1, 5], "2024-01-03": [1, 5]},
    )
    r = residual_autocorr_hourly(sig).collect()[0]
    assert r["autocorr"] is None
