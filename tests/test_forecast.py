"""Goldens for the forecast/long-memory wave: seasonal-naive vs naive
hourly backtest and the rescaled-range R/S statistic
(operators/forecast.py). Every expected value is hand-computed."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.forecast import rs_range, seasonal_backtest_daily


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, text_len, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _hour_counts(day, counts):
    """counts[i] rows in hour i of the given day."""
    rows = []
    for h, c in enumerate(counts):
        for k in range(c):
            rows.append((f"{day}-h{h}", k, 1, f"{day} {h:02d}:{k:02d}:00"))
    return rows


# ------------------------------------------------------------ backtest


def test_backtest_hand_computed(spark):
    # day1 hours [2,3,4], day2 hours [4,3,5].
    # day1: no previous day -> cnt_seasonal=0 -> excluded.
    # day2 seasonal: |4-2|+|3-3|+|5-4| = 3 over 3 pairs;
    # day2 naive: |3-4|+|5-3| = 3 over 2 pairs;
    # ratio = (3/3)/(3/2) = 0.666667
    rows = _hour_counts("2024-01-01", [2, 3, 4]) + _hour_counts(
        "2024-01-02", [4, 3, 5]
    )
    out = seasonal_backtest_daily(_sig(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["day_ts"].day == 2
    assert (r["n_hours"], r["sae_seasonal"], r["cnt_seasonal"]) == (3, 3, 3)
    assert (r["sae_naive"], r["cnt_naive"]) == (3, 2)
    assert r["mase_like"] == 0.666667


def test_backtest_perfect_seasonality(spark):
    # identical days -> seasonal error 0, ratio 0
    rows = _hour_counts("2024-01-01", [1, 5, 1]) + _hour_counts(
        "2024-01-02", [1, 5, 1]
    )
    r = seasonal_backtest_daily(_sig(spark, rows)).collect()[0]
    assert (r["sae_seasonal"], r["mase_like"]) == (0, 0.0)


def test_backtest_null_when_naive_zero(spark):
    # flat day -> naive error 0 -> ratio undefined
    rows = _hour_counts("2024-01-01", [2, 2]) + _hour_counts(
        "2024-01-02", [3, 2]
    )
    r = seasonal_backtest_daily(_sig(spark, rows)).collect()[0]
    assert r["sae_naive"] == 1  # |2-3| between the two day-2 hours
    rows2 = _hour_counts("2024-01-01", [2, 2]) + _hour_counts(
        "2024-01-02", [3, 3]
    )
    r2 = seasonal_backtest_daily(_sig(spark, rows2)).collect()[0]
    assert (r2["sae_naive"], r2["mase_like"]) == (0, None)


def test_backtest_hour_gap_alignment(spark):
    # day2 has hours 0 and 2 only: naive pair (2 vs 1) missing, so
    # cnt_naive counts only... no h-1h neighbor at all -> excluded
    rows = _hour_counts("2024-01-01", [1, 1, 1]) + [
        ("c0", 0, 1, "2024-01-02 00:00:00"),
        ("c2", 0, 1, "2024-01-02 02:00:00"),
    ]
    out = seasonal_backtest_daily(_sig(spark, rows))
    days = {r["day_ts"].day: r for r in out.collect()}
    # day2: seasonal pairs exist (h0, h2), naive pairs none -> excluded
    assert 2 not in days


# ------------------------------------------------------------------ R/S


def test_rs_hand_computed(spark):
    # [1,2,3,4]: S=10, Q=30, P=[1,3,6,10], D'=4P-10k=[-6,-8,-6,0]
    # r_scaled = 0-(-8) = 8; sigma = sqrt((30-25)/4) = sqrt(1.25)
    # rs = 8/(4*1.118034) = 1.788854
    rows = [("a", i, v, f"2024-01-01 0{i}:00:00") for i, v in enumerate([1, 2, 3, 4])]
    r = rs_range(_sig(spark, rows)).collect()[0]
    assert (r["n_points"], r["s_sum"], r["q_sum"], r["r_scaled"]) == (4, 10, 30, 8)
    assert r["rs"] == 1.788854


def test_rs_antipersistent_alternation(spark):
    # [1,3,1,3]: S=8, Q=20, P=[1,4,5,8], D'=4P-8k=[-4,0,-4,0]
    # r_scaled=4; sigma=sqrt((20-16)/4)=1; rs = 4/4 = 1.0
    rows = [("a", i, v, f"2024-01-01 0{i}:00:00") for i, v in enumerate([1, 3, 1, 3])]
    r = rs_range(_sig(spark, rows)).collect()[0]
    assert (r["r_scaled"], r["rs"]) == (4, 1.0)


def test_rs_constant_null(spark):
    rows = [("a", i, 5, f"2024-01-01 0{i}:00:00") for i in range(4)]
    r = rs_range(_sig(spark, rows)).collect()[0]
    assert (r["r_scaled"], r["rs"]) == (0, None)


def test_rs_min_turns(spark):
    rows = [("a", i, i, f"2024-01-01 0{i}:00:00") for i in range(3)]
    assert rs_range(_sig(spark, rows)).count() == 0


def test_backtest_weekly_horizon(spark):
    # season_hours=2 on a 3-hour-per-day toy: hour h pairs with h-2
    rows = _hour_counts("2024-01-01", [2, 3, 4, 6])
    out = seasonal_backtest_daily(_sig(spark, rows), season_hours=2).collect()
    assert len(out) == 1
    r = out[0]
    # seasonal pairs: h2 vs h0 |4-2|=2, h3 vs h1 |6-3|=3 -> sae 5/2
    assert (r["sae_seasonal"], r["cnt_seasonal"]) == (5, 2)
    # naive: |3-2|+|4-3|+|6-4| = 4 over 3
    assert (r["sae_naive"], r["cnt_naive"]) == (4, 3)
