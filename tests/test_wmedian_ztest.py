"""Goldens for the weighted-median/rate-test pair
(operators/robust.py, operators/nonparam.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.nonparam import tool_rate_ztest_daily
from aroma_spark.operators.robust import weighted_median_daily


def _wm_sig(spark, rows):
    """rows = (conv_id, turn_idx, inter_time_us, text_len, ts)."""
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, inter_time_us long,"
        " text_len long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_wmedian_hand_computed(spark):
    # (v,w) = (10,1),(20,3),(30,2), W=6: crossing at v=20
    # (2*(4-3)=2 < 6 <= 2*4=8)
    rows = [
        ("a", 0, 10, 1, "2024-01-01 00:00:00"),
        ("a", 1, 20, 3, "2024-01-01 01:00:00"),
        ("a", 2, 30, 2, "2024-01-01 02:00:00"),
    ]
    r = weighted_median_daily(_wm_sig(spark, rows)).collect()[0]
    assert (r["n_turns"], r["total_weight"], r["wmedian"]) == (3, 6, 20)


def test_wmedian_diverges_from_plain_median(spark):
    # (10,1),(100,9): the token-weighted median is 100 even though
    # the turn-count lower median would be 10
    rows = [
        ("a", 0, 10, 1, "2024-01-01 00:00:00"),
        ("a", 1, 100, 9, "2024-01-01 01:00:00"),
    ]
    r = weighted_median_daily(_wm_sig(spark, rows)).collect()[0]
    assert r["wmedian"] == 100


def test_wmedian_zero_weight_rows_skipped(spark):
    rows = [
        ("a", 0, 5, 0, "2024-01-01 00:00:00"),
        ("a", 1, 7, 4, "2024-01-01 01:00:00"),
    ]
    r = weighted_median_daily(_wm_sig(spark, rows)).collect()[0]
    assert (r["total_weight"], r["wmedian"]) == (4, 7)


def test_wmedian_all_zero_weight_day_dropped(spark):
    rows = [("a", 0, 5, 0, "2024-01-01 00:00:00")]
    assert weighted_median_daily(_wm_sig(spark, rows)).count() == 0


# -------------------------------------------------------------- z-test


def _zt_sig(spark, day_specs):
    """day_specs = {day: (n, a)} — n turns of which a are tool calls."""
    rows = []
    for day, (n, a) in day_specs.items():
        for k in range(n):
            rows.append(
                (f"{day}k{k}", k, 1 if k < a else 0, f"{day} {k % 24:02d}:00:00")
            )
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_call long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_ztest_hand_computed(spark):
    sig = _zt_sig(spark, {"2024-01-01": (10, 2), "2024-01-02": (10, 5)})
    r = tool_rate_ztest_daily(sig).collect()[0]
    assert (r["n_prev"], r["a_prev"], r["n_cur"], r["a_cur"]) == (10, 2, 10, 5)
    p = 7.0 / 20.0
    expect = round(
        (5.0 / 10.0 - 2.0 / 10.0)
        / math.sqrt(p * (1.0 - p) * (1.0 / 10.0 + 1.0 / 10.0)),
        6,
    )
    assert r["z"] == expect
    assert r["z"] > 1.4


def test_ztest_no_change_zero(spark):
    sig = _zt_sig(spark, {"2024-01-01": (8, 4), "2024-01-02": (8, 4)})
    r = tool_rate_ztest_daily(sig).collect()[0]
    assert r["z"] == 0.0


def test_ztest_degenerate_null(spark):
    # zero tool calls on both days -> pooled p = 0 -> undefined
    sig = _zt_sig(spark, {"2024-01-01": (5, 0), "2024-01-02": (5, 0)})
    r = tool_rate_ztest_daily(sig).collect()[0]
    assert r["z"] is None


def test_ztest_gap_days_skipped(spark):
    sig = _zt_sig(spark, {"2024-01-01": (5, 1), "2024-01-03": (5, 1)})
    assert tool_rate_ztest_daily(sig).count() == 0


# -------------------------------------------------- trimmed mean/mode


def test_trimmed_mean_hand_computed(spark):
    from aroma_spark.operators.robust import trimmed_mean_daily

    # 10 values 0..9 with one outlier replacing 9 -> [0..8, 1000]:
    # lo = 10 DIV 10 = 1 -> drop min (0) and max (1000);
    # kept = 1..8, sum 36, mean 4.5
    rows = [
        ("a", i, v, 1, f"2024-01-01 0{i}:00:00")
        for i, v in enumerate([0, 1, 2, 3, 4, 5, 6, 7, 8, 1000])
    ]
    sig = _wm_sig(spark, rows)
    r = trimmed_mean_daily(sig).collect()[0]
    assert (r["n_points"], r["n_trimmed_each"], r["n_kept"]) == (10, 1, 8)
    assert (r["sum_kept"], r["trimmed_mean_us"]) == (36, 4)


def test_trimmed_mean_small_day_keeps_all(spark):
    from aroma_spark.operators.robust import trimmed_mean_daily

    # n=5 -> lo = 0 -> plain mean
    rows = [
        ("a", i, v, 1, f"2024-01-01 0{i}:00:00")
        for i, v in enumerate([10, 20, 30, 40, 100])
    ]
    r = trimmed_mean_daily(_wm_sig(spark, rows)).collect()[0]
    assert (r["n_trimmed_each"], r["n_kept"]) == (0, 5)
    assert r["trimmed_mean_us"] == 40


def test_mode_hand_computed(spark):
    from aroma_spark.operators.robust import mode_daily

    # values [7,7,7,3,3,9]: mode 7 (count 3), share 0.5
    rows = [
        ("a", i, 1, v, f"2024-01-01 0{i}:00:00")
        for i, v in enumerate([7, 7, 7, 3, 3, 9])
    ]
    r = mode_daily(_wm_sig(spark, rows)).collect()[0]
    assert (r["n_points"], r["n_distinct"]) == (6, 3)
    assert (r["mode_value"], r["mode_count"], r["mode_share"]) == (7, 3, 0.5)


def test_mode_tie_smallest_value(spark):
    from aroma_spark.operators.robust import mode_daily

    # [5,5,2,2] -> tie at count 2 -> mode 2
    rows = [
        ("a", i, 1, v, f"2024-01-01 0{i}:00:00")
        for i, v in enumerate([5, 5, 2, 2])
    ]
    r = mode_daily(_wm_sig(spark, rows)).collect()[0]
    assert (r["mode_value"], r["mode_count"]) == (2, 2)
