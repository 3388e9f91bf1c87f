"""Goldens for the dispersion/engagement pair: Gini mean difference
per bucket (operators/distribution.py) and consecutive-day activity
streaks (operators/cohorts.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.cohorts import active_day_streaks
from aroma_spark.operators.distribution import gmd_by_bucket


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, text_len, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


# ------------------------------------------------------------- GMD


def test_gmd_hand_computed(spark):
    # [1,2,4]: pairwise |1-2|+|1-4|+|2-4| = 6; sorted identity:
    # (2*1-4)*1 + (2*2-4)*2 + (2*3-4)*4 = -2 + 0 + 8 = 6.
    # gmd = 6 / 3 pairs = 2.0
    rows = [("a", i, v, f"2024-01-01 0{i}:00:00") for i, v in enumerate([1, 2, 4])]
    r = gmd_by_bucket(_sig(spark, rows)).collect()[0]
    assert (r["n_points"], r["gmd_num"], r["gmd"]) == (3, 6, 2.0)


def test_gmd_constant_zero(spark):
    rows = [("a", i, 5, f"2024-01-01 0{i}:00:00") for i in range(4)]
    r = gmd_by_bucket(_sig(spark, rows)).collect()[0]
    assert (r["gmd_num"], r["gmd"]) == (0, 0.0)


def test_gmd_two_points(spark):
    rows = [
        ("a", 0, 10, "2024-01-01 00:00:00"),
        ("a", 1, 3, "2024-01-01 01:00:00"),
    ]
    r = gmd_by_bucket(_sig(spark, rows)).collect()[0]
    assert (r["n_points"], r["gmd_num"], r["gmd"]) == (2, 7, 7.0)


def test_gmd_singleton_bucket_dropped(spark):
    rows = [("a", 0, 10, "2024-01-01 00:00:00")]
    assert gmd_by_bucket(_sig(spark, rows)).count() == 0


def test_gmd_buckets_independent(spark):
    rows = [
        ("a", 0, 1, "2024-01-01 00:00:00"),
        ("a", 1, 5, "2024-01-01 01:00:00"),
        ("a", 2, 100, "2024-01-02 00:00:00"),
        ("a", 3, 100, "2024-01-02 01:00:00"),
    ]
    out = {r["bucket_ts"].day: r["gmd"] for r in gmd_by_bucket(_sig(spark, rows)).collect()}
    assert out == {1: 4.0, 2: 0.0}


# ---------------------------------------------------------- streaks


def test_streaks_hand_computed(spark):
    # days 1,2,3 | 5,6 | 10 -> streaks 3,2,1
    days = [1, 2, 3, 5, 6, 10]
    rows = [("a", i, 1, f"2024-01-{d:02d} 12:00:00") for i, d in enumerate(days)]
    r = active_day_streaks(_sig(spark, rows)).collect()[0]
    assert (r["n_active_days"], r["n_streaks"], r["max_streak_days"]) == (6, 3, 3)


def test_streaks_multiple_turns_one_day(spark):
    # many turns on the same day count once
    rows = [
        ("a", 0, 1, "2024-01-01 00:00:00"),
        ("a", 1, 1, "2024-01-01 23:00:00"),
        ("a", 2, 1, "2024-01-02 05:00:00"),
    ]
    r = active_day_streaks(_sig(spark, rows)).collect()[0]
    assert (r["n_active_days"], r["n_streaks"], r["max_streak_days"]) == (2, 1, 2)


def test_streaks_single_day(spark):
    rows = [("a", 0, 1, "2024-01-01 00:00:00")]
    r = active_day_streaks(_sig(spark, rows)).collect()[0]
    assert (r["n_active_days"], r["n_streaks"], r["max_streak_days"]) == (1, 1, 1)


def test_streaks_month_boundary(spark):
    # Jan 31 + Feb 1 are consecutive
    rows = [
        ("a", 0, 1, "2024-01-31 12:00:00"),
        ("a", 1, 1, "2024-02-01 12:00:00"),
    ]
    r = active_day_streaks(_sig(spark, rows)).collect()[0]
    assert r["max_streak_days"] == 2
