"""Goldens for the robust-statistics wave: exact median/MAD outlier
counts per bucket, exact CUSUM changepoint location, and winsorized
skewness/kurtosis from int64 power sums (operators/robust.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.robust import (
    cusum_changepoint,
    mad_outliers_by_bucket,
    skew_kurt_by_bucket,
    tukey_fences_by_bucket,
)


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, text_len, ts_string)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


D1 = "2024-01-01 0%d:00:00"
D2 = "2024-01-02 0%d:00:00"


def _day(conv, values, day=D1):
    return [(conv, i, v, day % (i % 10)) for i, v in enumerate(values)]


def test_mad_odd_bucket(spark):
    # [1,2,3,4,5]: med=3 (rank (5+1)//2=3), |dev|=[2,1,0,1,2] ->
    # sorted [0,1,1,2,2], mad = rank-3 value = 1; k=3 -> no d > 3.
    out = mad_outliers_by_bucket(_sig(spark, _day("a", [1, 2, 3, 4, 5]))).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_points"], r["median_text_len"], r["mad"]) == (5, 3, 1)
    assert (r["n_outliers"], r["max_abs_dev"]) == (0, 2)


def test_mad_even_bucket_lower_median(spark):
    # [1,2,3,4]: lower-median rank (4+1)//2=2 -> med=2; devs [1,0,1,2]
    # sorted [0,1,1,2] -> mad at rank 2 = 1.
    r = mad_outliers_by_bucket(_sig(spark, _day("a", [1, 2, 3, 4]))).collect()[0]
    assert (r["median_text_len"], r["mad"]) == (2, 1)


def test_mad_degenerate_zero_mad_counts_every_deviation(spark):
    # [10,10,10,10,1000]: med=10, mad=0 -> every x != med is an outlier.
    r = mad_outliers_by_bucket(
        _sig(spark, _day("a", [10, 10, 10, 10, 1000]))
    ).collect()[0]
    assert (r["mad"], r["n_outliers"], r["max_abs_dev"]) == (0, 1, 990)


def test_mad_constant_bucket(spark):
    r = mad_outliers_by_bucket(_sig(spark, _day("a", [7, 7, 7]))).collect()[0]
    assert (r["median_text_len"], r["mad"], r["n_outliers"]) == (7, 0, 0)


def test_mad_buckets_are_independent(spark):
    rows = _day("a", [1, 2, 3], D1) + _day("b", [100, 200, 300], D2)
    out = {
        r["bucket_ts"].day: r
        for r in mad_outliers_by_bucket(_sig(spark, rows)).collect()
    }
    assert out[1]["median_text_len"] == 2
    assert out[2]["median_text_len"] == 200


def test_cusum_level_shift_located(spark):
    # [0,0,0,10,10,10]: S=30, n=6; C_k*n = 6*prefix - k*30 =
    # [-30,-60,-90,-60,-30,0] -> peak |.|=90 at k=3 (turn_idx 2).
    r = cusum_changepoint(_sig(spark, _day("a", [0, 0, 0, 10, 10, 10]))).collect()[0]
    assert (r["n_turns"], r["split_turn_idx"]) == (6, 2)
    assert r["max_cusum_scaled"] == 90
    assert math.isclose(r["max_cusum"], 15.0)


def test_cusum_tie_breaks_to_earliest_turn(spark):
    # [0,10,0,10]: scaled C = [-20,0,-20,0] -> |20| ties at k=1 and
    # k=3; earliest turn_idx (0) wins.
    r = cusum_changepoint(_sig(spark, _day("a", [0, 10, 0, 10]))).collect()[0]
    assert r["split_turn_idx"] == 0
    assert r["max_cusum_scaled"] == 20


def test_cusum_min_turns_filter(spark):
    rows = _day("short", [1, 2, 3]) + _day("long", [0, 0, 5, 5])
    out = cusum_changepoint(_sig(spark, rows)).collect()
    assert [r["conv_id"] for r in out] == ["long"]


def test_skew_kurt_symmetric(spark):
    # [1,2,2,3]: mean=2, m2=0.5, m3=0 -> skew 0; m4=0.5 ->
    # kurtosis 0.5/0.25 - 3 = -1.
    r = skew_kurt_by_bucket(_sig(spark, _day("a", [1, 2, 2, 3]))).collect()[0]
    assert (r["n_points"], r["s1"], r["s2"], r["s3"], r["s4"]) == (
        4, 8, 18, 44, 114,
    )
    assert math.isclose(r["skewness"], 0.0)
    assert math.isclose(r["kurtosis"], -1.0)


def test_skew_kurt_right_skew_positive(spark):
    r = skew_kurt_by_bucket(_sig(spark, _day("a", [1, 1, 1, 10]))).collect()[0]
    assert r["skewness"] > 0


def test_skew_kurt_constant_bucket_null(spark):
    r = skew_kurt_by_bucket(_sig(spark, _day("a", [5, 5, 5, 5]))).collect()[0]
    assert r["skewness"] is None and r["kurtosis"] is None


def test_skew_kurt_clamp_winsorizes(spark):
    # 5000 is clamped to 1024 before the power sums.
    r = skew_kurt_by_bucket(
        _sig(spark, _day("a", [1, 2, 3, 5000])), clamp=1024
    ).collect()[0]
    assert r["s1"] == 1 + 2 + 3 + 1024


def test_skew_kurt_min_points_filter(spark):
    assert skew_kurt_by_bucket(_sig(spark, _day("a", [1, 2, 3]))).count() == 0


def test_tukey_nine_points_with_high_outlier(spark):
    # sorted [1..8,100], n=9: Q1 rank ceil(9/4)=3 -> 3, med rank 5 -> 5,
    # Q3 rank ceil(27/4)=7 -> 7, IQR=4; high fence 2x > 2*7+3*4=26 ->
    # x > 13 -> only 100.
    r = tukey_fences_by_bucket(
        _sig(spark, _day("a", [1, 2, 3, 4, 5, 6, 7, 8, 100]))
    ).collect()[0]
    assert (r["q1"], r["median_text_len"], r["q3"], r["iqr"]) == (3, 5, 7, 4)
    assert (r["min_text_len"], r["max_text_len"]) == (1, 100)
    assert (r["n_low_outliers"], r["n_high_outliers"]) == (0, 1)


def test_tukey_four_points_nearest_rank(spark):
    # n=4: Q1 rank (4+3)//4=1 -> 1, med rank 2 -> 2, Q3 rank 3 -> 3.
    r = tukey_fences_by_bucket(_sig(spark, _day("a", [1, 2, 3, 4]))).collect()[0]
    assert (r["q1"], r["median_text_len"], r["q3"]) == (1, 2, 3)
    assert (r["n_low_outliers"], r["n_high_outliers"]) == (0, 0)


def test_tukey_low_outlier(spark):
    # sorted [-100,10,11,12,13,14,15,16,17], n=9: Q1=11, med=13, Q3=15,
    # IQR=4; low fence 2x < 22-12=10 -> x < 5 -> only -100.
    r = tukey_fences_by_bucket(
        _sig(spark, _day("a", [-100, 10, 11, 12, 13, 14, 15, 16, 17]))
    ).collect()[0]
    assert (r["q1"], r["q3"]) == (11, 15)
    assert (r["n_low_outliers"], r["n_high_outliers"]) == (1, 0)


def test_tukey_constant_bucket(spark):
    r = tukey_fences_by_bucket(_sig(spark, _day("a", [7, 7, 7, 7]))).collect()[0]
    assert (r["q1"], r["q3"], r["iqr"]) == (7, 7, 0)
    assert (r["n_low_outliers"], r["n_high_outliers"]) == (0, 0)
