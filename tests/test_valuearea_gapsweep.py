"""Goldens for the load-locality/session-tuning pair: daily value
area (operators/concurrency.py) and the session gap sweep
(operators/sessions.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.concurrency import value_area_daily
from aroma_spark.operators.sessions import session_gap_sweep


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _minute(m, count, day="2024-01-01", h=9):
    return [
        (f"m{m}k{k}", k, f"{day} {h:02d}:{m:02d}:{k:02d}")
        for k in range(count)
    ]


# --------------------------------------------------------- value area


def test_value_area_spiky(spark):
    # minute counts [10,5,3,2], total 20: included while
    # 10*(cum-n) < 140 -> minutes with before-cum 0 and 100 -> 2
    rows = (
        _minute(0, 10) + _minute(1, 5) + _minute(2, 3) + _minute(3, 2)
    )
    r = value_area_daily(_sig(spark, rows)).collect()[0]
    assert (r["n_minutes"], r["total"]) == (4, 20)
    assert (r["va_minutes"], r["va_volume"]) == (2, 15)
    assert r["top_share"] == 0.5


def test_value_area_flat(spark):
    # [5,5,5,5]: before-cums 0,50,100,150 vs 140 -> 3 minutes
    rows = _minute(0, 5) + _minute(1, 5) + _minute(2, 5) + _minute(3, 5)
    r = value_area_daily(_sig(spark, rows)).collect()[0]
    assert (r["va_minutes"], r["va_volume"]) == (3, 15)
    assert r["top_share"] == 0.25


def test_value_area_single_minute(spark):
    rows = _minute(0, 7)
    r = value_area_daily(_sig(spark, rows)).collect()[0]
    assert (r["va_minutes"], r["va_volume"], r["top_share"]) == (1, 7, 1.0)


def test_value_area_days_independent(spark):
    rows = _minute(0, 9, day="2024-01-01") + _minute(0, 1, day="2024-01-02")
    out = {r["day_ts"].day: r["va_minutes"] for r in value_area_daily(_sig(spark, rows)).collect()}
    assert out == {1: 1, 2: 1}


# ---------------------------------------------------------- gap sweep


def test_gap_sweep_hand_computed(spark):
    # conv a at 0s, 600s, 2400s (gaps 600 s and 1800 s) + singleton b:
    # sessions: G=900 -> 2+1=3; G=1800 -> 2 (1800 not > 1800); G=3600 -> 2
    rows = [
        ("a", 0, "2024-01-01 00:00:00"),
        ("a", 1, "2024-01-01 00:10:00"),
        ("a", 2, "2024-01-01 00:40:00"),
        ("b", 0, "2024-01-01 05:00:00"),
    ]
    out = {r["gap_seconds"]: r for r in session_gap_sweep(_sig(spark, rows)).collect()}
    assert set(out) == {900, 1800, 3600}
    assert (out[900]["n_convs"], out[900]["n_turns"]) == (2, 4)
    assert out[900]["n_sessions"] == 3
    assert out[1800]["n_sessions"] == 2
    assert out[3600]["n_sessions"] == 2
    assert out[900]["avg_turns_per_session"] == 1.333333
    assert out[3600]["avg_turns_per_session"] == 2.0


def test_gap_sweep_matches_session_stats(spark):
    # cross-check against the real sessionizer at G=1800
    from aroma_spark.operators.sessions import session_stats

    rows = [
        ("a", 0, "2024-01-01 00:00:00"),
        ("a", 1, "2024-01-01 01:00:00"),
        ("a", 2, "2024-01-01 01:10:00"),
        ("b", 0, "2024-01-01 02:00:00"),
        ("b", 1, "2024-01-01 09:00:00"),
    ]
    sig = _sig(spark, rows).withColumn("tool", F.lit(None).cast("string"))
    swept = {
        r["gap_seconds"]: r["n_sessions"]
        for r in session_gap_sweep(sig).collect()
    }
    real = session_stats(sig, gap="30 minutes").count()
    assert swept[1800] == real
