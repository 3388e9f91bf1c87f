"""Goldens for the PromQL-flavored pair: linear-interpolated hourly
gap fill (operators/gapfill.py) and per-hour irate
(operators/rolling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.gapfill import interp_linear_hourly
from aroma_spark.operators.rolling import hourly_irate


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _hour(h, count, day="2024-01-01"):
    return [(f"h{h}c{k}", k, f"{day} {h:02d}:{k:02d}:00") for k in range(count)]


# ------------------------------------------------------------ interp


def test_interp_single_gap_midpoint(spark):
    # hours 0 (n=2) and 2 (n=6); hour 1 missing -> midpoint 4.0
    rows = _hour(0, 2) + _hour(2, 6)
    out = {r["hour_ts"].hour: r for r in interp_linear_hourly(_sig(spark, rows)).collect()}
    assert len(out) == 3
    assert (out[0]["n_obs"], out[0]["value"]) == (2, 2.0)
    assert out[1]["n_obs"] is None
    assert out[1]["value"] == 4.0
    assert (out[2]["n_obs"], out[2]["value"]) == (6, 6.0)


def test_interp_two_gaps_thirds(spark):
    # hours 0 (n=3) and 3 (n=9); hours 1,2 missing -> 5.0 and 7.0
    rows = _hour(0, 3) + _hour(3, 9)
    out = {r["hour_ts"].hour: r["value"] for r in interp_linear_hourly(_sig(spark, rows)).collect()}
    assert out == {0: 3.0, 1: 5.0, 2: 7.0, 3: 9.0}


def test_interp_no_gaps_passthrough(spark):
    rows = _hour(0, 1) + _hour(1, 4)
    out = {r["hour_ts"].hour: (r["n_obs"], r["value"]) for r in interp_linear_hourly(_sig(spark, rows)).collect()}
    assert out == {0: (1, 1.0), 1: (4, 4.0)}


def test_interp_downward_slope(spark):
    # 10 -> gap -> 4: midpoint 7
    rows = _hour(0, 10) + _hour(2, 4)
    out = {r["hour_ts"].hour: r["value"] for r in interp_linear_hourly(_sig(spark, rows)).collect()}
    assert out[1] == 7.0


# ------------------------------------------------------------- irate


def test_irate_hand_computed(spark):
    # last two events 30 s apart -> 1/30 ev/s = 0.033333
    rows = [
        ("a", 0, "2024-01-01 05:00:00"),
        ("a", 1, "2024-01-01 05:10:00"),
        ("a", 2, "2024-01-01 05:10:30"),
    ]
    r = hourly_irate(_sig(spark, rows)).collect()[0]
    assert (r["n_points"], r["last_gap_us"]) == (3, 30_000_000)
    assert r["irate_eps"] == 0.033333
    assert r["last_ts"].minute == 10 and r["last_ts"].second == 30


def test_irate_tie_null(spark):
    rows = [
        ("a", 0, "2024-01-01 05:00:00"),
        ("b", 0, "2024-01-01 05:00:00"),
    ]
    r = hourly_irate(_sig(spark, rows)).collect()[0]
    assert (r["last_gap_us"], r["irate_eps"]) == (0, None)


def test_irate_single_event_excluded(spark):
    rows = [("a", 0, "2024-01-01 05:00:00")]
    assert hourly_irate(_sig(spark, rows)).count() == 0


def test_irate_per_hour_independent(spark):
    rows = [
        ("a", 0, "2024-01-01 05:00:00"),
        ("a", 1, "2024-01-01 05:00:01"),
        ("a", 2, "2024-01-01 06:00:00"),
        ("a", 3, "2024-01-01 06:00:02"),
    ]
    out = {r["hour_ts"].hour: r["irate_eps"] for r in hourly_irate(_sig(spark, rows)).collect()}
    assert out == {5: 1.0, 6: 0.5}
