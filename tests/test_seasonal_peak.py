"""Goldens for the seasonal-anomaly/load-shape pair: hour-of-day
residual Tukey outliers (operators/anomaly.py) and hourly peak factor
(operators/concurrency.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.anomaly import seasonal_residual_outliers
from aroma_spark.operators.concurrency import hourly_peak_factor


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _hour(day, h, count):
    return [(f"{day}h{h}", k, f"{day} {h:02d}:{k:02d}:00") for k in range(count)]


# -------------------------------------------------- seasonal residual


def test_seasonal_spike_flagged(spark):
    # hod 0 counts over 3 days: [2,2,10]; hod 1: [4,4,4].
    # med(hod0)=2, med(hod1)=4; residuals [0,0,8,0,0,0];
    # q1=q3=0 -> fences collapse to 0 -> only the spike is an outlier
    rows = []
    for d, c in zip(["2024-01-01", "2024-01-02", "2024-01-03"], [2, 2, 10]):
        rows += _hour(d, 0, c)
    for d in ["2024-01-01", "2024-01-02", "2024-01-03"]:
        rows += _hour(d, 1, 4)
    out = seasonal_residual_outliers(_sig(spark, rows)).collect()
    flagged = {(r["hour_ts"].day, r["hour_ts"].hour) for r in out if r["is_outlier"]}
    assert flagged == {(3, 0)}
    by = {(r["hour_ts"].day, r["hour_ts"].hour): r for r in out}
    assert by[(3, 0)]["residual"] == 8
    assert by[(1, 0)]["med_hod"] == 2
    assert by[(1, 1)]["med_hod"] == 4


def test_seasonal_diurnal_pattern_not_flagged(spark):
    # strong diurnal shape, perfectly regular: nothing is an outlier
    rows = []
    for d in ["2024-01-01", "2024-01-02", "2024-01-03"]:
        rows += _hour(d, 0, 1)
        rows += _hour(d, 12, 9)
    out = seasonal_residual_outliers(_sig(spark, rows)).collect()
    assert len(out) == 6
    assert not any(r["is_outlier"] for r in out)
    assert all(r["residual"] == 0 for r in out)


def test_seasonal_low_outlier(spark):
    # hod 0: [6,6,6,6,1] -> med 6, residuals [0,0,0,0,-5]; the dip is
    # below the lower fence (q1=q3=0)
    rows = []
    for d, c in zip(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"],
        [6, 6, 6, 6, 1],
    ):
        rows += _hour(d, 0, c)
    out = seasonal_residual_outliers(_sig(spark, rows)).collect()
    flagged = [r for r in out if r["is_outlier"]]
    assert len(flagged) == 1
    assert flagged[0]["residual"] == -5


# ------------------------------------------------------- peak factor


def test_peak_factor_hand_computed(spark):
    # minutes 0,1,2 with counts 3,1,2: pf = 3*3/6 = 1.5
    rows = []
    for m, c in zip([0, 1, 2], [3, 1, 2]):
        rows += [(f"m{m}", k, f"2024-01-01 05:{m:02d}:{10 + k}") for k in range(c)]
    r = hourly_peak_factor(_sig(spark, rows)).collect()[0]
    assert (r["n_minutes"], r["total"], r["peak_minute"]) == (3, 6, 3)
    assert r["peak_factor"] == 1.5


def test_peak_factor_flat_one(spark):
    rows = []
    for m in range(4):
        rows += [(f"m{m}", k, f"2024-01-01 05:{m:02d}:{10 + k}") for k in range(2)]
    r = hourly_peak_factor(_sig(spark, rows)).collect()[0]
    assert r["peak_factor"] == 1.0


def test_peak_factor_single_minute(spark):
    rows = [("a", k, f"2024-01-01 05:00:{10 + k}") for k in range(5)]
    r = hourly_peak_factor(_sig(spark, rows)).collect()[0]
    assert (r["n_minutes"], r["peak_factor"]) == (1, 1.0)
