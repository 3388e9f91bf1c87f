"""Rolling z-score anomalies + weekly seasonality profile.

Hand-computed pinned values from the tiny fixture; sf-scale hash parity
lives in the driver oracles (zscore_1h, seasonal_profile).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.anomaly import rolling_zscore, seasonal_profile
from aroma_spark.operators.normalize import dedup_exact
from aroma_spark.operators.signals import with_signals


def _sig(tiny_transcripts):
    return with_signals(dedup_exact(tiny_transcripts))


def test_zscore_partials_and_values(spark, tiny_transcripts):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in rolling_zscore(_sig(tiny_transcripts), "1 hour").collect()
    }
    # conv a turn 0: window = itself -> zero variance -> NULL z
    r = out[("a", 0)]
    assert (r["w_n"], r["w_sum"], r["w_sumsq"]) == (1, 11, 121)
    assert r["z"] is None and r["is_anomaly"] is False
    # turns 1 and 2 tie at 00:00:30: frame peers, window = turns 0..2
    # (text_len 11, 2, 9): n=3, s=22, ssq=206, radicand=134
    for t, x in ((1, 2), (2, 9)):
        r = out[("a", t)]
        assert (r["w_n"], r["w_sum"], r["w_sumsq"]) == (3, 22, 206)
        assert r["z"] == round((3 * x - 22) / math.sqrt(134), 6)
    # turn 3 is >1h later: window restarts at itself
    assert out[("a", 3)]["w_n"] == 1 and out[("a", 3)]["z"] is None


def test_zscore_anomaly_flag(spark, tiny_transcripts):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in rolling_zscore(
            _sig(tiny_transcripts), "1 hour", "text_len", 0.5
        ).collect()
    }
    # conv b turn 1: window = (5, 4): z = (2*4-9)/sqrt(2*41-81) = -1.0
    assert out[("b", 1)]["z"] == -1.0
    assert out[("b", 1)]["is_anomaly"] is True
    # NULL z is never an anomaly
    assert out[("b", 0)]["is_anomaly"] is False


def test_seasonal_profile_rows(spark, tiny_transcripts):
    rows = {
        (r["role"], r["dow"], r["hod"]): r
        for r in seasonal_profile(_sig(tiny_transcripts)).collect()
    }
    # 2024-01-01 is a Monday -> Spark dayofweek = 2
    r = rows[("user", 2, 0)]  # conv a turn 0
    assert (r["n_turns"], r["sum_latency_us"], r["sum_text_len"]) == (1, 0, 11)
    r = rows[("assistant", 3, 10)]  # conv b turn 1, Tuesday 10:00
    assert r["sum_latency_us"] == 300_000_000
    assert r["mean_latency_us"] == 300_000_000.0
    r = rows[("tool", 2, 0)]  # conv a turn 2 (ts tie, tool call)
    assert r["sum_tool_calls"] == 1
    # partials re-aggregate: total turns across cells == corpus turns
    assert sum(r["n_turns"] for r in rows.values()) == 7


def test_hist_drift_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.anomaly import hist_drift_daily

    # day1 and day2 share the bin shape (l1 = 0); day3 is disjoint
    # from day2 (l1 = 2, the L1 maximum); day3 has no successor.
    rows = [
        ("a", "2024-01-01 10:00:00", 1),
        ("a", "2024-01-01 11:00:00", 1),
        ("a", "2024-01-01 12:00:00", 2),
        ("a", "2024-01-01 13:00:00", 2),
        ("a", "2024-01-02 10:00:00", 1),
        ("a", "2024-01-02 11:00:00", 3),  # bin2, same as value 2
        ("a", "2024-01-03 10:00:00", 4),  # bin3
        ("a", "2024-01-03 11:00:00", 4),
    ]
    sig = spark.createDataFrame(
        rows, "conv_id string, ts string, inter_time_us long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"]): r for r in hist_drift_daily(sig).collect()}
    assert set(out) == {"2024-01-01", "2024-01-02"}
    assert out["2024-01-01"]["l1"] == 0.0
    assert (out["2024-01-01"]["total_l"], out["2024-01-01"]["total_r"]) == (4, 2)
    assert out["2024-01-02"]["l1"] == 2.0


def test_peak_hour_by_dow(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.anomaly import peak_hour_by_dow

    # Monday 2024-01-01 (Spark dow=2): 3 turns at 10h, 1 at 11h
    rows = [("c", i, "2024-01-01 10:00:0%d" % i) for i in range(3)]
    rows += [("c", 3, "2024-01-01 11:00:00")]
    # Tuesday: tie between 09h and 10h -> earlier hour wins
    rows += [("c", 4, "2024-01-02 09:00:00"), ("c", 5, "2024-01-02 10:00:00")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["dow"]: r for r in peak_hour_by_dow(df).collect()}
    mon = out[2]
    assert (mon["peak_hod"], mon["peak_turns"], mon["day_turns"]) == (
        10, 3, 4)
    assert mon["peak_share"] == 0.75
    assert out[3]["peak_hod"] == 9  # tie -> earlier hour


def test_latency_spread_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.anomaly import latency_spread_daily

    rows = [
        ("a", "2024-01-01 10:00:00", 0),
        ("a", "2024-01-01 10:00:10", 10_000_000),
        ("a", "2024-01-01 10:00:40", 30_000_000),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string, inter_time_us long"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = latency_spread_daily(df).collect()[0]
    assert (r["n_turns"], r["min_us"], r["max_us"], r["range_us"]) == (
        3, 0, 30_000_000, 30_000_000)
    # mean = 40e6 // 3
    assert r["mean_us"] == 13_333_333
    assert r["spread_ratio"] == round(30_000_000 * 3 / 40_000_000, 6)


def test_burst_user_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.anomaly import burst_user_daily

    rows = [
        # user 1: 3 events in hour 10
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:10:00", 1, "view", 0.0),
        (3, "2024-01-01 10:20:00", 1, "view", 0.0),
        # user 2: 2 events in hour 11
        (4, "2024-01-01 11:00:00", 2, "view", 0.0),
        (5, "2024-01-01 11:30:00", 2, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = burst_user_daily(df).collect()[0]
    assert (r["burst_user_id"], r["burst_events"], r["day_events"]) == (
        1, 3, 5)
    assert str(r["burst_hour_ts"]).startswith("2024-01-01 10")
    assert r["burst_share"] == 0.6


def test_latency_by_len_bucket(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.anomaly import latency_by_len_bucket

    rows = [
        ("a", 5, 10_000_000),
        ("a", 5, 30_000_000),
        ("a", 9, 60_000_000),
        ("a", 999, 5_000_000),  # pools at the cap
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, text_len long, inter_time_us long")
    out = {r["text_len"]: r for r in latency_by_len_bucket(df).collect()}
    assert (out[5]["n_turns"], out[5]["mean_latency_us"]) == (
        2, 20_000_000)
    assert out[9]["mean_latency_us"] == 60_000_000
    assert out[64]["n_turns"] == 1
