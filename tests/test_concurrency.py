"""Hourly interval concurrency: pinned hand-computed expectations
(the reference's test style — literal expected values); sf-scale hash
parity lives in the driver oracle (concurrency_1h)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.concurrency import (
    conversation_intervals,
    hourly_concurrency,
)


def _df(spark, rows):
    df = spark.createDataFrame(rows, "conv_id string, ts string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_overlap_and_carry_hours(spark):
    # A spans 10:00-12:00, B nests inside hour 10, C opens hour 11 —
    # hour 11 has ONE boundary event but carries A across it.
    rows = [
        ("A", "2024-01-01 10:00:00"),
        ("A", "2024-01-01 12:00:00"),
        ("B", "2024-01-01 10:30:00"),
        ("B", "2024-01-01 10:45:00"),
        ("C", "2024-01-01 11:15:00"),
    ]
    out = {
        r["hour_ts"].hour: (r["max_concurrent"], r["active_convs"])
        for r in hourly_concurrency(_df(spark, rows)).collect()
    }
    # hour 10: A+B overlap -> peak 2; active A, B
    # hour 11: A carried, C starts and never ends (single turn at 11:15
    #   -> closed interval [11:15, 11:15]) -> peak 2 momentarily
    # hour 12: A still closed-active at 12:00 exactly -> peak 1
    assert out == {10: (2, 2), 11: (2, 2), 12: (1, 1)}


def test_empty_carry_hour_gets_spine_row(spark):
    # D spans 09:00 -> 13:30: hours 10-12 have zero boundary events but
    # D is active through them; the spine must still emit them.
    rows = [
        ("D", "2024-01-01 09:00:00"),
        ("D", "2024-01-01 13:30:00"),
        ("E", "2024-01-01 09:10:00"),
        ("E", "2024-01-01 09:20:00"),
    ]
    got = {
        r["hour_ts"].hour: (r["max_concurrent"], r["active_convs"])
        for r in hourly_concurrency(_df(spark, rows)).collect()
    }
    assert got == {
        9: (2, 2),
        10: (1, 1),
        11: (1, 1),
        12: (1, 1),
        13: (1, 1),
    }


def test_touching_intervals_count_concurrent(spark):
    # closed intervals: F ends exactly when G starts -> both active at
    # that instant (+1 orders before -1 in the sweep)
    rows = [
        ("F", "2024-01-01 10:00:00"),
        ("F", "2024-01-01 10:30:00"),
        ("G", "2024-01-01 10:30:00"),
        ("G", "2024-01-01 10:40:00"),
    ]
    got = hourly_concurrency(_df(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["max_concurrent"] == 2
    assert got[0]["active_convs"] == 2


def test_single_turn_conversation(spark):
    rows = [("H", "2024-01-01 10:15:00")]
    got = hourly_concurrency(_df(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["max_concurrent"] == 1
    assert got[0]["active_convs"] == 1


def test_intervals_on_fixture(spark, tiny_transcripts):
    iv = {
        r["conv_id"]: (str(r["start_ts"]), str(r["end_ts"]))
        for r in conversation_intervals(tiny_transcripts).collect()
    }
    assert iv["a"] == ("2024-01-01 00:00:00", "2024-01-01 02:10:00")
    assert iv["c"] == ("2024-01-03 00:00:00", "2024-01-03 00:00:00")


def test_utilization_overlap_and_zero_hours(spark):
    from aroma_spark.operators.concurrency import hourly_utilization

    # A spans 10:00-12:00 (full hours 10, 11, touches 12 with 0 us),
    # B adds 15 min inside hour 10, C is a point interval in hour 11.
    rows = [
        ("A", "2024-01-01 10:00:00"),
        ("A", "2024-01-01 12:00:00"),
        ("B", "2024-01-01 10:30:00"),
        ("B", "2024-01-01 10:45:00"),
        ("C", "2024-01-01 11:15:00"),
    ]
    got = {
        r["hour_ts"].hour: (r["busy_us"], r["n_active"], r["avg_concurrency"])
        for r in hourly_utilization(_df(spark, rows)).collect()
    }
    assert got == {
        10: (4_500_000_000, 2, 1.25),  # 3600s of A + 900s of B
        11: (3_600_000_000, 2, 1.0),  # full hour of A, 0 of point C
        12: (0, 1, 0.0),  # A touches 12:00:00 exactly
    }


def test_utilization_spine_fills_uncovered_hours(spark):
    from aroma_spark.operators.concurrency import hourly_utilization

    # two intervals with an uncovered hour between them: the spine must
    # emit hour 11 with zero activity
    rows = [
        ("D", "2024-01-01 10:00:00"),
        ("D", "2024-01-01 10:30:00"),
        ("E", "2024-01-01 12:10:00"),
        ("E", "2024-01-01 12:40:00"),
    ]
    got = {
        r["hour_ts"].hour: (r["busy_us"], r["n_active"])
        for r in hourly_utilization(_df(spark, rows)).collect()
    }
    assert got == {
        10: (1_800_000_000, 1),
        11: (0, 0),
        12: (1_800_000_000, 1),
    }


def test_utilization_matches_concurrency_active_set(spark, tiny_transcripts):
    from aroma_spark.operators.concurrency import hourly_utilization

    # n_active (interval-overlap derivation) must equal active_convs
    # (sweep-line derivation) on every hour — two independent paths to
    # the same set
    util = {
        r["hour_ts"]: r["n_active"]
        for r in hourly_utilization(tiny_transcripts).collect()
    }
    conc = {
        r["hour_ts"]: r["active_convs"]
        for r in hourly_concurrency(tiny_transcripts).collect()
    }
    assert util == conc


def test_hour_coverage_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.concurrency import hour_coverage_daily

    rows = [
        ("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 10:30:00"),
        ("a", "2024-01-01 14:00:00"),
        ("b", "2024-01-02 03:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r
           for r in hour_coverage_daily(df).collect()}
    d1 = out["2024-01-01"]
    assert d1["n_active_hours"] == 2
    assert d1["coverage"] == round(2 / 24, 6)
    assert out["2024-01-02"]["n_active_hours"] == 1


def test_turn_density_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.concurrency import turn_density_daily

    rows = [
        ("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 10:30:00"),
        ("a", "2024-01-01 11:00:00"),
        ("b", "2024-01-01 10:15:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = turn_density_daily(df).collect()[0]
    # conv-hours: (a,10), (a,11), (b,10) = 3; turns = 4
    assert (r["n_turns"], r["n_conv_hours"]) == (4, 3)
    assert r["density"] == round(4 / 3, 6)


def test_conv_day_turns_hist(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.concurrency import conv_day_turns_hist

    rows = [
        # (a, day1): 3 turns -> bucket 1; (a, day2): 1 turn -> bucket 0
        ("a", 0, "2024-01-01 10:00:00"),
        ("a", 1, "2024-01-01 11:00:00"),
        ("a", 2, "2024-01-01 12:00:00"),
        ("a", 3, "2024-01-02 10:00:00"),
        # (b, day1): 1 turn -> bucket 0
        ("b", 0, "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["bucket"]: r for r in conv_day_turns_hist(df).collect()}
    assert (out[0]["lo_turns"], out[0]["n_conv_days"],
            out[0]["sum_turns"]) == (1, 2, 2)
    assert (out[1]["n_conv_days"], out[1]["sum_turns"]) == (1, 3)
    assert out[1]["share"] == round(1 / 3, 6)
