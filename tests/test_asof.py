"""As-of and banded interval joins, verified against pandas merge_asof
and a brute-force interval filter."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from aroma_spark.operators.asof import asof_join, interval_join


def _left(spark):
    rows = [
        ("a", 0, "2024-01-01 00:00:00"),
        ("a", 1, "2024-01-01 00:30:00"),
        ("a", 2, "2024-01-01 01:15:00"),
        ("a", 3, "2024-01-01 03:00:00"),
        ("b", 0, "2024-01-02 10:00:00"),
        ("c", 0, "2024-01-05 00:00:00"),  # no right rows for conv c
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def _right(spark):
    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 01:00:00", 20.0),
        ("a", "2024-01-01 02:00:00", None),  # NULL value must be preserved
        ("b", "2024-01-02 09:00:00", 99.0),
        ("b", "2024-01-02 11:00:00", 100.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts string, v double")
    return df.withColumn("bucket_ts", F.to_timestamp("bucket_ts"))


def test_asof_backward(spark):
    out = asof_join(
        _left(spark), _right(spark), by="conv_id",
        left_ts="ts", right_ts="bucket_ts",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            str(r["matched_ts"]) if r["matched_ts"] else None, r["v"]
        )
        for r in out.collect()
    }
    assert got[("a", 0)] == ("2024-01-01 00:00:00", 10.0)  # equal ts matches
    assert got[("a", 1)] == ("2024-01-01 00:00:00", 10.0)
    assert got[("a", 2)] == ("2024-01-01 01:00:00", 20.0)
    # latest right row matched even though its value is NULL
    assert got[("a", 3)] == ("2024-01-01 02:00:00", None)
    assert got[("b", 0)] == ("2024-01-02 09:00:00", 99.0)
    assert got[("c", 0)] == (None, None)  # left-outer: unmatched kept


def test_asof_matches_pandas_merge_asof(spark):
    lf = _left(spark).toPandas().sort_values("ts")
    rf = _right(spark).toPandas().sort_values("bucket_ts")
    exp = pd.merge_asof(
        lf, rf, left_on="ts", right_on="bucket_ts", by="conv_id"
    )
    out = asof_join(
        _left(spark), _right(spark), by="conv_id",
        left_ts="ts", right_ts="bucket_ts",
    ).toPandas()
    merged = exp.merge(
        out, on=["conv_id", "turn_idx"], suffixes=("_exp", "_got")
    )
    assert len(merged) == len(exp)
    for _, r in merged.iterrows():
        assert (pd.isna(r["bucket_ts"]) and pd.isna(r["matched_ts"])) or (
            r["bucket_ts"] == r["matched_ts"]
        )
        assert (pd.isna(r["v_exp"]) and pd.isna(r["v_got"])) or (
            r["v_exp"] == r["v_got"]
        )


def test_asof_forward(spark):
    out = asof_join(
        _left(spark), _right(spark), by="conv_id",
        left_ts="ts", right_ts="bucket_ts", direction="forward",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (
            str(r["matched_ts"]) if r["matched_ts"] else None
        )
        for r in out.collect()
    }
    assert got[("a", 0)] == "2024-01-01 00:00:00"  # equal ts matches
    assert got[("a", 1)] == "2024-01-01 01:00:00"
    assert got[("a", 3)] is None  # nothing after 03:00
    assert got[("b", 0)] == "2024-01-02 11:00:00"


def test_asof_tolerance(spark):
    out = asof_join(
        _left(spark), _right(spark), by="conv_id",
        left_ts="ts", right_ts="bucket_ts",
        tolerance_us=30 * 60 * 1_000_000,  # 30 minutes
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["v"] for r in out.collect()
    }
    assert got[("a", 0)] == 10.0  # gap 0
    assert got[("a", 1)] == 10.0  # gap 30m, at the bound
    assert got[("b", 0)] is None  # nearest is 60m away -> nulled


def test_interval_join_inclusive_and_multiband(spark):
    # interval spanning three hour-bands; events at the exact bounds
    ivl = spark.createDataFrame(
        [("a", 0, "2024-01-01 00:30:00", "2024-01-01 02:30:00"),
         ("a", 1, "2024-01-01 05:00:00", "2024-01-01 05:10:00")],
        "conv_id string, ivl_id int, session_start string, session_end string",
    ).select(
        "conv_id", "ivl_id",
        F.to_timestamp("session_start").alias("session_start"),
        F.to_timestamp("session_end").alias("session_end"),
    )
    ev = spark.createDataFrame(
        [("a", 0, "2024-01-01 00:30:00"),   # == start (inclusive)
         ("a", 1, "2024-01-01 01:59:59"),
         ("a", 2, "2024-01-01 02:30:00"),   # == end (inclusive)
         ("a", 3, "2024-01-01 02:30:01"),   # just outside
         ("a", 4, "2024-01-01 05:05:00"),
         ("b", 5, "2024-01-01 01:00:00")],  # wrong conv
        "conv_id string, turn_idx int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = interval_join(ev, ivl, by="conv_id", ts_col="ts")
    pairs = sorted((r["turn_idx"], r["ivl_id"]) for r in out.collect())
    assert pairs == [(0, 0), (1, 0), (2, 0), (4, 1)]
    # exactly once per qualifying pair, no dedup needed
    assert out.count() == len(pairs)


def test_interval_join_collision_guard(spark):
    ivl = spark.createDataFrame(
        [("a", "x")], "conv_id string, ts string"
    )
    ev = spark.createDataFrame([("a", "y")], "conv_id string, ts string")
    try:
        interval_join(ev, ivl, start_col="ts", end_col="ts")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_interval_join_span_guard(spark):
    # pathological months-long interval at band='hour' must fail loudly,
    # not fan out thousands of rows
    import pytest
    from pyspark.errors import PySparkException

    ivl = spark.createDataFrame(
        [("a", 0, "2024-01-01 00:00:00", "2024-06-01 00:00:00")],
        "conv_id string, ivl_id int, session_start string, session_end string",
    ).select(
        "conv_id", "ivl_id",
        F.to_timestamp("session_start").alias("session_start"),
        F.to_timestamp("session_end").alias("session_end"),
    )
    ev = spark.createDataFrame(
        [("a", 0, "2024-01-15 00:00:00")], "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(PySparkException, match="max_bands_per_interval"):
        interval_join(ev, ivl, by="conv_id", ts_col="ts", band="hour").collect()
    # same data passes with a band wide enough for the span
    out = interval_join(ev, ivl, by="conv_id", ts_col="ts", band="day")
    assert out.count() == 1


def test_interval_join_auto_band(spark):
    from aroma_spark.operators.asof import _pick_band

    def ivl_of(hours):
        return spark.createDataFrame(
            [("a", "2024-01-01 00:00:00",
              f"2024-01-01 {hours:02d}:00:00" if hours < 24
              else "2024-01-03 00:00:00")],
            "conv_id string, s string, e string",
        ).select(
            F.to_timestamp("s").alias("session_start"),
            F.to_timestamp("e").alias("session_end"),
        )

    # 10-minute intervals -> minute bands; 2-day intervals -> day bands
    short = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 00:10:00")], "s string, e string"
    ).select(
        F.to_timestamp("s").alias("session_start"),
        F.to_timestamp("e").alias("session_end"),
    )
    assert _pick_band(short, "session_start", "session_end") == "minute"
    assert _pick_band(ivl_of(48), "session_start", "session_end") == "day"
    # auto band end-to-end produces the same pairs as an explicit band
    ivl = spark.createDataFrame(
        [("a", 0, "2024-01-01 00:30:00", "2024-01-01 00:45:00")],
        "conv_id string, ivl_id int, ss string, se string",
    ).select(
        "conv_id", "ivl_id",
        F.to_timestamp("ss").alias("session_start"),
        F.to_timestamp("se").alias("session_end"),
    )
    ev = spark.createDataFrame(
        [("a", 0, "2024-01-01 00:40:00"), ("a", 1, "2024-01-01 00:50:00")],
        "conv_id string, turn_idx int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        r["turn_idx"]
        for r in interval_join(ev, ivl, by="conv_id", ts_col="ts", band="auto").collect()
    )
    assert got == [0]


def test_asof_nearest_hand_computed(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            ("a", 1, "2024-01-01 10:00:10"),  # closer to 10:00:00
            ("a", 2, "2024-01-01 10:00:50"),  # closer to 10:01:00
            ("a", 3, "2024-01-01 10:00:30"),  # equidistant -> backward
            ("b", 9, "2024-01-01 09:00:00"),  # no right rows -> NULL
        ],
        "conv_id string, turn_idx int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:00:00", 100),
            ("a", "2024-01-01 10:01:00", 200),
        ],
        "conv_id string, ts string, v int",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["conv_id"], r["turn_idx"]): r for r in asof_join(
        left, right, direction="nearest").collect()}
    assert out[("a", 1)]["v"] == 100
    assert out[("a", 2)]["v"] == 200
    assert out[("a", 3)]["v"] == 100  # tie resolves backward
    assert out[("b", 9)]["v"] is None


def test_asof_match_rates(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.asof import asof_match_rates

    left = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:04:00"),  # 4m after anchor
            ("a", "2024-01-01 10:20:00"),  # 20m after
            ("a", "2024-01-01 09:00:00"),  # before any anchor: no match
        ],
        "conv_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00")],
        "conv_id string, closed_ts string",
    ).withColumn("closed_ts", F.to_timestamp("closed_ts"))
    out = {r["tolerance_us"]: r
           for r in asof_match_rates(
               left, right,
               tolerances_us=(300_000_000, 3_600_000_000)).collect()}
    five_min = out[300_000_000]
    assert (five_min["n_left"], five_min["n_matched"],
            five_min["match_rate"]) == (3, 1, 0.333333)
    hour = out[3_600_000_000]
    # the unmatched 09:00 row never counts at any tolerance
    assert (hour["n_matched"], hour["match_rate"]) == (2, 0.666667)
