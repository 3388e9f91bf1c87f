"""Correlation stats, level-shift changepoints, PAA/SAX, LTTB,
histogram quantiles.

Pinned expectations hand-computed from tiny synthetic frames (the
reference's test style: literal expected values, reference:
tests/unit/datasets/test_breakfast.py); sf-scale hash parity lives in
the driver oracles (corr_len_latency / autocorr_len_lag1 /
level_shift_w8 / paa_8 / sax_8 / lttb_12 / hist_quantiles_1d).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aroma_spark.operators.anomaly import level_shift_score
from aroma_spark.operators.downsample import lttb_downsample
from aroma_spark.operators.stats import signal_autocorr, signal_corr
from aroma_spark.operators.symbolize import paa_segments, sax_words
from aroma_spark.operators.tiers import histogram_quantiles


def _frame(spark, rows):
    """rows: (conv_id, turn_idx, ts_str, text_len, inter_time_us)."""
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ts string, text_len long,"
        " inter_time_us long",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def _linear(spark, n=6, conv="a"):
    # y = 2*x exactly (in whole seconds after the DIV 1000000 scaling)
    rows = [
        (conv, i, f"2024-01-01 00:{i:02d}:00", i + 1, (2 * (i + 1)) * 1_000_000)
        for i in range(n)
    ]
    return _frame(spark, rows)


def test_signal_corr_perfect_linear_is_one(spark):
    out = signal_corr(_linear(spark)).collect()
    assert len(out) == 1
    assert out[0].n_pairs == 6
    assert out[0].corr == 1.0


def test_signal_corr_constant_y_is_null(spark):
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", i + 1, 5_000_000)
        for i in range(5)
    ]
    out = signal_corr(_frame(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].corr is None


def test_signal_corr_drops_short_conversations(spark):
    rows = [
        ("a", 0, "2024-01-01 00:00:00", 1, 1_000_000),
        ("a", 1, "2024-01-01 00:01:00", 2, 2_000_000),
    ]
    assert signal_corr(_frame(spark, rows)).count() == 0


def test_signal_autocorr_alternating_is_negative_one(spark):
    # 1,3,1,3,... -> lag-1 pairs are (1,3),(3,1),... perfectly
    # anti-correlated
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 1 if i % 2 == 0 else 3, 0)
        for i in range(8)
    ]
    out = signal_autocorr(_frame(spark, rows), "text_len", 1).collect()
    assert len(out) == 1
    assert out[0].n_pairs == 7
    assert out[0].autocorr == -1.0


def test_signal_autocorr_rejects_bad_lag(spark):
    with pytest.raises(ValueError, match="lag"):
        signal_autocorr(_frame(spark, []), "text_len", 0)


def test_level_shift_detects_step(spark):
    # 8 zeros then 8 hundreds: exactly one turn (idx 7) has both full
    # windows; sum_before=0, sum_after=800, mean_shift=100
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 0 if i < 8 else 100, 0)
        for i in range(16)
    ]
    out = level_shift_score(_frame(spark, rows), "text_len", 8, 50).collect()
    assert len(out) == 1
    r = out[0]
    assert r.turn_idx == 7
    assert r.sum_before == 0 and r.sum_after == 800
    assert r.shift_score_x_w == 800
    assert r.mean_shift == 100.0
    assert bool(r.is_shift) is True


def test_level_shift_flat_series_not_flagged(spark):
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 7, 0) for i in range(20)
    ]
    out = level_shift_score(_frame(spark, rows), "text_len", 8, 50)
    flagged = out.where(F.col("is_shift")).count()
    assert flagged == 0
    # interior turns with full windows: 20 - 7 (head) - 8 (tail) = 5
    assert out.count() == 5


def test_paa_exact_segments(spark):
    # n=8, w=8: one row per segment, paa_mean == the value itself
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 10 * (i + 1), 0)
        for i in range(8)
    ]
    out = paa_segments(_frame(spark, rows), "text_len", 8).orderBy("seg")
    got = [(r.seg, r.c, r.s, r.paa_mean) for r in out.collect()]
    assert got == [(j, 1, 10 * (j + 1), float(10 * (j + 1))) for j in range(8)]


def test_paa_drops_short_conversations(spark):
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 1, 0) for i in range(7)
    ]
    assert paa_segments(_frame(spark, rows), "text_len", 8).count() == 0


def test_sax_step_word(spark):
    # [0]*4 + [10]*4: D=1600, z = (8v-40)/40 -> -1 for 0 ('a'), +1 for
    # 10 ('d')
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 0 if i < 4 else 10, 0)
        for i in range(8)
    ]
    out = sax_words(_frame(spark, rows), "text_len", 8).collect()
    assert len(out) == 1
    assert out[0].n_turns == 8
    assert out[0].sax_word == "aaaadddd"


def test_sax_constant_word_is_all_c(spark):
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 42, 0) for i in range(8)
    ]
    out = sax_words(_frame(spark, rows), "text_len", 8).collect()
    assert out[0].sax_word == "cccccccc"


def test_lttb_passthrough_when_small(spark):
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", i, 0) for i in range(5)
    ]
    out = lttb_downsample(_frame(spark, rows), 12, "text_len").orderBy(
        "turn_idx"
    )
    got = out.collect()
    assert [r.turn_idx for r in got] == [0, 1, 2, 3, 4]
    assert [r.bucket for r in got] == [0, 1, 2, 3, 4]


def test_lttb_keeps_endpoints_and_spike(spark):
    # 30 flat points with one huge spike at turn 17: the spike's bucket
    # must select the spike; endpoints always kept; exactly n_out rows
    rows = [
        ("a", i, f"2024-01-01 00:{i:02d}:00", 1000 if i == 17 else 5, 0)
        for i in range(30)
    ]
    out = lttb_downsample(_frame(spark, rows), 5, "text_len").orderBy(
        "bucket"
    )
    got = out.collect()
    assert len(got) == 5
    assert got[0].turn_idx == 0 and got[-1].turn_idx == 29
    assert 17 in [r.turn_idx for r in got]
    assert [r.bucket for r in got] == [0, 1, 2, 3, 4]


def test_lttb_rejects_bad_n_out(spark):
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(_frame(spark, []), 2, "text_len")


def test_histogram_quantiles_pinned(spark):
    # one day: bin 1 ({1}) x4, bin 2 ([2,3]) x4 across two hourly
    # buckets (the merge); total 8 -> p50 rank 4 -> bin1 est 1.0;
    # p90 rank 8 -> bin2 est 2 + 1*(8-4-1)/3 = 3.0; p99 rank 8 -> 3.0
    hist = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 1, 2),
            ("2024-01-01 01:00:00", 1, 2),
            ("2024-01-01 00:00:00", 2, 3),
            ("2024-01-01 01:00:00", 2, 1),
        ],
        "bucket_ts string, bin int, n_points long",
    ).withColumn("bucket_ts", F.to_timestamp("bucket_ts"))
    out = histogram_quantiles(hist, "day").collect()
    assert len(out) == 1
    r = out[0]
    assert r.total_points == 8
    assert r.p50 == 1.0
    assert r.p90 == 3.0
    assert r.p99 == 3.0


def test_categorical_entropy_uniform_and_pure(spark):
    from math import log

    from aroma_spark.operators.stats import categorical_entropy

    rows = []
    # hour 0: perfectly uniform over 4 roles -> H = ln(4)
    for i, r in enumerate(["a", "b", "c", "d"] * 3):
        rows.append(("c1", i, "2024-01-01 00:00:00", r))
    # hour 1: all one role -> H = 0
    for i in range(5):
        rows.append(("c1", i, "2024-01-01 01:00:00", "a"))
    # hour 2: an unseen role folds into n_other
    rows.append(("c1", 0, "2024-01-01 02:00:00", "zzz"))
    rows.append(("c1", 1, "2024-01-01 02:00:00", "a"))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, role string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.bucket_ts.hour: r
        for r in categorical_entropy(df, ("a", "b", "c", "d"), "hour").collect()
    }
    assert out[0].entropy == pytest.approx(log(4.0), abs=1e-6)
    assert out[1].entropy == 0.0
    assert out[2].n_other == 1
    assert out[2].entropy == pytest.approx(log(2.0), abs=1e-6)
    assert out[0].n_points == 12 and out[0].n_a == 3


def test_categorical_entropy_rejects_bad_categories(spark):
    from aroma_spark.operators.stats import categorical_entropy

    df = spark.createDataFrame(
        [], "conv_id string, ts timestamp, role string"
    )
    with pytest.raises(ValueError, match="non-empty"):
        categorical_entropy(df, ())
    with pytest.raises(ValueError, match="duplicate"):
        categorical_entropy(df, ("a", "a"))


def test_linear_trend_pinned(spark):
    """y = 3x + 2 exactly -> slope 3, intercept 2; plus degenerate
    groups (single point, zero x-variance) -> NULL."""
    from aroma_spark.operators.stats import linear_trend

    rows = (
        [("a", x, 3 * x + 2) for x in (0, 1, 2, 3)]
        + [("single", 5, 100)]
        + [("novar", 2, 10), ("novar", 2, 20)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in linear_trend(df, "x", "y", ["g"]).collect()}
    assert out["a"].slope == 3.0 and out["a"].intercept == 2.0
    assert out["a"].n == 4 and out["a"].sxy == sum(x * (3 * x + 2) for x in range(4))
    assert out["single"].slope is None and out["single"].intercept is None
    assert out["novar"].slope is None


def test_linear_trend_matches_numpy(spark):
    import numpy as np

    from aroma_spark.operators.stats import linear_trend

    xs = [0, 1, 2, 5, 7, 11, 13]
    ys = [17, 3, 42, 8, 91, 25, 60]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    row = linear_trend(df, "x", "y", ["g"]).collect()[0]
    slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert abs(row.slope - slope) < 1e-6
    assert abs(row.intercept - intercept) < 1e-6


def test_dod_growth_hand_computed(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.stats import dod_growth

    rows = []
    for day, n in [("2024-01-01", 2), ("2024-01-02", 3),
                   ("2024-01-04", 6)]:
        rows += [("c", i, day + " 10:00:00") for i in range(n)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r for r in dod_growth(df).collect()}
    assert out["2024-01-01"]["dod_growth"] is None
    d2 = out["2024-01-02"]
    assert (d2["prev_n_turns"], d2["dod_growth"]) == (2, 0.5)
    # Jan 4 follows a gap day -> chain broken
    d4 = out["2024-01-04"]
    assert (d4["prev_n_turns"], d4["dod_growth"]) == (None, None)


def test_text_len_cdf(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.stats import text_len_cdf

    rows = [("a", i, ln) for i, ln in enumerate([10, 16, 17, 100, 2000])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long")
    r = text_len_cdf(df).collect()[0]
    assert r["n_turns"] == 5
    assert (r["n_le_16"], r["n_le_64"], r["n_le_256"],
            r["n_le_1024"]) == (2, 3, 4, 4)
    assert r["share_le_16"] == 0.4
    assert r["share_le_1024"] == 0.8


def test_conv_p95_profile(spark):
    from aroma_spark.operators.stats import conv_p95_profile

    rows = (
        # conv a: 11 turns -> gaps 1..10 at turn_idx 1..10
        [("a", 0, "2024-01-01 00:00:00", 0, 0)]
        + [("a", i, f"2024-01-01 00:{i:02d}:00", 0, i)
           for i in range(1, 11)]
        # conv b: gaps 100, 200
        + [("b", 0, "2024-01-01 00:00:00", 0, 0),
           ("b", 1, "2024-01-01 00:01:00", 0, 100),
           ("b", 2, "2024-01-01 00:02:00", 0, 200)]
    )
    out = conv_p95_profile(_frame(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # conv a: rank ceil(.95*10)=10 -> 10; conv b: rank ceil(.95*2)=2
    # -> 200; corpus over {10, 200}: p50 -> 10, p95 -> 200
    assert (r["n_convs"], r["p50_conv_p95_us"],
            r["p95_conv_p95_us"], r["max_conv_p95_us"]) == (
        2, 10, 200, 200)


def test_role_reciprocity(spark):
    from aroma_spark.operators.stats import role_reciprocity

    rows = [
        ("a", 0, "user", 1), ("a", 1, "assistant", 2),
        ("a", 2, "user", 2), ("a", 3, "assistant", 4),
        ("a", 4, "user", 3), ("a", 5, "assistant", 6),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text_len long"
    )
    out = {(r["role"], r["next_role"]): r
           for r in role_reciprocity(df).collect()}
    ua = out[("user", "assistant")]
    # replies exactly double the prompt: perfect correlation
    assert (ua["n_pairs"], ua["r"]) == (3, 1.0)
    au = out[("assistant", "user")]
    assert (au["n_pairs"], au["r"]) == (2, 1.0)
