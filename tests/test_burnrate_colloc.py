"""Goldens for the 5j pair: multi-window SLO burn-rate alerts
(operators/anomaly.py) and PMI bigram collocations (functions/text.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.functions.text import bigram_collocations
from aroma_spark.operators.anomaly import slo_burn_rate

BAD = 301_000_000  # > the 300s default threshold
OK = 1_000_000


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, inter_time_us, ts_string)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, inter_time_us long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _hour(hh, n_ok, n_bad):
    rows = []
    for i in range(n_ok):
        rows.append(
            (
                "c",
                hh * 10000 + i,
                OK,
                f"2024-01-01 {hh:02d}:{i // 60:02d}:{i % 60:02d}",
            )
        )
    for i in range(n_bad):
        rows.append(
            (
                "c",
                hh * 10000 + 5000 + i,
                BAD,
                f"2024-01-01 {hh:02d}:{30 + i // 60:02d}:{i % 60:02d}",
            )
        )
    return rows


def test_burn_rate_both_windows_alert(spark):
    # single hour, 2/10 bad: burn = 2e6/(10*1000) = 200x >= 14.4x in
    # both windows (slow window == the hour itself) -> alert.
    out = slo_burn_rate(_sig(spark, _hour(10, 8, 2))).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_turns"], r["n_bad"], r["n_slow"], r["bad_slow"]) == (
        10, 2, 10, 2,
    )
    assert math.isclose(r["burn_fast"], 200.0)
    assert r["alert"] == 1


def test_burn_rate_fast_window_gates_stale_alert(spark):
    # hour 10 burns, hour 11 is clean: at 11 the slow window still
    # carries hour 10's badness (burn_slow 100x) but the fast window
    # recovered -> no alert (the SRE-workbook staleness rule).
    out = {
        r["hour_ts"].hour: r
        for r in slo_burn_rate(
            _sig(spark, _hour(10, 8, 2) + _hour(11, 10, 0))
        ).collect()
    }
    assert out[10]["alert"] == 1
    r11 = out[11]
    assert (r11["n_slow"], r11["bad_slow"]) == (20, 2)
    assert math.isclose(r11["burn_fast"], 0.0)
    assert math.isclose(r11["burn_slow"], 100.0)
    assert r11["alert"] == 0


def test_burn_rate_slow_window_expires(spark):
    # 6h trailing window: hour 20 no longer sees hour 10.
    out = {
        r["hour_ts"].hour: r
        for r in slo_burn_rate(
            _sig(spark, _hour(10, 8, 2) + _hour(20, 10, 0))
        ).collect()
    }
    assert (out[20]["n_slow"], out[20]["bad_slow"]) == (10, 0)


def test_burn_rate_below_threshold_no_alert(spark):
    # 1/1000 bad = exactly 1x burn < 14.4x -> no alert.
    out = slo_burn_rate(_sig(spark, _hour(10, 999, 1))).collect()[0]
    assert math.isclose(out["burn_fast"], 1.0)
    assert out["alert"] == 0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_counts_and_value(spark):
    # corpus: "a b a b" + "a b c": bigrams (a,b)x3 (b,a)x1 (b,c)x1,
    # unigrams a:3 b:3 c:1, totals 5 bigrams / 7 tokens; min_count=2
    # keeps only (a,b) with pmi = ln(3*7*7 / (5*3*3)).
    out = bigram_collocations(
        _docs(spark, ["a b a b", "a b c"]), min_count=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["c_xy"], r["c_x"], r["c_y"]) == (
        "a", "b", 3, 3, 3,
    )
    assert (r["n_bigrams"], r["n_tokens"]) == (5, 7)
    assert math.isclose(
        r["pmi"], round(math.log(3 * 7 * 7 / (5 * 3 * 3)), 6), abs_tol=1e-9
    )


def test_pmi_whitespace_and_case_normalized(spark):
    # runs of whitespace collapse and case folds BEFORE adjacency.
    out = bigram_collocations(
        _docs(spark, ["  X   y  ", "x Y", "x y"]), min_count=3
    ).collect()
    assert len(out) == 1
    assert (out[0]["w1"], out[0]["w2"], out[0]["c_xy"]) == ("x", "y", 3)


def test_pmi_single_token_docs_count_unigrams_only(spark):
    # "z" docs add tokens but no bigrams: n_tokens grows, n_bigrams
    # doesn't, so (x,y)'s PMI drops... and they never join a bigram.
    out = bigram_collocations(
        _docs(spark, ["x y", "x y", "x y", "z", "z"]), min_count=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_bigrams"], r["n_tokens"]) == (3, 8)


def test_pmi_min_count_cut(spark):
    out = bigram_collocations(
        _docs(spark, ["p q", "q p"]), min_count=2
    ).collect()
    assert out == []
