"""OHLC tier, latency histogram, trailing-window rolling stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.rolling import rolling_window_stats
from aroma_spark.operators.signals import with_signals
from aroma_spark.operators.tiers import latency_histogram, rollup_ohlc


def _sig(spark, tiny_transcripts):
    from aroma_spark.operators.normalize import dedup_exact

    return with_signals(dedup_exact(tiny_transcripts))


def test_rollup_ohlc_deterministic_open_close(spark, tiny_transcripts):
    out = {
        (r["conv_id"], str(r["bucket_ts"])): r
    for r in rollup_ohlc(_sig(spark, tiny_transcripts), "hour").collect()}
    # conv a, hour 00: turns 0,1,2 with inter_times 0, 30s, 0 (ts tie)
    r = out[("a", "2024-01-01 00:00:00")]
    assert (r["open"], r["close"]) == (0, 0)      # turn 0 opens, turn 2 closes
    assert (r["low"], r["high"]) == (0, 30_000_000)
    assert r["n_points"] == 3
    # conv a, hour 02: single turn with the big gap
    r2 = out[("a", "2024-01-01 02:00:00")]
    assert r2["open"] == r2["close"] == r2["low"] == r2["high"]
    assert r2["n_points"] == 1


def test_latency_histogram_bins(spark):
    rows = [
        ("x", 0, "u", "t", None, "2024-01-01 00:00:00"),  # inter 0 -> bin 0
        ("x", 1, "u", "t", None, "2024-01-01 00:00:01"),  # 1e6 us -> bin 20
        ("x", 2, "u", "t", None, "2024-01-01 00:00:02"),  # 1e6 us -> bin 20
        ("x", 3, "u", "t", None, "2024-01-01 00:00:06"),  # 4e6 us -> bin 22
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["bin"]: r["n_points"]
        for r in latency_histogram(with_signals(df), "hour").collect()
    }
    # 10^6 has 20 binary digits, 4*10^6 has 22
    assert got == {0: 1, 20: 2, 22: 1}


def test_rolling_window_matches_pandas(spark, tiny_transcripts):
    sig = _sig(spark, tiny_transcripts)
    got = {
        (r["conv_id"], r["turn_idx"]): (
            r["w_n_turns"], r["w_sum_latency_us"], r["w_tool_calls"]
        )
        for r in rolling_window_stats(sig, "1 hour").collect()
    }
    pdf = sig.toPandas()
    for _, row in pdf.iterrows():
        us = pdf.ts.astype("datetime64[us]").astype("int64")
        t0 = int(row.ts.to_datetime64().astype("datetime64[us]").astype("int64"))
        mask = (
            (pdf.conv_id == row.conv_id)
            & (us >= t0 - 3_600_000_000)
            & (us <= t0)
        )
        want = (
            int(mask.sum()),
            int(pdf.inter_time_us[mask].sum()),
            int(pdf.tool_call[mask].sum()),
        )
        assert got[(row.conv_id, row.turn_idx)] == want, (row.conv_id, row.turn_idx)
