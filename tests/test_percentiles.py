"""Percentile rollups: exact goldens + approx agreement."""

from __future__ import annotations

import math

from aroma_spark.operators.normalize import dedup_exact
from aroma_spark.operators.signals import with_signals
from aroma_spark.operators.tiers import latency_percentiles


def test_exact_percentiles_golden(spark, tiny_transcripts):
    sig = with_signals(dedup_exact(tiny_transcripts))
    out = (
        latency_percentiles(sig, "day")
        .toPandas()
        .set_index("conv_id")
    )
    # conv a day1: inter times [0, 30e6, 0, 7770e6]; p50 = 15e6 (interp)
    a = out.loc["a"]
    assert a.n_points == 4
    assert math.isclose(a.p50_latency_us, 15_000_000.0)
    # single-turn conv: all percentiles = the single value (0)
    c = out.loc["c"]
    assert c.p50_latency_us == 0.0 == c.p99_latency_us


def test_approx_close_to_exact_on_large_group(spark):
    """percentile_approx returns an observed element (no interpolation);
    on a dense group it lands within ~2% of the exact quantile."""
    from pyspark.sql import functions as F

    df = (
        spark.range(1000)
        .select(
            F.lit("c").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * (F.col("id") + 1)
            ).alias("ts"),
            (F.col("id") * (F.lit(2))).alias("inter_time_us"),
        )
    )
    exact = latency_percentiles(df, "day", approx=False).toPandas()
    approx = latency_percentiles(df, "day", approx=True).toPandas()
    for col in ("p50_latency_us", "p95_latency_us", "p99_latency_us"):
        e, a = exact[col].iloc[0], approx[col].iloc[0]
        assert abs(e - a) <= 0.02 * max(e, 1), col
        assert a % 2 == 0  # an actual observed element
