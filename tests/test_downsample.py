"""M4 downsampling, counter increase, time-weighted average.

Pinned expectations are hand-computed from the tiny fixture (the
reference's test style: literal expected values, reference:
tests/unit/datasets/test_breakfast.py); the sf-scale hash parity lives
in the driver oracles (m4_downsample_1h / counter_rate_1h / twa_1h).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aroma_spark.operators.downsample import (
    counter_increase,
    m4_downsample,
    time_weighted_avg,
)
from aroma_spark.operators.signals import with_signals


def _sig(tiny_transcripts):
    return with_signals(tiny_transcripts.dropDuplicates(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ))


def test_m4_selects_first_last_min_max(spark, tiny_transcripts):
    # conv a, hour 00: turns 0,1,2 with inter_time_us 0, 30e6, 0.
    # first=(t0), last=(t2), min=(t0: v=0 earliest), max=(t1).
    out = m4_downsample(_sig(tiny_transcripts), "hour")
    a0 = (
        out.where((F.col("conv_id") == "a")
                  & (F.col("bucket_ts") == "2024-01-01 00:00:00"))
        .orderBy("turn_idx")
        .collect()
    )
    assert [r.turn_idx for r in a0] == [0, 1, 2]
    assert [r.value for r in a0] == [0, 30_000_000, 0]


def test_m4_single_point_bucket_collapses(spark, tiny_transcripts):
    # conv c has one turn: all four roles pick the same point -> 1 row
    out = m4_downsample(_sig(tiny_transcripts), "hour")
    assert out.where(F.col("conv_id") == "c").count() == 1


def test_m4_at_most_four_points_per_bucket(spark, tiny_transcripts):
    sizes = (
        m4_downsample(_sig(tiny_transcripts), "day")
        .groupBy("conv_id", "bucket_ts")
        .count()
        .collect()
    )
    assert sizes and all(r["count"] <= 4 for r in sizes)


def test_counter_increase_handles_reset(spark):
    # counter 5 -> 8 -> 2 (reset) -> 4: increase = 3 + 2 + 2 = 7
    rows = [
        ("x", 0, 5, "2024-01-01 00:00:00"),
        ("x", 1, 8, "2024-01-01 00:10:00"),
        ("x", 2, 2, "2024-01-01 00:20:00"),
        ("x", 3, 4, "2024-01-01 00:30:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, counter long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = counter_increase(df, "hour").collect()
    assert len(out) == 1
    assert out[0].increase == 7
    assert out[0].n_samples == 4
    assert out[0].n_resets == 1


def test_counter_increase_first_sample_contributes_zero(spark):
    df = spark.createDataFrame(
        [("y", 0, 100, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, counter long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = counter_increase(df, "hour").collect()[0]
    assert r.increase == 0 and r.n_resets == 0 and r.n_samples == 1


def test_twa_weights_by_hold_time(spark):
    # v=10 held 60s, then v=30 held 180s inside one hour:
    # twa = (10*60 + 30*180) / 240 = 25.0; the last sample has no
    # in-bucket successor and contributes no weight
    rows = [
        ("z", 0, 10, "2024-01-01 00:00:00"),
        ("z", 1, 30, "2024-01-01 00:01:00"),
        ("z", 2, 99, "2024-01-01 00:04:00"),
    ]
    df = (
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, v long, ts string"
        )
        .withColumn("ts", F.to_timestamp("ts"))
    )
    r = time_weighted_avg(df, "hour", value_col="v").collect()[0]
    assert r.duration_us == 240_000_000
    assert r.weighted_sum == 10 * 60_000_000 + 30 * 180_000_000
    assert r.twa == 25.0


def test_twa_null_without_interior_segment(spark, tiny_transcripts):
    # conv c: single sample in its bucket -> no interior segment -> NULLs
    out = time_weighted_avg(_sig(tiny_transcripts), "hour")
    r = out.where(F.col("conv_id") == "c").collect()[0]
    assert r.weighted_sum is None and r.duration_us is None and r.twa is None


def test_counter_rate_driver_counter_resets_fire(spark, tiny_transcripts):
    # the driver query's derived counter (running text_len % 10000) must
    # be reproducible here; on the tiny fixture no window crosses 10000
    # so increase == sum of per-turn deltas == final counter per conv
    sig = _sig(tiny_transcripts)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ctr = (F.sum("text_len").over(w) % 10000).cast("long")
    out = counter_increase(sig.withColumn("counter", ctr), "day")
    total = {r.conv_id: r.increase for r in
             out.groupBy("conv_id").agg(F.sum("increase").alias("increase"))
             .collect()}
    # conv a: text lens 11,2,9,10 -> counter 11,13,22,32; first turn
    # contributes 0 -> increase 21 across its two day-buckets... both
    # turns 0..2 are day 1, turn 3 is day 1 too (02:10) -> 21
    assert total["a"] == 21
