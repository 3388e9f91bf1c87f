"""Gap-fill golden tests: LOCF, lerp, edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.gapfill import gapfill_grid


def _tier(spark, rows):
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts string, v double")
    return df.select("conv_id", F.to_timestamp("bucket_ts").alias("bucket_ts"), "v")


def test_locf_and_lerp_golden(spark):
    tier = _tier(
        spark,
        [
            ("x", "2024-01-01 00:00:00", 10.0),
            ("x", "2024-01-01 00:03:00", 40.0),  # 2-bucket hole: 00:01, 00:02
            ("x", "2024-01-01 00:04:00", 0.0),
        ],
    )
    out = (
        gapfill_grid(tier, "v", "1 minute", "minute")
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out.locf_value.tolist() == [10.0, 10.0, 10.0, 40.0, 0.0]
    assert out.lerp_value.tolist() == [10.0, 20.0, 30.0, 40.0, 0.0]
    assert out.is_filled.tolist() == [False, True, True, False, False]


def test_single_point_conversation(spark):
    tier = _tier(spark, [("solo", "2024-01-01 00:00:00", 5.0)])
    out = gapfill_grid(tier, "v", "1 minute", "minute").toPandas()
    assert len(out) == 1
    assert out.locf_value.iloc[0] == 5.0 and out.lerp_value.iloc[0] == 5.0
    assert not out.is_filled.iloc[0]


def test_no_gaps_identity(spark):
    tier = _tier(
        spark,
        [("y", "2024-01-01 00:00:00", 1.0), ("y", "2024-01-01 00:01:00", 2.0)],
    )
    out = gapfill_grid(tier, "v", "1 minute", "minute").toPandas()
    assert len(out) == 2 and not out.is_filled.any()
    assert out.sort_values("bucket_ts").lerp_value.tolist() == [1.0, 2.0]


def test_null_value_bucket_is_interpolated(spark):
    """A present bucket with NULL value behaves like a hole for locf/lerp."""
    tier = _tier(
        spark,
        [
            ("z", "2024-01-01 00:00:00", 2.0),
            ("z", "2024-01-01 00:01:00", None),
            ("z", "2024-01-01 00:02:00", 4.0),
        ],
    )
    out = (
        gapfill_grid(tier, "v", "1 minute", "minute")
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert out.locf_value.tolist() == [2.0, 2.0, 4.0]
    assert math.isclose(out.lerp_value.iloc[1], 3.0)
