"""Dedup + normalization semantics (reference O2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.normalize import (
    dedup_exact,
    normalize,
    sequence_content_hash,
)


def test_full_record_dedup(spark, tiny_transcripts):
    """The injected duplicate row (b,0) collapses; everything else stays
    (reference: src/aroma/datasets/breakfast.py:597-618)."""
    assert tiny_transcripts.count() == 8
    out = dedup_exact(tiny_transcripts)
    assert out.count() == 7
    assert out.where((F.col("conv_id") == "b") & (F.col("turn_idx") == 0)).count() == 1


def test_keyed_dedup_deterministic_survivor(spark):
    rows = [
        ("k", 0, "user", "first", None, "2024-01-01 00:00:00"),
        ("k", 0, "user", "second", None, "2024-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dedup_exact(df, keys=["conv_id", "turn_idx"]).collect()
    assert len(out) == 1 and out[0].text == "first"


def test_normalize_casts_and_dedups(spark):
    rows = [("c1", "0", "user", "t", None, "2024-01-01 00:00:00")] * 2
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx string, role string, text string, tool string, ts string"
    )
    out = normalize(df)
    assert out.count() == 1
    assert dict(out.dtypes)["turn_idx"] == "int"
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_sequence_content_hash_detects_duplicate_conversations(spark):
    rows = []
    for cid in ("s1", "s2"):  # identical content, different conv ids
        rows += [
            (cid, 0, "user", "hello", None, "2024-01-01 00:00:00"),
            (cid, 1, "assistant", "world", None, "2024-01-01 00:01:00"),
        ]
    rows += [("s3", 0, "user", "different", None, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    h = sequence_content_hash(df).toPandas()
    assert h[h.conv_id == "s1"].content_hash.iloc[0] == h[h.conv_id == "s2"].content_hash.iloc[0]
    assert h[h.conv_id == "s3"].content_hash.iloc[0] != h[h.conv_id == "s1"].content_hash.iloc[0]
