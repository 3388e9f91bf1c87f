"""Goldens for the diversity/fatigue pair: conversation type-token
ratio (functions/text.py) and latency-by-depth profile
(operators/robust.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.functions.text import conversation_ttr
from aroma_spark.operators.robust import latency_by_depth


def test_ttr_hand_computed(spark):
    # terms: x:2, y:1, z:1 -> tokens 4, types 3, hapax 2, ttr 0.75
    df = spark.createDataFrame(
        [("a", "x y x"), ("a", "z")], "conv_id string, text string"
    )
    r = conversation_ttr(df).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (4, 3, 2)
    assert r["ttr"] == 0.75


def test_ttr_looping_agent_low(spark):
    df = spark.createDataFrame(
        [("a", "go go go go")], "conv_id string, text string"
    )
    r = conversation_ttr(df).collect()[0]
    assert (r["n_types"], r["n_hapax"], r["ttr"]) == (1, 0, 0.25)


def test_ttr_all_distinct_one(spark):
    df = spark.createDataFrame(
        [("a", "p q r")], "conv_id string, text string"
    )
    r = conversation_ttr(df).collect()[0]
    assert r["ttr"] == 1.0


def test_ttr_empty_conv_dropped(spark):
    df = spark.createDataFrame(
        [("a", ""), ("a", None)], "conv_id string, text string"
    )
    assert conversation_ttr(df).count() == 0


# ---------------------------------------------------- latency by depth


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, inter_time_us)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, inter_time_us long"
    )


def test_depth_hand_computed(spark):
    # turn_idx 0..12, v = idx*10: bucket 0 has v 0..90 (n=10, sum=450,
    # p50 = rank-5 of sorted = 40, mean 45); bucket 1 has 100,110,120
    rows = [("a", i, i * 10) for i in range(13)]
    out = {r["depth_bucket"]: r for r in latency_by_depth(_sig(spark, rows)).collect()}
    b0, b1 = out[0], out[1]
    assert (b0["n_turns"], b0["sum_latency_us"]) == (10, 450)
    assert (b0["p50_latency_us"], b0["max_latency_us"]) == (40, 90)
    assert b0["mean_latency_us"] == 45.0
    assert (b1["n_turns"], b1["p50_latency_us"], b1["mean_latency_us"]) == (3, 110, 110.0)


def test_depth_mixes_conversations(spark):
    rows = [("a", 0, 100), ("b", 1, 300), ("c", 5, 200)]
    r = latency_by_depth(_sig(spark, rows)).collect()[0]
    assert (r["depth_bucket"], r["n_turns"], r["p50_latency_us"]) == (0, 3, 200)


def test_depth_bucket_width(spark):
    rows = [("a", 0, 1), ("a", 4, 2), ("a", 5, 3)]
    out = {r["depth_bucket"]: r["n_turns"] for r in latency_by_depth(_sig(spark, rows), bucket_width=5).collect()}
    assert out == {0: 2, 1: 1}
