"""Goldens for the 5k pair: adjacent-turn token-set overlap (agent
loop detection, operators/seqshape.py) and exact nearest-rank latency
percentile bands (operators/robust.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.robust import latency_percentiles_by_bucket
from aroma_spark.operators.seqshape import turn_overlap


def _t(spark, rows):
    """rows = (conv_id, turn_idx, text)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def test_overlap_basic_jaccard(spark):
    out = {
        r["turn_idx"]: r
        for r in turn_overlap(
            _t(spark, [("a", 0, "x y z"), ("a", 1, "x y q"), ("a", 2, "x y q")])
        ).collect()
    }
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_terms"], r1["n_prev_terms"], r1["n_common"]) == (3, 3, 2)
    assert math.isclose(r1["jaccard"], 0.5)
    assert math.isclose(out[2]["jaccard"], 1.0)  # exact repetition


def test_overlap_duplicate_tokens_collapse(spark):
    r = turn_overlap(
        _t(spark, [("a", 0, "x x y"), ("a", 1, "y y x")])
    ).collect()[0]
    assert (r["n_terms"], r["n_prev_terms"], r["n_common"]) == (2, 2, 2)
    assert math.isclose(r["jaccard"], 1.0)


def test_overlap_empty_turns(spark):
    out = {
        r["turn_idx"]: r
        for r in turn_overlap(
            _t(spark, [("a", 0, "x y z"), ("a", 1, ""), ("a", 2, None)])
        ).collect()
    }
    assert math.isclose(out[1]["jaccard"], 0.0)  # empty vs 3 terms
    assert out[2]["jaccard"] is None  # empty vs empty: union 0


def test_overlap_never_crosses_conversations(spark):
    out = turn_overlap(
        _t(spark, [("a", 0, "x y"), ("b", 0, "x y"), ("b", 1, "x y")])
    ).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in out] == [("b", 1)]


def _sig(spark, values, day="2024-01-01"):
    rows = [
        ("c", i, v, f"{day} {i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, inter_time_us long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_percentiles_hundred_points(spark):
    r = latency_percentiles_by_bucket(
        _sig(spark, list(range(1, 101)))
    ).collect()[0]
    assert (r["n_points"], r["p50"], r["p90"], r["p95"], r["p99"]) == (
        100, 50, 90, 95, 99,
    )
    assert r["max_inter_time_us"] == 100


def test_percentiles_nearest_rank_rounds_up(spark):
    # n=10: p95 rank ceil(9.5)=10 -> the max; p50 rank 5.
    r = latency_percentiles_by_bucket(
        _sig(spark, [10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
    ).collect()[0]
    assert (r["p50"], r["p90"], r["p95"], r["p99"]) == (50, 90, 100, 100)


def test_percentiles_single_point(spark):
    r = latency_percentiles_by_bucket(_sig(spark, [42])).collect()[0]
    assert (r["p50"], r["p90"], r["p95"], r["p99"]) == (42, 42, 42, 42)
