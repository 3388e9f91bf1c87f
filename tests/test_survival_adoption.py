"""Goldens for the survival/adoption pair (operators/cohorts.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.cohorts import (
    conv_length_survival,
    tool_adoption_daily,
)


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, tool, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_survival_hand_computed(spark):
    # lengths [1,1,2,4]: at len 1 all 4 at risk, 2 die (hazard .5);
    # at 2: 2 at risk, 1 dies; at 4: 1 at risk, 1 dies
    rows = []
    for conv, n in [("a", 1), ("b", 1), ("c", 2), ("d", 4)]:
        rows += [(conv, i, None, f"2024-01-01 0{i}:00:00") for i in range(n)]
    out = {r["conv_len"]: r for r in conv_length_survival(_sig(spark, rows)).collect()}
    assert (out[1]["n_deaths"], out[1]["n_at_risk"]) == (2, 4)
    assert (out[1]["hazard"], out[1]["survival"]) == (0.5, 1.0)
    assert (out[2]["n_deaths"], out[2]["n_at_risk"], out[2]["hazard"]) == (1, 2, 0.5)
    assert (out[4]["n_at_risk"], out[4]["hazard"], out[4]["survival"]) == (1, 1.0, 0.25)


def test_survival_uniform_lengths(spark):
    rows = []
    for conv in ["a", "b", "c"]:
        rows += [(conv, i, None, f"2024-01-01 0{i}:00:00") for i in range(2)]
    out = conv_length_survival(_sig(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["conv_len"], r["n_deaths"], r["n_at_risk"]) == (2, 3, 3)
    assert (r["hazard"], r["survival"]) == (1.0, 1.0)


def test_adoption_hand_computed(spark):
    rows = [
        ("a", 0, None, "2024-01-01 10:00:00"),
        ("a", 1, "fn", "2024-01-02 10:00:00"),
        ("b", 0, None, "2024-01-01 11:00:00"),
        ("c", 0, "fn", "2024-01-03 09:00:00"),
    ]
    out = {r["day_ts"].day: r for r in tool_adoption_daily(_sig(spark, rows)).collect()}
    assert (out[1]["n_started_cum"], out[1]["n_adopted_cum"], out[1]["adoption_rate"]) == (2, 0, 0.0)
    assert (out[2]["n_started_cum"], out[2]["n_adopted_cum"], out[2]["adoption_rate"]) == (2, 1, 0.5)
    assert (out[3]["n_started_cum"], out[3]["n_adopted_cum"], out[3]["adoption_rate"]) == (3, 2, 0.666667)


def test_adoption_empty_tool_string_not_adoption(spark):
    rows = [
        ("a", 0, "", "2024-01-01 10:00:00"),
        ("a", 1, None, "2024-01-01 11:00:00"),
    ]
    out = tool_adoption_daily(_sig(spark, rows)).collect()
    assert len(out) == 1
    assert (out[0]["n_started_cum"], out[0]["n_adopted_cum"]) == (1, 0)


def test_adoption_never_exceeds_one(spark):
    rows = [
        ("a", 0, "fn", "2024-01-01 10:00:00"),
        ("b", 0, "fn", "2024-01-01 11:00:00"),
    ]
    r = tool_adoption_daily(_sig(spark, rows)).collect()[0]
    assert r["adoption_rate"] == 1.0
