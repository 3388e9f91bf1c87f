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


# -------------------------------------------------- timed conversion


def _tc_sig(spark, rows):
    """rows = (conv_id, turn_idx, role, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_timed_conversion_hand_computed(spark):
    from aroma_spark.operators.cohorts import timed_conversion

    rows = [
        # a: view then purchase 30 min later -> within 1h
        ("a", 0, "view", "2024-01-01 10:00:00"),
        ("a", 1, "purchase", "2024-01-01 10:30:00"),
        # b: view then purchase 2h later -> converted but not windowed
        ("b", 0, "view", "2024-01-01 10:00:00"),
        ("b", 1, "purchase", "2024-01-01 12:00:00"),
        # c: purchase BEFORE view -> not a conversion
        ("c", 0, "purchase", "2024-01-01 09:00:00"),
        ("c", 1, "view", "2024-01-01 10:00:00"),
        # d: view only
        ("d", 0, "view", "2024-01-01 10:00:00"),
        # e: no view at all
        ("e", 0, "click", "2024-01-01 10:00:00"),
    ]
    r = timed_conversion(_tc_sig(spark, rows)).collect()[0]
    assert (r["n_convs"], r["n_with_a"]) == (5, 4)
    assert (r["n_with_b_after"], r["n_within_window"]) == (2, 1)
    assert r["conversion_rate"] == 0.5
    assert r["windowed_rate"] == 0.25
    assert r["min_delay_us"] == 1_800_000_000
    assert r["max_delay_us"] == 7_200_000_000


def test_timed_conversion_same_instant_counts(spark):
    from aroma_spark.operators.cohorts import timed_conversion

    rows = [
        ("a", 0, "view", "2024-01-01 10:00:00"),
        ("a", 1, "purchase", "2024-01-01 10:00:00"),
    ]
    r = timed_conversion(_tc_sig(spark, rows)).collect()[0]
    assert (r["n_with_b_after"], r["min_delay_us"]) == (1, 0)


def test_order_status_priority(spark):
    from aroma_spark.operators.tpch import order_status_priority

    orders = spark.createDataFrame(
        [
            ("1-URGENT", "O", 10.00),
            ("1-URGENT", "O", 5.00),
            ("1-URGENT", "F", 1.00),
            ("3-MEDIUM", "F", 2.00),
        ],
        "o_orderpriority string, o_orderstatus string, o_totalprice double",
    )
    out = {
        (r["o_orderpriority"], r["o_orderstatus"]): r
        for r in order_status_priority(orders).collect()
    }
    u_o = out[("1-URGENT", "O")]
    assert (u_o["n_orders"], u_o["total_cents"], u_o["n_priority"]) == (2, 1500, 3)
    assert u_o["status_share"] == round(2 / 3, 6)
    assert out[("3-MEDIUM", "F")]["status_share"] == 1.0
