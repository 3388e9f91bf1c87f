"""Goldens for corpus distribution shape: Lorenz/Pareto turn-share
deciles, the Gini coefficient (block-decomposed rank form), and the
Benford first-digit profile."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.distribution import (
    benford_first_digit,
    gini_turns,
    turn_share_deciles,
)


def _t(spark, conv_turns):
    """{conv_id: n_turns} -> minimal transcripts frame."""
    rows = [
        (c, i, "user", "x", None, "2024-01-01 00:00:00")
        for c, n in conv_turns.items()
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _sig(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, inter_time_us long"
    )


def test_deciles_distinct_counts(spark):
    # 5 convs, counts desc 5,4,3,2,1 (total 15); decile(r) = (r-1)*2
    out = {
        r["decile"]: r
        for r in turn_share_deciles(
            _t(spark, {"a": 5, "b": 4, "c": 3, "d": 2, "e": 1})
        ).collect()
    }
    assert set(out) == {0, 2, 4, 6, 8}
    assert all(r["n_convs"] == 1 for r in out.values())
    assert out[0]["sum_turns"] == 5
    assert out[8]["sum_turns"] == 1
    assert math.isclose(out[0]["turn_share"], 5 / 15)
    assert math.isclose(
        sum(r["turn_share"] for r in out.values()), 1.0, abs_tol=1e-12
    )


def test_deciles_tie_block_split(spark):
    # counts desc [3,3,1]: n=3, decile(r) = (r-1)*10 div 3 -> 0, 3, 6.
    # The k=2 tie block at ranks 1-2 must split across deciles 0 and 3
    # with one conversation (3 turns) each.
    out = {
        r["decile"]: r
        for r in turn_share_deciles(
            _t(spark, {"a": 3, "b": 3, "c": 1})
        ).collect()
    }
    assert set(out) == {0, 3, 6}
    assert out[0]["n_convs"] == 1 and out[0]["sum_turns"] == 3
    assert out[3]["n_convs"] == 1 and out[3]["sum_turns"] == 3
    assert out[6]["n_convs"] == 1 and out[6]["sum_turns"] == 1
    assert math.isclose(out[6]["turn_share"], 1 / 7)


def test_gini_hand_computed_and_equal(spark):
    # counts asc [1,2,3]: S1=6, S2=1+4+9=14, G=(28-24)/18 = 2/9
    r = gini_turns(_t(spark, {"a": 1, "b": 2, "c": 3})).collect()[0]
    assert (r["n_convs"], r["total_turns"]) == (3, 6)
    assert math.isclose(r["gini"], 2 / 9)
    # perfectly equal counts -> 0 (tie-block arithmetic-series path)
    r = gini_turns(_t(spark, {"a": 2, "b": 2, "c": 2, "d": 2})).collect()[0]
    assert r["gini"] == 0.0


def test_benford_digits_and_shares(spark):
    rows = [
        ("a", 0, 1, 0),
        ("a", 1, 19, 0),
        ("a", 2, 25, 0),
        ("a", 3, 3, 0),
        ("a", 4, 999, 0),
        ("a", 5, 0, 0),  # non-positive excluded
    ]
    out = {r["digit"]: r for r in benford_first_digit(_sig(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert out[1]["n_values"] == 2
    assert math.isclose(out[1]["share"], 2 / 5)
    assert math.isclose(out[9]["share"], 1 / 5)


def test_doc_len_quartiles_hand_computed(spark):
    from aroma_spark.operators.distribution import doc_len_quartiles_by_lang

    rows = [(i, f"d{i}", "en", "web", n)
            for i, n in enumerate([10, 20, 30, 40])]
    rows += [(99, "x", "fr", "web", 7)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long")
    out = {r["lang"]: r
           for r in doc_len_quartiles_by_lang(df).collect()}
    en = out["en"]
    # n=4: ranks ceil(1)=1, ceil(2)=2, ceil(3)=3, ceil(3.8)=4
    assert (en["n_docs"], en["p25_chars"], en["p50_chars"],
            en["p75_chars"], en["p95_chars"]) == (4, 10, 20, 30, 40)
    fr = out["fr"]
    # n=1: every quantile is the single value
    assert (fr["n_docs"], fr["p25_chars"], fr["p95_chars"]) == (1, 7, 7)


def test_median_text_len_by_role(spark):
    from aroma_spark.operators.distribution import median_text_len_by_role

    rows = [
        ("a", 0, "view", 10), ("a", 1, "view", 30), ("a", 2, "view", 20),
        ("a", 3, "click", 5), ("a", 4, "click", 7),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text_len long")
    out = {r["role"]: r for r in median_text_len_by_role(df).collect()}
    assert (out["view"]["n_turns"], out["view"]["median_text_len"]) == (
        3, 20)
    assert out["click"]["median_text_len"] == 5


def test_median_latency_by_role(spark):
    from aroma_spark.operators.distribution import median_latency_by_role

    rows = [
        ("a", 0, "view", 10), ("a", 1, "view", 30), ("a", 2, "view", 20),
        ("a", 3, "click", 100),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string,"
        " inter_time_us long")
    out = {r["role"]: r for r in median_latency_by_role(df).collect()}
    assert (out["view"]["n_turns"],
            out["view"]["median_latency_us"]) == (3, 20)
    assert out["click"]["median_latency_us"] == 100
