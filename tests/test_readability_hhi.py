"""Goldens for the readability/concentration pair: Flesch scores from
deterministic counts (functions/text.py) and per-conversation role
HHI (operators/sessions.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.functions.text import readability
from aroma_spark.operators.sessions import role_concentration


def test_readability_hand_computed(spark):
    # "The cat sat. It was flat!": 6 words, 2 sentences, 6 vowel
    # groups. flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    # fk = 0.39*3 + 11.8*1 - 15.59 = -2.62
    df = spark.createDataFrame(
        [(1, "The cat sat. It was flat!")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["flesch"] == 119.19
    assert r["fk_grade"] == -2.62


def test_readability_vowel_groups_not_vowels(spark):
    # "queue beauty" -> groups: 'ueue', 'eau', 'y' -> 3
    df = spark.createDataFrame(
        [(1, "queue beauty.")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    assert r["n_syllables"] == 3
    assert r["n_words"] == 2


def test_readability_empty_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in readability(df).collect()}
    assert out[1]["n_words"] == 0
    assert out[1]["flesch"] is None
    assert out[2]["flesch"] is None


def test_readability_no_terminal_punct(spark):
    df = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    assert (r["n_sentences"], r["flesch"]) == (0, None)


# ---------------------------------------------------------------- HHI


def _sig(spark, rows):
    """rows = (conv_id, role, text_len)."""
    return spark.createDataFrame(
        rows, "conv_id string, role string, text_len long"
    )


def test_hhi_hand_computed(spark):
    # role a volume 3 (1+2), role b volume 1: hhi = (9+1)/16 = 0.625
    rows = [("c", "a", 1), ("c", "a", 2), ("c", "b", 1)]
    r = role_concentration(_sig(spark, rows)).collect()[0]
    assert (r["n_roles"], r["total_text_len"], r["top_role_text_len"]) == (2, 4, 3)
    assert r["hhi"] == 0.625


def test_hhi_monologue_one(spark):
    rows = [("c", "a", 2), ("c", "a", 3)]
    r = role_concentration(_sig(spark, rows)).collect()[0]
    assert (r["n_roles"], r["hhi"]) == (1, 1.0)


def test_hhi_balanced_half(spark):
    rows = [("c", "a", 5), ("c", "b", 5)]
    r = role_concentration(_sig(spark, rows)).collect()[0]
    assert r["hhi"] == 0.5


def test_hhi_zero_volume_dropped(spark):
    rows = [("c", "a", 0), ("c", "b", 0)]
    assert role_concentration(_sig(spark, rows)).count() == 0
