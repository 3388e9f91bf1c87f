"""Goldens for the corpus-dynamics pair: day-over-day top-K term
overlap and per-term Fano burstiness (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.functions.text import term_fano, top_terms_overlap_daily


def _docs(spark, rows):
    """rows = (conv_id, turn_idx, text, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


# ------------------------------------------------------ top-K overlap


def test_topterms_hand_computed(spark):
    # day1 counts: a:2 b:1 c:1 -> top2 (count desc, term asc) = {a, b}
    # day2 counts: b:2 c:1 d:1 -> top2 = {b, c}
    # common={b} -> jaccard = 1/(2+2-1) = 0.333333
    rows = [
        ("x", 0, "a a b", "2024-01-01 01:00:00"),
        ("x", 1, "c", "2024-01-01 02:00:00"),
        ("y", 0, "b b c", "2024-01-02 01:00:00"),
        ("y", 1, "d", "2024-01-02 02:00:00"),
    ]
    out = top_terms_overlap_daily(_docs(spark, rows), k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["k_prev"], r["k_cur"], r["n_common"]) == (2, 2, 1)
    assert r["jaccard"] == 0.333333


def test_topterms_identical_days(spark):
    rows = [
        ("x", 0, "a b c", "2024-01-01 01:00:00"),
        ("y", 0, "a b c", "2024-01-02 01:00:00"),
    ]
    r = top_terms_overlap_daily(_docs(spark, rows), k=3).collect()[0]
    assert (r["n_common"], r["jaccard"]) == (3, 1.0)


def test_topterms_disjoint_zero(spark):
    rows = [
        ("x", 0, "a b", "2024-01-01 01:00:00"),
        ("y", 0, "c d", "2024-01-02 01:00:00"),
    ]
    r = top_terms_overlap_daily(_docs(spark, rows), k=2).collect()[0]
    assert (r["n_common"], r["jaccard"]) == (0, 0.0)


def test_topterms_tie_cut_deterministic(spark):
    # day1 all counts 1: top2 by term asc = {a, b}; day2 = {a, z}?
    # day2 terms a:1 z:1 -> top2 = {a, z}; common={a} -> 1/3
    rows = [
        ("x", 0, "c b a", "2024-01-01 01:00:00"),
        ("y", 0, "z a", "2024-01-02 01:00:00"),
    ]
    r = top_terms_overlap_daily(_docs(spark, rows), k=2).collect()[0]
    assert (r["n_common"], r["jaccard"]) == (1, 0.333333)


def test_topterms_gap_days_skipped(spark):
    rows = [
        ("x", 0, "a", "2024-01-01 01:00:00"),
        ("y", 0, "a", "2024-01-03 01:00:00"),
    ]
    assert top_terms_overlap_daily(_docs(spark, rows), k=1).count() == 0


# ------------------------------------------------------------- Fano


def test_fano_bursty_hand_computed(spark):
    # term "x": daily counts [4, 0, 2] across the 3 corpus days
    # (absent on day 2): total=6, sumsq=20, n_days=3
    # fano = (3*20 - 36)/(6*2) = 2.0
    rows = [
        ("a", 0, "x x x x", "2024-01-01 01:00:00"),
        ("a", 1, "pad pad pad", "2024-01-02 01:00:00"),  # keeps day 2 alive
        ("a", 2, "x x", "2024-01-03 01:00:00"),
    ]
    out = term_fano(_docs(spark, rows), min_total=3).collect()
    by_term = {r["term"]: r for r in out}
    r = by_term["x"]
    assert (r["n_days"], r["total_count"], r["sumsq_daily"]) == (3, 6, 20)
    assert r["fano"] == 2.0
    assert by_term["pad"]["fano"] == 3.0  # [0,3,0]: (3*9-9)/(3*2)=3


def test_fano_uniform_zero(spark):
    # [2,2,2]: sample variance 0 -> fano 0
    rows = [
        ("a", 0, "w w", "2024-01-01 01:00:00"),
        ("a", 1, "w w", "2024-01-02 01:00:00"),
        ("a", 2, "w w", "2024-01-03 01:00:00"),
    ]
    r = term_fano(_docs(spark, rows), min_total=3).collect()[0]
    assert (r["total_count"], r["fano"]) == (6, 0.0)


def test_fano_min_total_filter(spark):
    rows = [("a", 0, "rare", "2024-01-01 01:00:00")]
    assert term_fano(_docs(spark, rows), min_total=2).count() == 0


def test_fano_single_day_null(spark):
    rows = [("a", 0, "w w w", "2024-01-01 01:00:00")]
    r = term_fano(_docs(spark, rows), min_total=3).collect()[0]
    assert r["fano"] is None
