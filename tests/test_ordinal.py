"""Goldens for the ordinal-analysis wave: exact Kendall tau-b pair
counts and order-3 permutation entropy (operators/ordinal.py)."""

from __future__ import annotations

import math

from aroma_spark.operators.ordinal import kendall_tau, perm_entropy


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, text_len, inter_time_us)."""
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text_len long, inter_time_us long",
    )


def _conv(conv, xs, ys):
    return [(conv, i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]


def test_kendall_perfect_concordance(spark):
    r = kendall_tau(
        _sig(spark, _conv("a", [1, 2, 3, 4], [10, 20, 30, 40]))
    ).collect()[0]
    assert (r["n_pairs"], r["concordant"], r["discordant"]) == (6, 6, 0)
    assert math.isclose(r["tau_b"], 1.0)


def test_kendall_perfect_discordance(spark):
    r = kendall_tau(
        _sig(spark, _conv("a", [1, 2, 3, 4], [40, 30, 20, 10]))
    ).collect()[0]
    assert math.isclose(r["tau_b"], -1.0)


def test_kendall_tie_accounting(spark):
    # x=[1,1,2,2], y=[1,2,1,2]: pairs split C=1 D=1 ties_x=2 ties_y=2;
    # tau_b = 0 / sqrt(4*4) = 0.
    r = kendall_tau(
        _sig(spark, _conv("a", [1, 1, 2, 2], [1, 2, 1, 2]))
    ).collect()[0]
    assert (r["concordant"], r["discordant"]) == (1, 1)
    assert (r["ties_x"], r["ties_y"], r["ties_xy"]) == (2, 2, 0)
    assert math.isclose(r["tau_b"], 0.0)


def test_kendall_degenerate_margin_null(spark):
    # constant x -> every pair tied in x -> denominator 0 -> NULL.
    r = kendall_tau(
        _sig(spark, _conv("a", [5, 5, 5, 5], [1, 2, 3, 4]))
    ).collect()[0]
    assert r["tau_b"] is None
    assert r["ties_x"] == 6


def test_kendall_min_turns_filter(spark):
    rows = _conv("short", [1, 2, 3], [1, 2, 3]) + _conv(
        "long", [1, 2, 3, 4], [1, 2, 3, 4]
    )
    out = kendall_tau(_sig(spark, rows)).collect()
    assert [r["conv_id"] for r in out] == ["long"]


def test_perm_entropy_monotone_is_zero(spark):
    r = perm_entropy(
        _sig(spark, _conv("a", [1, 2, 3, 4, 5], [0] * 5))
    ).collect()[0]
    assert (r["n_triples"], r["c7"]) == (3, 3)
    assert math.isclose(r["entropy"], 0.0)
    assert math.isclose(r["norm_entropy"], 0.0)


def test_perm_entropy_alternating(spark):
    # [1,2,1,2,1]: triples -> ids 6,3,6; H = ln3 - (2/3)ln2.
    r = perm_entropy(
        _sig(spark, _conv("a", [1, 2, 1, 2, 1], [0] * 5))
    ).collect()[0]
    assert (r["c6"], r["c3"]) == (2, 1)
    h = math.log(3) - (2 / 3) * math.log(2)
    assert math.isclose(r["entropy"], round(h, 6), abs_tol=1e-9)
    assert math.isclose(
        r["norm_entropy"], round(h / math.log(6), 6), abs_tol=1e-9
    )


def test_perm_entropy_tie_breaks_by_position(spark):
    # triple (5,5,3): x0<=x1 (position order), both > x2 -> id 4.
    r = perm_entropy(
        _sig(spark, _conv("a", [5, 5, 3, 1], [0] * 4))
    ).collect()[0]
    assert r["c4"] >= 1


def test_perm_entropy_min_turns_filter(spark):
    rows = _conv("short", [1, 2, 3], [0] * 3) + _conv(
        "long", [1, 2, 3, 4], [0] * 4
    )
    out = perm_entropy(_sig(spark, rows)).collect()
    assert [r["conv_id"] for r in out] == ["long"]
