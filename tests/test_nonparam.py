"""Goldens for the nonparametric wave: exact KS day-over-day drift,
exact Mann-Whitney U via cumulative counting, Theil-Sen median slope
(operators/nonparam.py). Every expected value is hand-computed."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.nonparam import (
    ks_day_drift,
    mann_whitney_daily,
    theil_sen,
)


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, role, text_len, inter_time_us, ts)."""
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text_len long,"
        " inter_time_us long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def _day_rows(day, values, role="user", conv="a"):
    return [
        (conv, i, role, v, v, f"{day} 0{i % 10}:00:00")
        for i, v in enumerate(values)
    ]


# ---------------------------------------------------------------- KS


def test_ks_hand_computed(spark):
    # prev day [1,2,3] vs cur day [2,3,4,4]:
    # v=1: |1*4-0*3|=4; v=2: |2*4-1*3|=5; v=3: |3*4-2*3|=6;
    # v=4: |3*4-4*3|=0  ->  d_num=6, D=6/(3*4)=0.5
    rows = _day_rows("2024-01-01", [1, 2, 3]) + _day_rows(
        "2024-01-02", [2, 3, 4, 4]
    )
    out = ks_day_drift(_sig(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_prev"], r["n_cur"], r["d_num"]) == (3, 4, 6)
    assert r["ks_d"] == 0.5


def test_ks_identical_days_zero(spark):
    rows = _day_rows("2024-01-01", [5, 7, 7]) + _day_rows(
        "2024-01-02", [5, 7, 7]
    )
    r = ks_day_drift(_sig(spark, rows)).collect()[0]
    assert (r["d_num"], r["ks_d"]) == (0, 0.0)


def test_ks_disjoint_days_one(spark):
    # fully separated samples -> D = 1
    rows = _day_rows("2024-01-01", [1, 2]) + _day_rows("2024-01-02", [9, 9])
    r = ks_day_drift(_sig(spark, rows)).collect()[0]
    assert (r["d_num"], r["ks_d"]) == (4, 1.0)


def test_ks_skips_gap_days(spark):
    # Jan 1 and Jan 3 present, Jan 2 absent -> no consecutive pair
    rows = _day_rows("2024-01-01", [1]) + _day_rows("2024-01-03", [2])
    assert ks_day_drift(_sig(spark, rows)).count() == 0


# ------------------------------------------------------ Mann-Whitney


def test_mw_hand_computed(spark):
    # a=[5,10], b=[1,5,20]: wins_a=3 (5>1, 10>1, 10>5), ties=1 (5=5)
    # u2 = 2*3+1 = 7, U=3.5, AUC = 3.5/6 = 0.583333
    rows = _day_rows("2024-01-01", [5, 10], role="assistant") + _day_rows(
        "2024-01-01", [1, 5, 20], role="user", conv="b"
    )
    out = mann_whitney_daily(_sig(spark, rows), value_col="text_len").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (2, 3)
    assert (r["wins_a"], r["ties_pairs"], r["u2_a"]) == (3, 1, 7)
    assert r["auc_a"] == 0.583333


def test_mw_total_dominance(spark):
    rows = _day_rows("2024-01-01", [10, 20], role="assistant") + _day_rows(
        "2024-01-01", [1, 2], role="user", conv="b"
    )
    r = mann_whitney_daily(_sig(spark, rows), value_col="text_len").collect()[0]
    assert (r["wins_a"], r["u2_a"], r["auc_a"]) == (4, 8, 1.0)


def test_mw_requires_both_roles(spark):
    rows = _day_rows("2024-01-01", [1, 2], role="assistant")
    assert (
        mann_whitney_daily(_sig(spark, rows), value_col="text_len").count() == 0
    )


def test_mw_ignores_other_roles(spark):
    rows = (
        _day_rows("2024-01-01", [5], role="assistant")
        + _day_rows("2024-01-01", [1], role="user", conv="b")
        + _day_rows("2024-01-01", [100, 100], role="system", conv="c")
    )
    r = mann_whitney_daily(_sig(spark, rows), value_col="text_len").collect()[0]
    assert (r["n_a"], r["n_b"], r["wins_a"]) == (1, 1, 1)


# ---------------------------------------------------------- Theil-Sen


def test_theil_sen_hand_computed(spark):
    # y=[1,2,4,4] at x=[0,1,2,3]: slopes sorted with (dy,dx) tie-break:
    # (0,1) 0.0 | (1,1) 1.0 | (2,2) 1.0 | (3,3) 1.0 | (3,2) 1.5 | (2,1) 2.0
    # n_pairs=6, target rk=(6+1)//2=3 -> (2,2) -> slope 1.0
    rows = _day_rows("2024-01-01", [1, 2, 4, 4])
    r = theil_sen(_sig(spark, rows)).collect()[0]
    assert (r["n_turns"], r["n_pairs"]) == (4, 6)
    assert (r["slope_num"], r["slope_den"], r["slope"]) == (2, 2, 1.0)


def test_theil_sen_negative_slope(spark):
    # y=[10,7,4,1]: every slope -3; sorted by (dy asc): (-9,3), (-6,2),
    # (-6,2), (-3,1)x3 -> rk3 = (-6,2) -> slope -3.0
    rows = _day_rows("2024-01-01", [10, 7, 4, 1])
    r = theil_sen(_sig(spark, rows)).collect()[0]
    assert (r["slope_num"], r["slope_den"], r["slope"]) == (-6, 2, -3.0)


def test_theil_sen_min_turns_filter(spark):
    rows = _day_rows("2024-01-01", [1, 2, 3])  # 3 turns < MIN_TURNS
    assert theil_sen(_sig(spark, rows)).count() == 0


def test_theil_sen_outlier_resistance(spark):
    # y=[0,1,2,3,1000] at x=[0..4]: OLS slope would be huge; the median
    # pairwise slope stays 1. 10 pairs, 6 of them slope 1.0:
    # (1,1)x4 wait - pairs among first four all slope 1; pairs with the
    # outlier: (1000,4),(999,3),(998,2),(997,1). Sorted doubles:
    # 1.0 x6 then 250,333,499,997 -> rk (10+1)//2=5 is within the 1.0
    # block: block order by dy: (1,1),(1,1),(1,1),(2,2),(2,2),(3,3)
    # -> rk5 = (2,2) -> slope 1.0
    rows = _day_rows("2024-01-01", [0, 1, 2, 3, 1000])
    r = theil_sen(_sig(spark, rows)).collect()[0]
    assert (r["n_pairs"], r["slope"]) == (10, 1.0)
    assert (r["slope_num"], r["slope_den"]) == (2, 2)


# ------------------------------------------------------- runs test


def _sig_tool(spark, rows):
    """rows = (conv_id, turn_idx, role, text_len, tool_call, ts)."""
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text_len long,"
        " tool_call long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_runs_hand_computed(spark):
    # [1,5,2,6,3,7]: median rank (6+1)//2=3 of sorted [1,2,3,5,6,7] ->
    # med=3; signs in turn order (3 dropped): -,+,-,+,+ -> 4 runs,
    # n_plus=3, n_minus=2. mu=1+12/5=3.4, var=12*7/100=0.84,
    # z=(4-3.4)/sqrt(0.84)=0.654654
    from aroma_spark.operators.nonparam import runs_test

    rows = _day_rows("2024-01-01", [1, 5, 2, 6, 3, 7])
    r = runs_test(_sig(spark, rows)).collect()[0]
    assert (r["n_turns"], r["median_value"]) == (6, 3)
    assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (3, 2, 4)
    assert r["z"] == 0.654654


def test_runs_clumped_one_sided_null_z(spark):
    # [1,1,9,9]: med (rank 2) = 1; ties dropped -> only +,+ -> one run,
    # n_minus=0 -> z undefined
    from aroma_spark.operators.nonparam import runs_test

    rows = _day_rows("2024-01-01", [1, 1, 9, 9])
    r = runs_test(_sig(spark, rows)).collect()[0]
    assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (2, 0, 1)
    assert r["z"] is None


def test_runs_constant_conv_dropped(spark):
    from aroma_spark.operators.nonparam import runs_test

    rows = _day_rows("2024-01-01", [7, 7, 7, 7])
    assert runs_test(_sig(spark, rows)).count() == 0


def test_runs_min_turns(spark):
    from aroma_spark.operators.nonparam import runs_test

    rows = _day_rows("2024-01-01", [1, 2, 3])
    assert runs_test(_sig(spark, rows)).count() == 0


# ----------------------------------------------------- phi / log-odds


def test_phi_hand_computed(spark):
    # a=3 (A,tool), b=1, c=1, d=3: phi=(9-1)/sqrt(4^4)=0.5,
    # log_odds=ln(9)=2.197225
    from aroma_spark.operators.nonparam import phi_association_daily

    rows = []
    for i, tc in enumerate([1, 1, 1, 0]):  # role A: a=3, b=1
        rows.append(("a", i, "assistant", 1, tc, f"2024-01-01 0{i}:00:00"))
    for i, tc in enumerate([1, 0, 0, 0]):  # role B: c=1, d=3
        rows.append(("b", i, "user", 1, tc, f"2024-01-01 1{i}:00:00"))
    r = phi_association_daily(_sig_tool(spark, rows)).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 1, 1, 3)
    assert r["phi"] == 0.5
    assert r["log_odds"] == 2.197225


def test_phi_zero_cell_null_log_odds(spark):
    # a=2,b=0,c=1,d=1: phi = 2/sqrt(2*2*3*1) = 0.577350; log_odds NULL
    from aroma_spark.operators.nonparam import phi_association_daily

    rows = [
        ("a", 0, "assistant", 1, 1, "2024-01-01 00:00:00"),
        ("a", 1, "assistant", 1, 1, "2024-01-01 01:00:00"),
        ("b", 0, "user", 1, 1, "2024-01-01 02:00:00"),
        ("b", 1, "user", 1, 0, "2024-01-01 03:00:00"),
    ]
    r = phi_association_daily(_sig_tool(spark, rows)).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (2, 0, 1, 1)
    assert r["phi"] == 0.57735
    assert r["log_odds"] is None


def test_phi_requires_both_roles(spark):
    from aroma_spark.operators.nonparam import phi_association_daily

    rows = [("a", 0, "assistant", 1, 1, "2024-01-01 00:00:00")]
    assert phi_association_daily(_sig_tool(spark, rows)).count() == 0
