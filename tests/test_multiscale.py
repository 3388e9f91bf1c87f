"""Goldens for the multi-scale wave: ACF profile over lags 1..L and
unnormalized Haar detail energies (operators/multiscale.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.multiscale import acf_profile, haar_energy


def _sig(spark, rows):
    """rows = (conv_id, turn_idx, text_len, ts)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _conv(values, conv="a"):
    return [
        (conv, i, v, f"2024-01-01 0{i % 10}:00:00")
        for i, v in enumerate(values)
    ]


# ------------------------------------------------------------- ACF


def test_acf_linear_series_all_ones(spark):
    # strictly increasing line: every lag's pairs are perfectly
    # linearly related -> autocorr 1.0 at every kept lag; lag 4 of a
    # 6-turn conv has 2 pairs < MIN_PAIRS=3 -> dropped
    out = acf_profile(_sig(spark, _conv([1, 2, 3, 4, 5, 6]))).collect()
    by_lag = {r["lag"]: r for r in out}
    assert set(by_lag) == {1, 2, 3}
    assert by_lag[1]["n_pairs"] == 5
    assert by_lag[3]["n_pairs"] == 3
    assert all(r["autocorr"] == 1.0 for r in out)


def test_acf_alternation_sign_flip(spark):
    # [1,3,1,3,1,3]: lag1 pairs are (1,3)/(3,1)... -> r=-1; lag2 pairs
    # identical values -> r=+1
    out = acf_profile(_sig(spark, _conv([1, 3, 1, 3, 1, 3]))).collect()
    by_lag = {r["lag"]: r["autocorr"] for r in out}
    assert by_lag[1] == -1.0
    assert by_lag[2] == 1.0


def test_acf_constant_null(spark):
    out = acf_profile(_sig(spark, _conv([7, 7, 7, 7, 7]))).collect()
    assert len(out) > 0
    assert all(r["autocorr"] is None for r in out)


def test_acf_matches_single_lag_operator(spark):
    from aroma_spark.operators.stats import signal_autocorr

    sig = _sig(spark, _conv([3, 1, 4, 1, 5, 9, 2, 6]))
    prof = {
        r["lag"]: (r["n_pairs"], r["autocorr"])
        for r in acf_profile(sig).collect()
    }
    for lag in (1, 2, 3, 4):
        solo = signal_autocorr(sig, lag=lag).collect()[0]
        assert prof[lag] == (solo["n_pairs"], solo["autocorr"])


# ------------------------------------------------------------- Haar


def test_haar_hand_computed(spark):
    # [1,2,3,4,5]: L1 pairs (1,2),(3,4): e=1+1=2, trailing 5 dropped,
    # approx [3,7]; L2 pair (3,7): e=16, approx [10]; L3: no pair.
    out = haar_energy(_sig(spark, _conv([1, 2, 3, 4, 5]))).collect()
    by_level = {r["level"]: (r["n_pairs"], r["energy"]) for r in out}
    assert by_level == {1: (2, 2), 2: (1, 16)}


def test_haar_flat_zero_energy(spark):
    out = haar_energy(_sig(spark, _conv([5, 5, 5, 5, 5, 5, 5, 5]))).collect()
    by_level = {r["level"]: (r["n_pairs"], r["energy"]) for r in out}
    assert by_level == {1: (4, 0), 2: (2, 0), 3: (1, 0)}


def test_haar_alternation_concentrates_at_level1(spark):
    # [1,3]*4: every L1 pair differs by -2 -> e1=4*4=16; approx all 4
    # -> e2=e3=0
    out = haar_energy(_sig(spark, _conv([1, 3, 1, 3, 1, 3, 1, 3]))).collect()
    by_level = {r["level"]: r["energy"] for r in out}
    assert by_level == {1: 16, 2: 0, 3: 0}


def test_haar_step_concentrates_at_top(spark):
    # [0,0,0,0,8,8,8,8]: L1 diffs 0 -> e1=0; approx [0,0,16,16];
    # L2 diffs 0 -> e2=0; approx [0,32]; L3 diff -32 -> e3=1024
    out = haar_energy(_sig(spark, _conv([0, 0, 0, 0, 8, 8, 8, 8]))).collect()
    by_level = {r["level"]: r["energy"] for r in out}
    assert by_level == {1: 0, 2: 0, 3: 1024}


def test_haar_single_turn_no_rows(spark):
    assert haar_energy(_sig(spark, _conv([42]))).count() == 0


# ---------------------------------------------------- variance ratio


def test_vr_antipersistent_hand_computed(spark):
    # [0,2,1,3,2,4], q=2: d1=[2,-1,2,-1,2] m1=5,s1=4,s1sq=14
    # Var1=(5*14-16)/25=54/25; dq=[1,1,1,1] -> Varq=0 -> vr=0.0
    from aroma_spark.operators.multiscale import variance_ratio

    out = variance_ratio(_sig(spark, _conv([0, 2, 1, 3, 2, 4]))).collect()
    r = out[0]
    assert (r["m1"], r["s1"], r["s1sq"]) == (5, 4, 14)
    assert (r["mq"], r["sq"], r["sqsq"]) == (4, 4, 4)
    assert r["vr"] == 0.0


def test_vr_trending_gt_one(spark):
    # persistent moves: [0,1,3,4,6,7,9]: d1=[1,2,1,2,1,2],
    # dq=[3,3,3,3,3] -> Var1>0, Varq=0? dq all 3 -> vr=0... choose a
    # series where q-diffs vary more than 1-diffs instead:
    # [0,1,0,2,0,3,0] d1=[1,-1,2,-2,3,-3] Var1 big; dq(2)=[0,1,0,1,0]
    # small -> vr < 1 (mean reversion). For vr > 1 use a trend with
    # alternating-noise: x=[0,10,9,19,18,28]: d1=[10,-1,10,-1,10],
    # dq=[9,9,9,9] -> Varq=0 again. Monotone-but-uneven: x=[0,1,9,10,
    # 18,19,27]: d1=[1,8,1,8,1,8], dq=[9,9,9,9,9]. Still 0. The only
    # way Varq grows is persistent SIGN: x=[0,1,3,6,10,15]:
    # d1=[1,2,3,4,5] Var1=2; dq=[3,5,7,9] Varq=5; vr=5/(2*2)=1.25
    from aroma_spark.operators.multiscale import variance_ratio

    r = variance_ratio(_sig(spark, _conv([0, 1, 3, 6, 10, 15]))).collect()[0]
    assert r["vr"] == 1.25


def test_vr_constant_diffs_null(spark):
    # straight line -> Var1 = 0 -> NULL
    from aroma_spark.operators.multiscale import variance_ratio

    r = variance_ratio(_sig(spark, _conv([1, 2, 3, 4, 5]))).collect()[0]
    assert r["vr"] is None


def test_vr_min_pairs(spark):
    from aroma_spark.operators.multiscale import variance_ratio

    # 3 turns -> only 1 lag-2 diff -> dropped
    assert variance_ratio(_sig(spark, _conv([1, 5, 2]))).count() == 0


# ---------------------------------------------------- turning points


def test_tp_hand_computed(spark):
    # [1,3,2,4,3]: diffs [2,-1,2,-1]; all 3 interior sign products < 0
    # -> n_tp=3; E=2(5-2)/3=2, Var=(80-29)/90
    import math

    from aroma_spark.operators.multiscale import turning_points

    r = turning_points(_sig(spark, _conv([1, 3, 2, 4, 3]))).collect()[0]
    assert (r["n_turns"], r["n_tp"]) == (5, 3)
    assert r["z"] == round((3 - 2.0) / math.sqrt(51.0 / 90.0), 6)


def test_tp_monotone_zero(spark):
    from aroma_spark.operators.multiscale import turning_points

    r = turning_points(_sig(spark, _conv([1, 2, 3, 4, 5, 6]))).collect()[0]
    assert r["n_tp"] == 0
    assert r["z"] < 0


def test_tp_ties_never_count(spark):
    # [1,5,5,1]: products (4*0)=0 and (0*-4)=0 -> no turning points
    from aroma_spark.operators.multiscale import turning_points

    r = turning_points(_sig(spark, _conv([1, 5, 5, 1]))).collect()[0]
    assert r["n_tp"] == 0


def test_tp_min_turns(spark):
    from aroma_spark.operators.multiscale import turning_points

    assert turning_points(_sig(spark, _conv([1, 2]))).count() == 0
