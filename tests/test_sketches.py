"""Count-min sketch (build/merge/estimate) and Holt smoothing.

Property-style pinned tests (deterministic md5 cells -> reproducible
collisions); sf-scale hash parity lives in the driver oracles
(cm_est_1d / holt_text_len).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aroma_spark.operators.sketches import cm_estimate, cm_merge, cm_sketch
from aroma_spark.operators.smoothing import holt_smooth


def _events(spark, counts: dict[str, int], ts="2024-01-01 10:00:00"):
    rows = []
    for conv, n in counts.items():
        for i in range(n):
            rows.append((conv, i, ts))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def _est_vs_truth(spark, df, depth, width):
    sk = cm_sketch(df, "hour", "conv_id", depth, width)
    keys = df.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"), "conv_id"
    ).distinct()
    est = cm_estimate(sk, keys, "conv_id", depth, width)
    truth = df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"), "conv_id"
    ).agg(F.count(F.lit(1)).alias("n_true"))
    return {
        r.conv_id: (r.cm_est, r.n_true)
        for r in est.join(truth, ["bucket_ts", "conv_id"]).collect()
    }


def test_cm_never_underestimates_and_is_exact_when_wide(spark):
    counts = {"a": 7, "b": 3, "c": 1, "d": 12}
    got = _est_vs_truth(spark, _events(spark, counts), depth=4, width=256)
    assert set(got) == set(counts)
    for conv, (est, true) in got.items():
        assert est >= true
        assert true == counts[conv]
    # width 256 for 4 keys x 4 rows: a collision in EVERY row is
    # astronomically unlikely and md5 is fixed — pin exactness
    assert all(est == true for est, true in got.values())


def test_cm_width_one_degenerates_to_bucket_total(spark):
    counts = {"a": 5, "b": 2, "c": 1}
    got = _est_vs_truth(spark, _events(spark, counts), depth=2, width=1)
    for est, _true in got.values():
        assert est == 8  # every key collides into the single cell


def test_cm_merge_equals_direct_build(spark):
    # hour-built sketch merged to day == sketch built at day directly
    df = _events(spark, {"a": 4, "b": 2}, "2024-01-01 10:00:00").union(
        _events(spark, {"a": 3, "c": 5}, "2024-01-01 11:00:00")
    )
    merged = cm_merge(cm_sketch(df, "hour"), "day")
    direct = cm_sketch(df, "day")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cm_rejects_bad_shape(spark):
    with pytest.raises(ValueError, match="depth/width"):
        cm_sketch(_events(spark, {"a": 1}), depth=0)


def test_holt_matches_reference_recurrence(spark):
    rows = [("a", i, f"2024-01-01 00:{i:02d}:00", float(v))
            for i, v in enumerate([10, 12, 15, 11, 20, 18])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, text_len double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = holt_smooth(df, 0.3, 0.1, "text_len").orderBy("turn_idx").collect()
    # replay the recurrence in the exact same float order
    alpha, beta = 0.3, 0.1
    lvl, trd = 10.0, 0.0
    exp = [(lvl, trd)]
    for x in [12.0, 15.0, 11.0, 20.0, 18.0]:
        prev = lvl
        lvl = alpha * x + (1.0 - alpha) * (lvl + trd)
        trd = beta * (lvl - prev) + (1.0 - beta) * trd
        exp.append((lvl, trd))
    got = [(r.level, r.trend) for r in out]
    assert got == exp


def test_holt_rejects_bad_params(spark):
    df = spark.createDataFrame([], "conv_id string, turn_idx int, ts timestamp, text_len long")
    with pytest.raises(ValueError, match="alpha"):
        holt_smooth(df, 0.0, 0.1)
    with pytest.raises(ValueError, match="beta"):
        holt_smooth(df, 0.3, 1.5)


def _distinct_events(spark, n_keys: int, ts="2024-01-01 10:00:00"):
    rows = [(f"conv_{i:05d}", 0, ts) for i in range(n_keys)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts string")
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_hll_small_range_is_near_exact(spark):
    from aroma_spark.operators.sketches import hll_estimate, hll_sketch

    # 40 distinct keys in one bucket: deep inside the linear-counting
    # regime, where HLL is near-exact (only register collisions bias it)
    out = hll_estimate(hll_sketch(_distinct_events(spark, 40))).collect()
    assert len(out) == 1
    assert out[0].n_registers <= 40
    assert abs(out[0].hll_est - 40) / 40 < 0.15


def test_hll_estimate_within_error_bound(spark):
    from aroma_spark.operators.sketches import hll_estimate, hll_sketch

    # 5000 distinct >> m=256: the raw-estimator regime; standard error
    # is 1.04/sqrt(256) = 6.5%, assert a generous 3-sigma envelope
    out = hll_estimate(hll_sketch(_distinct_events(spark, 5000))).collect()
    assert len(out) == 1
    assert abs(out[0].hll_est - 5000) / 5000 < 0.20


def test_hll_duplicates_do_not_move_the_estimate(spark):
    from aroma_spark.operators.sketches import hll_estimate, hll_sketch

    base = _distinct_events(spark, 300)
    dup = base.union(base).union(base)
    a = hll_estimate(hll_sketch(base)).collect()[0]
    b = hll_estimate(hll_sketch(dup)).collect()[0]
    assert a.hll_est == b.hll_est and a.n_registers == b.n_registers


def test_hll_merge_equals_direct_build(spark):
    from aroma_spark.operators.sketches import hll_merge, hll_sketch

    # two hours sharing some keys: hour-built registers merged to day
    # (MAX) == registers built at day directly — the lossless-union
    # property that makes the sketch a retention tier
    h1 = _distinct_events(spark, 200, "2024-01-01 10:00:00")
    h2 = _distinct_events(spark, 120, "2024-01-01 11:00:00")
    df = h1.union(h2)
    merged = hll_merge(hll_sketch(df, "hour"), "day")
    direct = hll_sketch(df, "day")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_overlap_inclusion_exclusion(spark):
    from aroma_spark.operators.sketches import hll_overlap

    # day 1 audience {A..T} (20 keys), day 8 audience = 10 returning
    # + 10 new: true intersection 10, union 30
    rows = (
        [(f"conv_{i:05d}", 0, "2024-01-01 10:00:00") for i in range(20)]
        + [(f"conv_{i:05d}", 0, "2024-01-08 10:00:00")
           for i in range(10, 30)]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = hll_overlap(df).collect()
    # only Jan 8 has a week-ago side
    assert len(out) == 1
    r = out[0]
    assert r["n_both_true"] == 10
    # linear-counting regime: estimates near-exact, the I-E overlap
    # lands close to truth (register collisions are the only bias)
    assert abs(r["est_today"] - 20) / 20 < 0.15
    assert abs(r["est_union"] - 30) / 30 < 0.15
    assert abs(r["overlap_est"] - 10) < 3.0
    # identity holds bit-exactly on the emitted (rounded) floats
    assert r["overlap_est"] == round(
        r["est_today"] + r["est_lag"] - r["est_union"], 6)
