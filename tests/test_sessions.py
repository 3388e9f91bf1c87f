"""Sessionization goldens."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.sessions import session_stats, with_session_ids


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_session_split_on_gap(spark):
    df = _df(
        spark,
        [
            ("c", 0, "user", "a", None, "2024-01-01 00:00:00"),
            ("c", 1, "assistant", "b", None, "2024-01-01 00:10:00"),
            ("c", 2, "user", "c", None, "2024-01-01 01:00:00"),  # 50m gap
            ("c", 3, "user", "d", "fn", "2024-01-01 01:05:00"),
            ("c", 4, "user", "e", None, "2024-01-02 01:05:00"),  # 1d gap
        ],
    )
    out = (
        with_session_ids(df, "30 minutes")
        .toPandas()
        .sort_values("turn_idx")
    )
    assert out.session_idx.tolist() == [0, 0, 1, 1, 2]
    stats = (
        session_stats(df, "30 minutes").toPandas().sort_values("session_idx")
    )
    assert stats.n_turns.tolist() == [2, 2, 1]
    assert stats.duration_us.tolist() == [600_000_000, 300_000_000, 0]
    assert stats.n_tool_calls.tolist() == [0, 1, 0]


def test_exact_gap_does_not_split(spark):
    df = _df(
        spark,
        [
            ("c", 0, "user", "a", None, "2024-01-01 00:00:00"),
            ("c", 1, "user", "b", None, "2024-01-01 00:30:00"),  # == gap
        ],
    )
    out = with_session_ids(df, "30 minutes").toPandas()
    assert out.session_idx.tolist() == [0, 0]


def test_day_gap_unit(spark):
    df = _df(
        spark,
        [
            ("c", 0, "user", "a", None, "2024-01-01 00:00:00"),
            ("c", 1, "user", "b", None, "2024-01-02 00:00:01"),  # > 1 day
            ("c", 2, "user", "c", None, "2024-01-02 12:00:00"),
        ],
    )
    out = with_session_ids(df, "1 day").toPandas()
    assert out.session_idx.tolist() == [0, 1, 1]


def test_unknown_gap_unit_raises():
    import pytest

    from aroma_spark.operators.sessions import _interval_to_us

    assert _interval_to_us("2 days") == 2 * 86_400_000_000
    with pytest.raises(ValueError, match="unsupported interval unit"):
        _interval_to_us("3 fortnights")


def test_tool_usage_rollup(spark):
    from aroma_spark.operators.sessions import tool_usage

    rows = [
        ("a", "search", 10, 100),
        ("a", "search", 20, 200),
        ("b", "search", 5, 50),
        ("a", "", 9, 9),      # empty tool excluded
        ("b", None, 9, 9),    # null tool excluded
        ("b", "calc", 7, 70),
    ]
    sig = spark.createDataFrame(
        rows, "conv_id string, tool string, text_len long, inter_time_us long"
    )
    out = {r["tool"]: r for r in tool_usage(sig).collect()}
    assert set(out) == {"search", "calc"}
    s = out["search"]
    assert (s["n_calls"], s["n_convs"], s["sum_text_len"], s["sum_latency_us"]) == (
        3, 2, 35, 350,
    )
    c = out["calc"]
    assert (c["n_calls"], c["n_convs"], c["sum_text_len"], c["sum_latency_us"]) == (
        1, 1, 7, 70,
    )


def test_alternation_rate_hand_computed(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import alternation_rate

    rows = [
        ("a", 0, "user"), ("a", 1, "assistant"), ("a", 2, "assistant"),
        ("a", 3, "user"),
        ("b", 0, "system"),
        ("c", 0, "user"), ("c", 1, "user"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {r["conv_id"]: r for r in alternation_rate(df).collect()}
    # a: pairs (u,a)(a,a)(a,u) -> 2 switches of 3
    assert (out["a"]["n_pairs"], out["a"]["n_switches"]) == (3, 2)
    assert out["a"]["alternation"] == 0.666667
    # b: single turn -> dropped by min_turns
    assert "b" not in out
    # c: no switch
    assert out["c"]["alternation"] == 0.0


def test_idle_share_hand_computed(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import idle_share_daily

    # conv a (starts Jan 1): gaps 0, 30s, 120s -> span 150s, idle 120s
    # conv b (starts Jan 2): gaps 0, 10s -> span 10s, no idle
    rows = [
        ("a", "2024-01-01 10:00:00", 0),
        ("a", "2024-01-01 10:00:30", 30_000_000),
        ("a", "2024-01-01 10:02:30", 120_000_000),
        ("b", "2024-01-02 09:00:00", 0),
        ("b", "2024-01-02 09:00:10", 10_000_000),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string, inter_time_us long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r
           for r in idle_share_daily(df).collect()}
    d1 = out["2024-01-01"]
    assert (d1["n_convs"], d1["sum_span_us"], d1["sum_idle_us"],
            d1["n_idle_gaps"]) == (1, 150_000_000, 120_000_000, 1)
    assert d1["idle_share"] == 0.8
    d2 = out["2024-01-02"]
    assert (d2["sum_idle_us"], d2["idle_share"]) == (0, 0.0)


def test_idle_share_zero_span_guard(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import idle_share_daily

    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 0)],
        "conv_id string, ts string, inter_time_us long",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = idle_share_daily(df).collect()[0]
    assert (r["sum_span_us"], r["idle_share"]) == (0, None)


def test_role_cooccurrence_hand_computed(spark):
    from aroma_spark.operators.sessions import role_cooccurrence

    rows = [
        ("a", 0, "click"), ("a", 1, "view"), ("a", 2, "view"),
        ("b", 0, "view"),
        ("c", 0, "click"), ("c", 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string")
    out = {(r["role_a"], r["role_b"]): r
           for r in role_cooccurrence(df).collect()}
    cv = out[("click", "view")]
    # click in {a,c}, view in {a,b}; both in {a}
    assert (cv["n_both"], cv["n_a"], cv["n_b"]) == (1, 2, 2)
    assert cv["jaccard"] == round(1 / 3, 6)
    cp = out[("click", "purchase")]
    assert (cp["n_both"], cp["n_a"], cp["n_b"]) == (1, 2, 1)
    assert cp["jaccard"] == 0.5
    # view/purchase never co-occur -> no row (pairs come from joins)
    assert ("purchase", "view") not in out


def test_trigram_transitions_hand_computed(spark):
    from aroma_spark.operators.sessions import trigram_transitions

    rows = [
        ("a", 0, "v"), ("a", 1, "c"), ("a", 2, "p"), ("a", 3, "v"),
        ("b", 0, "v"), ("b", 1, "c"), ("b", 2, "v"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string")
    out = {(r["prev2"], r["prev1"], r["cur"]): r
           for r in trigram_transitions(df).collect()}
    # (v,c,*) appears twice: ->p (conv a) and ->v (conv b)
    vcp, vcv = out[("v", "c", "p")], out[("v", "c", "v")]
    assert (vcp["n"], vcp["pair_n"]) == (1, 2)
    assert vcp["cond_share"] == 0.5
    assert (vcv["n"], vcv["pair_n"], vcv["cond_share"]) == (1, 2, 0.5)
    # (c,p,v) from conv a only
    assert out[("c", "p", "v")]["cond_share"] == 1.0
    assert len(out) == 3


def test_boundary_roles_hand_computed(spark):
    from aroma_spark.operators.sessions import boundary_roles

    rows = [
        ("a", 0, "view"), ("a", 1, "click"), ("a", 2, "purchase"),
        ("b", 0, "view"), ("b", 1, "error"),
        ("c", 0, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string")
    out = {(r["first_role"], r["last_role"]): r
           for r in boundary_roles(df).collect()}
    vp = out[("view", "purchase")]
    assert (vp["n_convs"], vp["total_convs"]) == (1, 3)
    assert vp["share"] == round(1 / 3, 6)
    # single-turn conv: first == last
    assert out[("signup", "signup")]["n_convs"] == 1
    assert len(out) == 3


def test_depth_tool_rate_hand_computed(spark):
    from aroma_spark.operators.sessions import depth_tool_rate

    rows = [
        # conv a: 1 turn, no tool -> bucket 0
        ("a", 0, "view", None),
        # conv b: 3 turns, 2 tools -> bucket 1
        ("b", 0, "click", "click"), ("b", 1, "view", ""),
        ("b", 2, "purchase", "purchase"),
        # conv c: 2 turns, 1 tool -> bucket 1
        ("c", 0, "click", "click"), ("c", 1, "view", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")
    out = {r["bucket"]: r for r in depth_tool_rate(df).collect()}
    b0, b1 = out[0], out[1]
    assert (b0["lo_turns"], b0["n_convs"], b0["sum_turns"],
            b0["sum_tool_calls"]) == (1, 1, 1, 0)
    assert b0["tool_rate"] == 0.0
    assert (b1["lo_turns"], b1["n_convs"], b1["sum_turns"],
            b1["sum_tool_calls"]) == (2, 2, 5, 3)
    assert b1["tool_rate"] == 0.6


def test_tool_latency_contrast(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import tool_latency_contrast

    rows = [
        # day 1: tool turns with gaps 10s, 30s; plain turns 0s, 4s
        ("a", "2024-01-01 10:00:00", 0, 1, 10_000_000),
        ("a", "2024-01-01 10:00:30", 1, 1, 30_000_000),
        ("a", "2024-01-01 09:00:00", 2, 0, 0),
        ("a", "2024-01-01 09:00:04", 3, 0, 4_000_000),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string, turn_idx int,"
        " tool_call long, inter_time_us long"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = tool_latency_contrast(df).collect()[0]
    assert (r["n_tool"], r["n_plain"]) == (2, 2)
    assert (r["sum_tool_us"], r["sum_plain_us"]) == (40_000_000, 4_000_000)
    assert (r["mean_tool_us"], r["mean_plain_us"]) == (20_000_000, 2_000_000)
    assert r["tool_plain_ratio"] == 10.0


def test_tool_diversity(spark):
    from aroma_spark.operators.sessions import tool_diversity

    rows = [
        ("a", 0, "click", "click"), ("a", 1, "purchase", "purchase"),
        ("b", 0, "click", "click"), ("b", 1, "click", "click"),
        ("c", 0, "view", None), ("c", 1, "view", ""),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")
    out = {r["n_distinct_tools"]: r for r in tool_diversity(df).collect()}
    assert out[2]["n_convs"] == 1  # a
    assert out[1]["n_convs"] == 1  # b
    assert out[0]["n_convs"] == 1  # c
    assert out[0]["share"] == round(1 / 3, 6)


def test_first_role_mix_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import first_role_mix_daily

    rows = [
        ("a", 0, "view", "2024-01-01 10:00:00"),
        ("a", 1, "click", "2024-01-01 11:00:00"),
        ("b", 0, "signup", "2024-01-01 12:00:00"),
        ("c", 0, "view", "2024-01-02 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r["day_ts"])[:10], r["first_role"]): r
           for r in first_role_mix_daily(df).collect()}
    v = out[("2024-01-01", "view")]
    assert (v["n_convs"], v["day_convs"]) == (1, 2)
    assert v["share"] == 0.5
    assert out[("2024-01-02", "view")]["share"] == 1.0


def test_purchase_by_depth(spark):
    from aroma_spark.operators.sessions import purchase_by_depth

    rows = [
        # 1-turn conv without purchase (bucket 0)
        ("a", 0, "view"),
        # 1-turn conv WITH purchase (bucket 0)
        ("b", 0, "purchase"),
        # 3-turn conv with purchase (bucket 1)
        ("c", 0, "view"), ("c", 1, "click"), ("c", 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string")
    out = {r["bucket"]: r for r in purchase_by_depth(df).collect()}
    b0 = out[0]
    assert (b0["n_convs"], b0["n_with_purchase"]) == (2, 1)
    assert b0["purchase_share"] == 0.5
    assert (out[1]["n_convs"], out[1]["purchase_share"]) == (1, 1.0)


def test_error_rate_by_hour(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import error_rate_by_hour

    rows = [
        ("a", 0, "error", "2024-01-01 10:00:00"),
        ("a", 1, "view", "2024-01-01 10:30:00"),
        ("a", 2, "view", "2024-01-02 10:15:00"),  # same hod, other day
        ("a", 3, "view", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["hod"]: r for r in error_rate_by_hour(df).collect()}
    h10 = out[10]
    assert (h10["n_turns"], h10["n_errors"]) == (3, 1)
    assert h10["error_share"] == round(1 / 3, 6)
    assert out[11]["error_share"] == 0.0


def test_role_mix_drift_weekly(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import role_mix_drift_weekly

    rows = [
        # week of Mon Jan 1: 2 views, 2 clicks
        ("a", 0, "view", "2024-01-02 10:00:00"),
        ("a", 1, "view", "2024-01-02 11:00:00"),
        ("a", 2, "click", "2024-01-03 10:00:00"),
        ("a", 3, "click", "2024-01-03 11:00:00"),
        # next week: 3 views, 1 click
        ("a", 4, "view", "2024-01-09 10:00:00"),
        ("a", 5, "view", "2024-01-09 11:00:00"),
        ("a", 6, "view", "2024-01-09 12:00:00"),
        ("a", 7, "click", "2024-01-10 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r["week_ts"])[:10], r["role"]): r
           for r in role_mix_drift_weekly(df).collect()}
    w1v = out[("2024-01-01", "view")]
    assert (w1v["share"], w1v["drift"]) == (0.5, None)
    w2v = out[("2024-01-08", "view")]
    assert w2v["share"] == 0.75
    assert w2v["drift"] == 0.25
    w2c = out[("2024-01-08", "click")]
    assert w2c["drift"] == -0.25


def test_weekend_mix(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import weekend_mix

    rows = [
        # Sat 2024-01-06 and Sun 2024-01-07 -> weekend
        ("a", "2024-01-06 10:00:00", 0, 5),
        ("a", "2024-01-07 10:00:00", 86_400_000_000, 7),
        # Mon
        ("b", "2024-01-08 10:00:00", 0, 3),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string, inter_time_us long,"
        " text_len long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["is_weekend"]: r for r in weekend_mix(df).collect()}
    we = out[True]
    assert (we["n_turns"], we["sum_text_len"]) == (2, 12)
    assert we["mean_latency_us"] == 43_200_000_000
    assert we["turn_share"] == round(2 / 3, 6)
    assert out[False]["n_turns"] == 1


def test_last_role_mix_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import last_role_mix_daily

    rows = [
        # conv a ends Jan 2 with purchase
        ("a", 0, "view", "2024-01-01 10:00:00"),
        ("a", 1, "purchase", "2024-01-02 10:00:00"),
        # conv b ends Jan 2 with error
        ("b", 0, "error", "2024-01-02 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r["day_ts"])[:10], r["last_role"]): r
           for r in last_role_mix_daily(df).collect()}
    p = out[("2024-01-02", "purchase")]
    assert (p["n_convs"], p["day_convs"], p["share"]) == (1, 2, 0.5)
    assert out[("2024-01-02", "error")]["share"] == 0.5
    assert len(out) == 2


def test_gap_dominance_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import gap_dominance_daily

    rows = [
        # conv a: gaps 0, 10s, 30s -> max 30s, span 40s
        ("a", "2024-01-01 10:00:00", 0),
        ("a", "2024-01-01 10:00:10", 10_000_000),
        ("a", "2024-01-01 10:00:40", 30_000_000),
        # conv b: gaps 0, 20s -> max 20s, span 20s
        ("b", "2024-01-01 11:00:00", 0),
        ("b", "2024-01-01 11:00:20", 20_000_000),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, ts string, inter_time_us long"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = gap_dominance_daily(df).collect()[0]
    assert (r["n_convs"], r["sum_max_gap_us"], r["sum_span_us"]) == (
        2, 50_000_000, 60_000_000)
    assert r["dominance"] == round(50 / 60, 6)


def test_conv_phase_profile(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import conv_phase_profile

    # 6-turn conv: turns 0,1 -> phase 0; 2,3 -> 1; 4,5 -> 2
    rows = [("a", i, 1_000_000 * i, i % 2) for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, inter_time_us long,"
        " tool_call long")
    out = {r["phase"]: r for r in conv_phase_profile(df).collect()}
    assert (out[0]["n_turns"], out[0]["sum_latency_us"]) == (2, 1_000_000)
    assert (out[1]["n_turns"], out[1]["sum_latency_us"]) == (2, 5_000_000)
    assert (out[2]["n_turns"], out[2]["sum_latency_us"]) == (2, 9_000_000)
    assert out[2]["mean_latency_us"] == 4_500_000
    assert out[0]["tool_rate"] == 0.5


def test_conversion_by_entry(spark):
    from aroma_spark.operators.sessions import conversion_by_entry

    rows = [
        ("a", 0, "view"), ("a", 1, "purchase"),
        ("b", 0, "view"), ("b", 1, "click"),
        ("c", 0, "signup"), ("c", 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string")
    out = {r["first_role"]: r for r in conversion_by_entry(df).collect()}
    v = out["view"]
    assert (v["n_convs"], v["n_purchase"], v["purchase_share"]) == (
        2, 1, 0.5)
    assert out["signup"]["purchase_share"] == 1.0


def test_tool_purchase_lift(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import tool_purchase_lift

    rows = [
        # conv a day 1: tool + purchase
        ("a", 0, "click", "click", "2024-01-01 10:00:00"),
        ("a", 1, "purchase", None, "2024-01-01 11:00:00"),
        # conv a day 2: tool only
        ("a", 2, "click", "click", "2024-01-02 10:00:00"),
        # conv b day 1: neither
        ("b", 0, "view", None, "2024-01-01 10:00:00"),
        # conv b day 2: purchase only
        ("b", 1, "purchase", None, "2024-01-02 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string,"
        " ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["used_tool"], r["purchased"]): r
           for r in tool_purchase_lift(df).collect()}
    tp = out[(True, True)]
    assert (tp["n_conv_days"], tp["tool_total"], tp["buy_total"],
            tp["corpus_total"]) == (1, 2, 2, 4)
    assert tp["lift"] == 1.0
    assert out[(False, False)]["n_conv_days"] == 1
    assert len(out) == 4


def test_weekend_start_conversion(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import weekend_start_conversion

    rows = [
        # conv a active Sat (2 turns, purchase) and Mon (1 turn)
        ("a", 0, "view", "2024-01-06 10:00:00"),
        ("a", 1, "purchase", "2024-01-06 11:00:00"),
        ("a", 2, "view", "2024-01-08 10:00:00"),
        # conv b active Mon only
        ("b", 0, "view", "2024-01-08 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["weekend"]: r
           for r in weekend_start_conversion(df).collect()}
    we = out[True]
    assert (we["n_conv_days"], we["sum_turns"],
            we["n_purchase_days"]) == (1, 2, 1)
    assert (we["mean_turns"], we["purchase_share"]) == (2.0, 1.0)
    wd = out[False]
    assert (wd["n_conv_days"], wd["purchase_share"]) == (2, 0.0)


def test_first_response_daily(spark):
    from pyspark.sql import functions as F

    from aroma_spark.operators.sessions import first_response_daily

    rows = [
        # conv a: first gap 10s
        ("a", 0, "2024-01-01 10:00:00", 0),
        ("a", 1, "2024-01-01 10:00:10", 10_000_000),
        ("a", 2, "2024-01-01 10:10:00", 590_000_000),
        # conv b: first gap 30s
        ("b", 0, "2024-01-01 11:00:00", 0),
        ("b", 1, "2024-01-01 11:00:30", 30_000_000),
        # conv c: single turn -> excluded
        ("c", 0, "2024-01-01 12:00:00", 0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string,"
        " inter_time_us long"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = first_response_daily(df).collect()[0]
    assert (r["n_convs"], r["sum_first_us"], r["min_first_us"],
            r["max_first_us"]) == (2, 40_000_000, 10_000_000, 30_000_000)
    assert r["mean_first_us"] == 20_000_000


def test_tool_aftermath(spark):
    from aroma_spark.operators.sessions import tool_aftermath

    rows = [
        # conv a: plain(t0) -> gap 10 -> tool(t1) -> gap 50 -> plain(t2)
        ("a", 0, 0, 0, 0),
        ("a", 1, 1, 10, 0),
        ("a", 2, 0, 50, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, tool_call long,"
        " inter_time_us long, text_len long",
    )
    out = {r["tool_call"]: r for r in tool_aftermath(df).collect()}
    # after the plain turn 0 comes a 10us gap; after turn 1 (tool), 50us;
    # turn 2 is last and contributes nothing
    assert (out[0]["n_turns"], out[0]["sum_next_us"],
            out[0]["mean_next_us"]) == (1, 10, 10)
    assert (out[1]["n_turns"], out[1]["mean_next_us"]) == (1, 50)


def test_error_abandonment(spark):
    from aroma_spark.operators.sessions import error_abandonment

    rows = [
        # conv a: error at turn 1, conversation ends at turn 3 -> kept
        # going exactly 2 turns = abandoned under within_turns=2
        ("a", 0, "user", "x", None, "2024-01-01 10:00:00"),
        ("a", 1, "error", "x", None, "2024-01-01 10:01:00"),
        ("a", 2, "user", "x", None, "2024-01-01 10:02:00"),
        ("a", 3, "user", "x", None, "2024-01-01 10:03:00"),
        # conv b: error at 0, lives 5 more turns -> survived
        ("b", 0, "error", "x", None, "2024-01-01 11:00:00"),
        ("b", 1, "user", "x", None, "2024-01-01 11:01:00"),
        ("b", 2, "user", "x", None, "2024-01-01 11:02:00"),
        ("b", 3, "user", "x", None, "2024-01-01 11:03:00"),
        ("b", 4, "user", "x", None, "2024-01-01 11:04:00"),
        ("b", 5, "user", "x", None, "2024-01-01 11:05:00"),
        # conv c: no error -> not counted at all
        ("c", 0, "user", "x", None, "2024-01-01 12:00:00"),
    ]
    out = error_abandonment(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_error_convs"], r["n_abandoned"],
            r["abandon_share"]) == (2, 1, 0.5)


def test_tool_position_profile(spark):
    from aroma_spark.operators.sessions import tool_position_profile

    rows = [
        # 5-turn conversation, tool at the last turn
        ("a", 0, 0), ("a", 1, 0), ("a", 2, 0), ("a", 3, 0), ("a", 4, 1),
        # 2-turn conversation, tool first
        ("b", 0, 1), ("b", 1, 0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool_call long"
    )
    out = {r["decile"]: r
           for r in tool_position_profile(df).collect()}
    # a: turn 4 of 5 -> decile 8; b: turn 1 of 2 -> decile 5
    assert (out[8]["n_turns"], out[8]["n_tool"],
            out[8]["tool_rate"]) == (1, 1, 1.0)
    assert (out[0]["n_turns"], out[0]["n_tool"]) == (2, 1)
    assert (out[5]["n_turns"], out[5]["n_tool"]) == (1, 0)
