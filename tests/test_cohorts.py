"""Goldens for the round-5c cohort / engagement wave: cohort retention,
rolling actives, funnels, lagged cross-correlation, exact medians,
transition latency, term postings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aroma_spark.operators.cohorts import (
    cohort_retention,
    funnel_matches,
    funnel_steps,
    rolling_active_counts,
)
from aroma_spark.operators.sessions import transition_latency
from aroma_spark.operators.stats import exact_median_by_bucket, signal_xcorr


def _t(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_cohort_retention_grid(spark):
    df = _t(
        spark,
        [
            # a starts day 1, active days 1 and 3
            ("a", 0, "user", "x", None, "2024-01-01 10:00:00"),
            ("a", 1, "user", "x", None, "2024-01-01 11:00:00"),
            ("a", 2, "user", "x", None, "2024-01-03 10:00:00"),
            # b starts day 1, active day 1 only
            ("b", 0, "user", "x", None, "2024-01-01 23:00:00"),
            # c starts day 2, active days 2 and 3
            ("c", 0, "user", "x", None, "2024-01-02 00:00:00"),
            ("c", 1, "user", "x", None, "2024-01-03 23:59:59"),
        ],
    )
    out = cohort_retention(df).toPandas()
    grid = {
        (r.cohort_day.day, r.offset_day): r.n_convs
        for r in out.itertuples()
    }
    assert grid == {(1, 0): 2, (1, 2): 1, (2, 0): 1, (2, 1): 1}


def test_rolling_active_counts_window(spark):
    df = _t(
        spark,
        [
            ("a", 0, "user", "x", None, "2024-01-01 10:00:00"),
            ("b", 0, "user", "x", None, "2024-01-03 10:00:00"),
        ],
    )
    out = rolling_active_counts(df, window_days=3).toPandas()
    counts = {r.window_end_day.day: r.n_active for r in out.itertuples()}
    # a covers window-ends day1..3, b covers day3..5
    assert counts == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_funnel_strict_order(spark):
    df = _t(
        spark,
        [
            # conv a: view -> click -> purchase (full funnel)
            ("a", 0, "view", "x", None, "2024-01-01 00:00:00"),
            ("a", 1, "click", "x", None, "2024-01-01 00:01:00"),
            ("a", 2, "purchase", "x", None, "2024-01-01 00:02:00"),
            # conv b: click BEFORE view, never clicks again -> stops at view
            ("b", 0, "click", "x", None, "2024-01-01 00:00:00"),
            ("b", 1, "view", "x", None, "2024-01-01 00:01:00"),
            ("b", 2, "purchase", "x", None, "2024-01-01 00:02:00"),
            # conv c: view only
            ("c", 0, "view", "x", None, "2024-01-01 00:00:00"),
        ],
    )
    out = (
        funnel_steps(df, ["view", "click", "purchase"])
        .toPandas()
        .sort_values("step")
    )
    assert out.role.tolist() == ["view", "click", "purchase"]
    assert out.n_convs.tolist() == [3, 1, 1]
    m = funnel_matches(df, ["view", "click", "purchase"]).toPandas()
    a = m[m.conv_id == "a"].sort_values("step")
    assert a.match_idx.tolist() == [0, 1, 2]
    assert set(m[m.conv_id == "b"].step) == {1}


def test_funnel_first_match_semantics(spark):
    # the FIRST view is the anchor: a click before it doesn't count,
    # a click after it does — even if another view follows later
    df = _t(
        spark,
        [
            ("a", 0, "view", "x", None, "2024-01-01 00:00:00"),
            ("a", 1, "click", "x", None, "2024-01-01 00:01:00"),
            ("a", 2, "view", "x", None, "2024-01-01 00:02:00"),
        ],
    )
    out = funnel_steps(df, ["view", "click"]).toPandas()
    assert out[out.step == 2].n_convs.tolist() == [1]


def test_signal_xcorr_perfect_lag(spark):
    # y_i = x_{i-1} exactly => lag-1 cross-correlation 1.0
    rows = []
    xs = [1, 5, 2, 8, 3, 9]
    for i, x in enumerate(xs):
        rows.append(("c", i, "user", "a" * x, None, f"2024-01-01 00:0{i}:00"))
    df = _t(spark, rows)
    sig = df.select(
        "conv_id",
        "turn_idx",
        F.length("text").cast("long").alias("text_len"),
        # y in whole seconds-as-us so the DIV 1000000 scaling is exact
        (F.lag(F.length("text"))
         .over(__import__("pyspark").sql.Window.partitionBy("conv_id")
               .orderBy("turn_idx"))
         .cast("long") * 1_000_000).alias("inter_time_us"),
    ).where(F.col("inter_time_us").isNotNull())
    out = signal_xcorr(
        sig, x_col="text_len", y_col="inter_time_us", lag=1
    ).toPandas()
    assert len(out) == 1
    assert math.isclose(out.xcorr.iloc[0], 1.0, abs_tol=1e-9)


def test_exact_median_lower_rule(spark):
    # even count -> LOWER median (rank (n+1)//2), a real element
    rows = [
        ("c", i, "user", "x", None, f"2024-01-01 00:0{i}:00")
        for i in range(4)
    ]
    df = _t(spark, rows)
    sig = df.select(
        "conv_id", "turn_idx", "ts",
        F.lit(10).cast("long").alias("inter_time_us"),
    )
    sig = sig.withColumn(
        "inter_time_us",
        F.when(F.col("turn_idx") == 0, 1)
        .when(F.col("turn_idx") == 1, 3)
        .when(F.col("turn_idx") == 2, 7)
        .otherwise(100)
        .cast("long"),
    )
    out = exact_median_by_bucket(sig, "inter_time_us", "day").toPandas()
    assert out.n_points.tolist() == [4]
    # sorted [1,3,7,100], lower median = rank 2 = 3
    assert out.median_inter_time_us.tolist() == [3]


def test_transition_latency_edges(spark):
    df = _t(
        spark,
        [
            ("c", 0, "user", "x", None, "2024-01-01 00:00:00"),
            ("c", 1, "assistant", "x", None, "2024-01-01 00:00:05"),
            ("c", 2, "user", "x", None, "2024-01-01 00:01:05"),
            ("c", 3, "assistant", "x", None, "2024-01-01 00:01:15"),
        ],
    )
    out = transition_latency(df).toPandas()
    ua = out[(out.prev_role == "user") & (out.role == "assistant")]
    assert ua.n_transitions.tolist() == [2]
    assert ua.sum_latency_us.tolist() == [15_000_000]
    assert ua.min_latency_us.tolist() == [5_000_000]
    assert ua.max_latency_us.tolist() == [10_000_000]
    au = out[(out.prev_role == "assistant") & (out.role == "user")]
    assert au.sum_latency_us.tolist() == [60_000_000]


def test_term_postings_band_and_order(spark):
    from aroma_spark.functions.text import term_postings

    docs = spark.createDataFrame(
        [
            (3, "apple banana"),
            (1, "apple cherry"),
            (2, "apple banana date"),
        ],
        "doc_id long, text string",
    )
    out = term_postings(docs, min_df=2, max_df=2).toPandas()
    got = {r.term: (r.df, r.postings) for r in out.itertuples()}
    # apple df=3 > max_df; cherry/date df=1 < min_df; banana in band,
    # postings numerically sorted
    assert got == {"banana": (2, "2,3")}


def test_stickiness_ratio(spark):
    from aroma_spark.operators.cohorts import stickiness

    df = _t(
        spark,
        [
            # a active days 1 and 2; b active day 1 only
            ("a", 0, "user", "x", None, "2024-01-01 10:00:00"),
            ("a", 1, "user", "x", None, "2024-01-02 10:00:00"),
            ("b", 0, "user", "x", None, "2024-01-01 10:00:00"),
        ],
    )
    out = stickiness(df, short_days=1, long_days=3).toPandas()
    got = {
        r.window_end_day.day: (r.n_short, r.n_long, r.stickiness)
        for r in out.itertuples()
    }
    # day1: short {a,b}, long {a,b} -> 1.0; day2: short {a}, long {a,b}
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (1, 2, 0.5)
    # inner join: day3 has no short-window actives -> no row
    assert 3 not in got


def test_burstiness_regular_vs_bursty(spark):
    from aroma_spark.operators.cohorts import burstiness

    rows = []
    # conv r: perfectly regular 60s gaps -> sigma=0, B=-1
    for i in range(5):
        rows.append(("r", i, "user", "x", None, f"2024-01-01 00:{i:02d}:00"))
    # conv b: three 1s gaps then one huge gap -> B positive (one huge
    # gap among n has B -> (sqrt(n)-1)/(sqrt(n)+1) = 1/3 at n=4)
    ts = ["00:00:00", "00:00:01", "00:00:02", "00:00:03", "09:00:00"]
    for i, t in enumerate(ts):
        rows.append(("b", i, "user", "x", None, f"2024-01-01 {t}"))
    df = _t(spark, rows)
    out = burstiness(df).toPandas().set_index("conv_id")
    assert out.loc["r"].n_gaps == 4
    assert math.isclose(out.loc["r"].burstiness, -1.0, abs_tol=1e-9)
    assert 0.2 < out.loc["b"].burstiness < 0.34


def test_lifespan_histogram_bins(spark):
    from aroma_spark.operators.cohorts import lifespan_histogram

    df = _t(
        spark,
        [
            # conv a: 1s lifespan = 1_000_000 us -> 20 binary digits
            ("a", 0, "user", "x", None, "2024-01-01 00:00:00"),
            ("a", 1, "user", "x", None, "2024-01-01 00:00:01"),
            # conv z: zero lifespan -> bin 0
            ("z", 0, "user", "x", None, "2024-01-01 00:00:00"),
        ],
    )
    out = lifespan_histogram(df).toPandas()
    got = {r.bin: r.n_convs for r in out.itertuples()}
    assert got == {20: 1, 0: 1}


def test_growth_accounting_hand_computed(spark):
    from aroma_spark.operators.cohorts import growth_accounting

    df = _t(
        spark,
        [
            # a: active d1, d2, d4 -> new d1, retained d2, resurrected d4
            ("a", 0, "user", "x", None, "2024-01-01 10:00:00"),
            ("a", 1, "user", "x", None, "2024-01-01 12:00:00"),
            ("a", 2, "user", "x", None, "2024-01-02 10:00:00"),
            ("a", 3, "user", "x", None, "2024-01-04 10:00:00"),
            # b: active d2 only -> new d2, churns after d2
            ("b", 0, "user", "x", None, "2024-01-02 09:00:00"),
        ],
    )
    out = {str(r["day_ts"])[:10]: r for r in growth_accounting(df).collect()}
    d1, d2, d4 = out["2024-01-01"], out["2024-01-02"], out["2024-01-04"]
    assert (d1["n_active"], d1["n_new"], d1["n_retained"],
            d1["n_resurrected"], d1["n_churn_next"]) == (1, 1, 0, 0, 0)
    assert (d2["n_active"], d2["n_new"], d2["n_retained"],
            d2["n_resurrected"], d2["n_churn_next"]) == (2, 1, 1, 0, 2)
    assert (d4["n_active"], d4["n_new"], d4["n_retained"],
            d4["n_resurrected"], d4["n_churn_next"]) == (1, 0, 0, 1, 1)
    assert d2["retained_share"] == 0.5
    # identity: retained(d2) = active(d1) - churn_next(d1)
    assert d2["n_retained"] == d1["n_active"] - d1["n_churn_next"]


def test_bounce_rate_hand_computed(spark):
    from aroma_spark.operators.cohorts import bounce_rate_daily

    df = _t(
        spark,
        [
            # a: 2 turns starting day 1 (second turn next day) -> not a bounce
            ("a", 0, "user", "x", None, "2024-01-01 10:00:00"),
            ("a", 1, "user", "x", None, "2024-01-02 10:00:00"),
            # b: 1 turn day 1 -> bounce
            ("b", 0, "user", "x", None, "2024-01-01 11:00:00"),
            # c: 1 turn day 2 -> bounce
            ("c", 0, "user", "x", None, "2024-01-02 09:00:00"),
        ],
    )
    out = {str(r["day_ts"])[:10]: r
           for r in bounce_rate_daily(df).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1["n_started"], d1["n_bounced"]) == (2, 1)
    assert d1["bounce_share"] == 0.5
    assert (d2["n_started"], d2["n_bounced"], d2["bounce_share"]) == (
        1, 1, 1.0)


def test_ttft_hand_computed(spark):
    from aroma_spark.operators.cohorts import time_to_first_tool_daily

    df = _t(
        spark,
        [
            # a: first turn 10:00, first tool 10:00:30 -> ttft 30s
            ("a", 0, "view", "x", None, "2024-01-01 10:00:00"),
            ("a", 1, "click", "x", "click", "2024-01-01 10:00:30"),
            ("a", 2, "click", "x", "click", "2024-01-01 10:05:00"),
            # b: never uses a tool
            ("b", 0, "view", "x", None, "2024-01-01 11:00:00"),
            ("b", 1, "view", "x", "", "2024-01-01 11:00:10"),
        ],
    )
    out = time_to_first_tool_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_started"], r["n_with_tool"]) == (2, 1)
    assert (r["sum_ttft_us"], r["mean_ttft_us"]) == (
        30_000_000, 30_000_000)
    assert r["tool_share"] == 0.5


def test_error_recovery_hand_computed(spark):
    from aroma_spark.operators.cohorts import error_recovery_daily

    df = _t(
        spark,
        [
            # a: error at turn 1, recovered 5s later
            ("a", 0, "view", "x", None, "2024-01-01 10:00:00"),
            ("a", 1, "error", "x", None, "2024-01-01 10:00:10"),
            ("a", 2, "view", "x", None, "2024-01-01 10:00:15"),
            # b: error is terminal
            ("b", 0, "view", "x", None, "2024-01-01 11:00:00"),
            ("b", 1, "error", "x", None, "2024-01-01 11:00:20"),
        ],
    )
    out = error_recovery_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_errors"], r["n_recovered"], r["n_terminal"]) == (2, 1, 1)
    assert (r["sum_recovery_us"], r["mean_recovery_us"]) == (
        5_000_000, 5_000_000)
    assert r["recovery_share"] == 0.5


def test_mau_monthly_chain_break(spark):
    from aroma_spark.operators.cohorts import mau_monthly

    df = _t(
        spark,
        [
            ("a", 0, "user", "x", None, "2024-01-05 10:00:00"),
            ("b", 0, "user", "x", None, "2024-01-20 10:00:00"),
            ("a", 1, "user", "x", None, "2024-02-05 10:00:00"),
            # March skipped; April has one conv -> chain broken
            ("c", 0, "user", "x", None, "2024-04-01 10:00:00"),
        ],
    )
    out = {str(r["month_ts"])[:7]: r for r in mau_monthly(df).collect()}
    assert out["2024-01"]["n_active"] == 2
    feb = out["2024-02"]
    assert (feb["n_active"], feb["prev_n_active"], feb["mom_growth"]) == (
        1, 2, -0.5)
    apr = out["2024-04"]
    assert (apr["prev_n_active"], apr["mom_growth"]) == (None, None)


def test_conv_span_profile(spark):
    from aroma_spark.operators.cohorts import conv_span_profile

    df = _t(
        spark,
        [
            # a: spans 2 calendar days
            ("a", 0, "user", "x", None, "2024-01-01 23:00:00"),
            ("a", 1, "user", "x", None, "2024-01-03 01:00:00"),
            # b: same-day
            ("b", 0, "user", "x", None, "2024-01-01 10:00:00"),
            ("b", 1, "user", "x", None, "2024-01-01 10:30:00"),
        ],
    )
    out = conv_span_profile(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_started"], r["n_multi_day"], r["max_span_days"],
            r["sum_span_days"]) == (2, 1, 2, 2)
    assert r["multi_day_share"] == 0.5


def test_signup_purchase_lag(spark):
    from aroma_spark.operators.cohorts import signup_purchase_lag_daily

    df = _t(
        spark,
        [
            # a: signup then purchase 90s later (an earlier purchase
            # BEFORE signup must not count)
            ("a", 0, "purchase", "x", None, "2024-01-01 09:00:00"),
            ("a", 1, "signup", "x", None, "2024-01-01 10:00:00"),
            ("a", 2, "purchase", "x", None, "2024-01-01 10:01:30"),
            # b: signup, never purchases
            ("b", 0, "signup", "x", None, "2024-01-01 11:00:00"),
            # c: no signup -> not a cohort member
            ("c", 0, "purchase", "x", None, "2024-01-01 12:00:00"),
        ],
    )
    out = signup_purchase_lag_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_signups"], r["n_converted"]) == (2, 1)
    assert (r["sum_lag_us"], r["mean_lag_us"]) == (90_000_000, 90_000_000)
    assert r["conversion_share"] == 0.5


def test_cohort_retention_weekly(spark):
    from aroma_spark.operators.cohorts import cohort_retention_weekly

    df = _t(
        spark,
        [
            # a starts week of Jan 1, active again 2 weeks later
            ("a", 0, "user", "x", None, "2024-01-02 10:00:00"),
            ("a", 1, "user", "x", None, "2024-01-16 10:00:00"),
            # b active only in its first week
            ("b", 0, "user", "x", None, "2024-01-03 10:00:00"),
        ],
    )
    out = {(str(r["cohort_week"])[:10], r["offset_week"]): r["n_convs"]
           for r in cohort_retention_weekly(df).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 2)] == 1
    assert ("2024-01-01", 1) not in out


def test_error_convs_weekly(spark):
    from aroma_spark.operators.cohorts import error_convs_weekly

    df = _t(
        spark,
        [
            ("a", 0, "view", "x", None, "2024-01-02 10:00:00"),
            ("a", 1, "error", "x", None, "2024-01-02 11:00:00"),
            ("b", 0, "view", "x", None, "2024-01-03 10:00:00"),
        ],
    )
    r = error_convs_weekly(df).collect()[0]
    assert (r["n_convs"], r["n_with_error"]) == (2, 1)
    assert r["error_share"] == 0.5


def test_audience_overlap_weekly(spark):
    from aroma_spark.operators.cohorts import audience_overlap_weekly

    rows = [
        ("A", 0, "user", "x", None, "2024-01-01 10:00:00"),
        ("A", 1, "user", "x", None, "2024-01-08 10:00:00"),
        ("B", 0, "user", "x", None, "2024-01-01 11:00:00"),
        ("C", 0, "user", "x", None, "2024-01-08 12:00:00"),
    ]
    out = {r["day"].day: r
           for r in audience_overlap_weekly(_t(spark, rows)).collect()}
    d1 = out[1]
    # no week-ago audience: 0/2 Jaccard, undefined return share
    assert (d1["n_today"], d1["n_week_ago"], d1["n_both"]) == (2, 0, 0)
    assert d1["jaccard"] == 0.0 and d1["return_share"] is None
    d8 = out[8]
    # today {A,C}, week-ago {A,B}: intersection {A}, union 3
    assert (d8["n_today"], d8["n_week_ago"], d8["n_both"]) == (2, 2, 1)
    assert (d8["jaccard"], d8["return_share"]) == (0.333333, 0.5)
