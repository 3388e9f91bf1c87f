"""Goldens for the business-metric pair: cents-quantized value
rollups and JSON props extraction (operators/business.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.business import props_field_stats, value_rollup_daily


def _events(spark, rows):
    """rows = (event_id, ts, event_type, value, props)."""
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double,"
        " props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_value_rollup_hand_computed(spark):
    rows = [
        (1, "2024-01-01 01:00:00", "purchase", 185.22, "{}"),
        (2, "2024-01-01 02:00:00", "purchase", 9.64, "{}"),
        (3, "2024-01-01 03:00:00", "click", 0.03, "{}"),
    ]
    out = {r["event_type"]: r for r in value_rollup_daily(_events(spark, rows)).collect()}
    p = out["purchase"]
    assert (p["n_events"], p["sum_cents"]) == (2, 18522 + 964)
    assert (p["min_cents"], p["max_cents"]) == (964, 18522)
    assert p["mean_cents"] == 9743.0
    assert out["click"]["sum_cents"] == 3


def test_value_rollup_cents_exact_on_awkward_floats(spark):
    # 0.1 + 0.2 style floats that misbehave as doubles are exact in cents
    rows = [
        (1, "2024-01-01 01:00:00", "x", 0.1, "{}"),
        (2, "2024-01-01 02:00:00", "x", 0.2, "{}"),
        (3, "2024-01-01 03:00:00", "x", 0.29, "{}"),
    ]
    r = value_rollup_daily(_events(spark, rows)).collect()[0]
    assert r["sum_cents"] == 10 + 20 + 29


def test_props_stats_hand_computed(spark):
    rows = [
        (1, "2024-01-01 01:00:00", "a", 1.0, '{"k": 87}'),
        (2, "2024-01-01 02:00:00", "a", 1.0, '{"k": 0}'),
        (3, "2024-01-01 03:00:00", "a", 1.0, '{"other": 5}'),
        (4, "2024-01-01 04:00:00", "b", 1.0, "not json"),
    ]
    out = {r["event_type"]: r for r in props_field_stats(_events(spark, rows)).collect()}
    a = out["a"]
    assert (a["n_events"], a["n_with_field"]) == (3, 2)
    assert (a["sum_field"], a["min_field"], a["max_field"]) == (87, 0, 87)
    assert a["mean_field"] == 43.5
    b = out["b"]
    assert (b["n_with_field"], b["mean_field"]) == (0, None)


# ------------------------------------------------------- RFM / Pareto


def test_rfm_hand_computed(spark):
    from aroma_spark.operators.business import rfm_users

    rows = [
        (1, "2024-01-05 10:00:00", "p", 100.00, "{}"),
        (2, "2024-01-04 10:00:00", "p", 50.00, "{}"),
        (3, "2024-01-03 10:00:00", "p", 25.00, "{}"),
        (4, "2024-01-02 10:00:00", "p", 10.00, "{}"),
        (5, "2024-01-01 10:00:00", "p", 5.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "user_id", F.col("event_id")
    )
    out = {r["user_id"]: r for r in rfm_users(df).collect()}
    assert out[1]["recency_days"] == 0 and out[5]["recency_days"] == 4
    assert [out[u]["r_score"] for u in (1, 2, 3, 4, 5)] == [5, 4, 3, 2, 1]
    assert [out[u]["m_score"] for u in (1, 2, 3, 4, 5)] == [5, 4, 3, 2, 1]
    # frequency all tied -> user_id ascending tie-break
    assert [out[u]["f_score"] for u in (1, 2, 3, 4, 5)] == [5, 4, 3, 2, 1]
    assert out[1]["m_cents"] == 10000


def test_pareto_whale(spark):
    from aroma_spark.operators.business import pareto_revenue

    rows = [
        (1, "2024-01-01 10:00:00", "p", 80.00, "{}"),
        (2, "2024-01-01 11:00:00", "p", 10.00, "{}"),
        (3, "2024-01-01 12:00:00", "p", 5.00, "{}"),
        (4, "2024-01-01 13:00:00", "p", 5.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "user_id", F.col("event_id")
    )
    r = pareto_revenue(df).collect()[0]
    assert (r["n_users"], r["users_to_pct"]) == (4, 1)
    assert (r["total_cents"], r["covered_cents"]) == (10000, 8000)
    assert r["top_user_share"] == 0.8


def test_pareto_uniform(spark):
    from aroma_spark.operators.business import pareto_revenue

    rows = [
        (i, "2024-01-01 10:00:00", "p", 10.00, "{}") for i in range(1, 6)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "user_id", F.col("event_id")
    )
    r = pareto_revenue(df).collect()[0]
    # uniform: need 4 of 5 users for 80%
    assert (r["users_to_pct"], r["covered_cents"]) == (4, 4000)
    assert r["top_user_share"] == 0.2


def test_interpurchase_hand_computed(spark):
    from aroma_spark.operators.business import interpurchase_daily

    rows = [
        # user 1: purchases at t0, t0+10s (same day), next day +20s
        (1, "2024-01-01 10:00:00", 1, "purchase"),
        (2, "2024-01-01 10:00:10", 1, "purchase"),
        (3, "2024-01-02 10:00:30", 1, "purchase"),
        # user 2: single purchase -> no gap
        (4, "2024-01-01 12:00:00", 2, "purchase"),
        # non-purchase noise ignored
        (5, "2024-01-01 10:00:05", 1, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r
           for r in interpurchase_daily(df).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1["n_gaps"], d1["sum_gap_us"]) == (1, 10_000_000)
    # day-2 gap: 24h + 20s
    assert (d2["n_gaps"], d2["sum_gap_us"]) == (
        1, (86400 + 20) * 1_000_000)
    assert d1["mean_gap_us"] == 10_000_000


def test_interpurchase_tie_break_event_id(spark):
    from aroma_spark.operators.business import interpurchase_daily

    # same-ts purchases ordered by event_id: gaps are 0
    rows = [
        (10, "2024-01-01 10:00:00", 1, "purchase"),
        (11, "2024-01-01 10:00:00", 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = interpurchase_daily(df).collect()[0]
    assert (r["n_gaps"], r["sum_gap_us"], r["min_gap_us"]) == (1, 0, 0)


def test_rolling_revenue_7d(spark):
    from aroma_spark.operators.business import rolling_revenue_7d

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-03 10:00:00", 1, "purchase", 2.00),
        # 9 days later: day 1+3 fall out of the 7-day frame
        (3, "2024-01-10 10:00:00", 2, "purchase", 4.00),
        (4, "2024-01-10 11:00:00", 2, "view", 99.00),  # not purchase
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r
           for r in rolling_revenue_7d(df).collect()}
    assert out["2024-01-01"]["rolling_cents"] == 100
    # Jan 3 window [Dec 28..Jan 3] holds both purchases
    d3 = out["2024-01-03"]
    assert (d3["day_cents"], d3["rolling_cents"],
            d3["n_days_in_window"]) == (200, 300, 2)
    # Jan 10 window [Jan 4..Jan 10]: only its own purchase
    d10 = out["2024-01-10"]
    assert (d10["day_cents"], d10["rolling_cents"],
            d10["n_days_in_window"], d10["rolling_n_events"]) == (
        400, 400, 1, 1)


def test_revenue_heatmap_hand_computed(spark):
    from aroma_spark.operators.business import revenue_heatmap

    rows = [
        # 2024-01-01 is a Monday -> Spark dow=2
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-01 10:30:00", 2, "purchase", 2.50),
        (3, "2024-01-01 11:00:00", 1, "purchase", 4.00),
        (4, "2024-01-01 10:15:00", 1, "view", 99.0),  # not purchase
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["dow"], r["hod"]): r for r in revenue_heatmap(df).collect()}
    m10 = out[(2, 10)]
    assert (m10["n_purchases"], m10["sum_cents"]) == (2, 350)
    assert m10["mean_cents"] == 175.0
    assert out[(2, 11)]["sum_cents"] == 400
    assert len(out) == 2


def test_purchase_value_percentiles(spark):
    from aroma_spark.operators.business import purchase_value_percentiles

    # 10 purchases of 1.00..10.00 on one day
    rows = [(i, "2024-01-01 10:00:00", 1, "purchase", float(i))
            for i in range(1, 11)]
    rows.append((99, "2024-01-01 11:00:00", 1, "view", 50.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = purchase_value_percentiles(df).collect()[0]
    # ranks: p50 -> 5, p90 -> 9, p99 -> ceil(9.9) = 10
    assert (r["n_purchases"], r["p50_cents"], r["p90_cents"],
            r["p99_cents"]) == (10, 500, 900, 1000)


def test_wow_revenue_chain_break(spark):
    from aroma_spark.operators.business import wow_revenue

    rows = [
        # week of Mon 2024-01-01: 1.00
        (1, "2024-01-02 10:00:00", 1, "purchase", 1.00),
        # next week: 3.00
        (2, "2024-01-09 10:00:00", 1, "purchase", 3.00),
        # two weeks later (gap): 9.00 -> chain broken
        (3, "2024-01-23 10:00:00", 1, "purchase", 9.00),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["week_ts"])[:10]: r for r in wow_revenue(df).collect()}
    assert out["2024-01-01"]["wow_growth"] is None
    w2 = out["2024-01-08"]
    assert (w2["prev_week_cents"], w2["wow_growth"]) == (100, 2.0)
    w4 = out["2024-01-22"]
    assert (w4["prev_week_cents"], w4["wow_growth"]) == (None, None)


def test_revenue_new_vs_returning(spark):
    from aroma_spark.operators.business import revenue_new_vs_returning

    rows = [
        # user 1 first active Jan 1 (view), purchases same day (new)
        (1, "2024-01-01 09:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        # user 1 purchases again Jan 2 (returning)
        (3, "2024-01-02 10:00:00", 1, "purchase", 3.00),
        # user 2 first active Jan 2 via purchase (new)
        (4, "2024-01-02 11:00:00", 2, "purchase", 5.00),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r
           for r in revenue_new_vs_returning(df).collect()}
    d1 = out["2024-01-01"]
    assert (d1["new_cents"], d1["returning_cents"]) == (100, 0)
    assert d1["new_share"] == 1.0
    d2 = out["2024-01-02"]
    assert (d2["new_cents"], d2["returning_cents"],
            d2["total_cents"]) == (500, 300, 800)
    assert d2["new_share"] == 0.625


def test_top_buyer_daily(spark):
    from aroma_spark.operators.business import top_buyer_daily

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-01 11:00:00", 1, "purchase", 2.00),
        (3, "2024-01-01 12:00:00", 2, "purchase", 2.50),
        (4, "2024-01-01 13:00:00", 2, "view", 99.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = top_buyer_daily(df).collect()[0]
    # user 1: 300c over 2 purchases; user 2: 250c
    assert (r["top_user_id"], r["top_cents"], r["n_user_purchases"]) == (
        1, 300, 2)
    assert (r["day_cents"], r["top_share"]) == (550, round(300/550, 6))


def test_revenue_outlier_days(spark):
    from aroma_spark.operators.business import revenue_outlier_days

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-02 10:00:00", 1, "purchase", 1.10),
        (3, "2024-01-03 10:00:00", 1, "purchase", 5.00),   # high
        (4, "2024-01-04 10:00:00", 1, "purchase", 0.40),   # low
        (5, "2024-01-05 10:00:00", 1, "purchase", 1.20),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day_ts"])[:10]: r
           for r in revenue_outlier_days(df).collect()}
    # daily cents sorted: 40,100,110,120,500 -> median 110
    assert out["2024-01-01"]["median_cents"] == 110
    assert (out["2024-01-03"]["is_high"], out["2024-01-03"]["is_low"]) == (
        True, False)
    assert (out["2024-01-04"]["is_high"], out["2024-01-04"]["is_low"]) == (
        False, True)
    assert out["2024-01-02"]["is_high"] is False


def test_value_quality_audit(spark):
    from aroma_spark.operators.business import value_quality_audit

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-01 11:00:00", 1, "purchase", 0.00),
        (3, "2024-01-01 12:00:00", 1, "purchase", -2.00),
        (4, "2024-01-01 13:00:00", 1, "purchase", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = value_quality_audit(df).collect()[0]
    assert (r["n_events"], r["n_null"], r["n_zero"], r["n_negative"]) == (
        4, 1, 1, 1)
    assert r["zero_share"] == 0.25


def test_spend_activity_deciles(spark):
    from aroma_spark.operators.business import spend_activity_deciles

    rows = []
    # 10 users with increasing spend; user i purchases on i days
    eid = 0
    for u in range(1, 11):
        for d in range(1, u + 1):
            eid += 1
            rows.append(
                (eid, f"2024-01-{d:02d} 10:00:00", u, "purchase",
                 float(u)))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["decile"]: r for r in spend_activity_deciles(df).collect()}
    assert len(out) == 10
    # user spend = u purchases * u dollars = u^2*100 cents, increasing
    # in u, so decile d holds exactly user d+1
    assert (out[0]["n_users"], out[0]["sum_cents"],
            out[0]["sum_active_days"]) == (1, 100, 1)
    assert (out[9]["sum_cents"], out[9]["mean_active_days"]) == (
        10 * 10 * 100, 10.0)


def test_type_hour_lift(spark):
    from aroma_spark.operators.business import type_hour_lift

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 10:30:00", 1, "purchase", 1.0),
        (3, "2024-01-01 20:00:00", 1, "purchase", 1.0),
        (4, "2024-01-01 20:30:00", 1, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["event_type"], r["hod"]): r
           for r in type_hour_lift(df).collect()}
    p20 = out[("purchase", 20)]
    assert (p20["n_events"], p20["type_total"], p20["hour_total"],
            p20["corpus_total"]) == (2, 3, 2, 4)
    assert p20["lift"] == round(2 * 4 / (3 * 2), 6)
    v10 = out[("view", 10)]
    assert v10["lift"] == 2.0


def test_repeat_buyers_weekly(spark):
    from aroma_spark.operators.business import repeat_buyers_weekly

    rows = [
        # user 1 buys week of Jan 1 and week of Jan 8 -> repeat in w2
        (1, "2024-01-02 10:00:00", 1, "purchase", 1.0),
        (2, "2024-01-09 10:00:00", 1, "purchase", 1.0),
        # user 2 buys w1, skips w2, buys w3 -> NOT a repeat in w3
        (3, "2024-01-03 10:00:00", 2, "purchase", 1.0),
        (4, "2024-01-16 10:00:00", 2, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["week_ts"])[:10]: r
           for r in repeat_buyers_weekly(df).collect()}
    assert (out["2024-01-01"]["n_buyers"],
            out["2024-01-01"]["n_repeat"]) == (2, 0)
    w2 = out["2024-01-08"]
    assert (w2["n_buyers"], w2["n_repeat"], w2["repeat_share"]) == (
        1, 1, 1.0)
    assert out["2024-01-15"]["n_repeat"] == 0


def test_props_field_hist(spark):
    from aroma_spark.operators.business import props_field_hist

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, '{"k": 0}'),
        (2, "2024-01-01 10:00:00", 1, "view", 0.0, '{"k": 3}'),
        (3, "2024-01-01 10:00:00", 1, "view", 0.0, '{"k": 3}'),
        (4, "2024-01-01 10:00:00", 1, "view", 0.0, '{"other": 1}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["bucket"]: r for r in props_field_hist(df).collect()}
    # k=0 -> bin(1) -> bucket 0; k=3 -> bin(4) -> bucket 2
    assert (out[0]["lo_value"], out[0]["n_events"]) == (0, 1)
    assert (out[2]["lo_value"], out[2]["n_events"],
            out[2]["sum_value"]) == (3, 2, 6)
    assert (out[-1]["lo_value"], out[-1]["n_events"]) == (None, 1)
    assert out[2]["share"] == 0.5


def test_median_value_by_type(spark):
    from aroma_spark.operators.business import median_value_by_type

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-01 10:00:00", 1, "purchase", 9.00),
        (3, "2024-01-01 10:00:00", 1, "purchase", 2.00),
        (4, "2024-01-01 10:00:00", 1, "view", 0.50),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_type"]: r for r in median_value_by_type(df).collect()}
    assert (out["purchase"]["n_events"],
            out["purchase"]["median_cents"]) == (3, 200)
    assert out["view"]["median_cents"] == 50


def _uevents(spark, rows):
    """rows = (event_id, ts, user_id, event_type, value)."""
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_cohort_ltv_weekly(spark):
    from aroma_spark.operators.business import cohort_ltv_weekly

    # 2024-01-01 is a Monday: week0=01-01, week2=01-15
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),       # u1 cohort w0
        (2, "2024-01-02 10:00:00", 1, "purchase", 1.00),  # w0 offset 0
        (3, "2024-01-16 10:00:00", 1, "purchase", 2.00),  # offset 2
        (4, "2024-01-03 10:00:00", 2, "view", 0.0),       # u2 cohort w0
        (5, "2024-01-15 10:00:00", 3, "purchase", 5.00),  # u3 cohort w2
    ]
    out = {(r["cohort_week"].day, r["offset_week"]): r
           for r in cohort_ltv_weekly(_uevents(spark, rows)).collect()}
    w0_0 = out[(1, 0)]
    # cohort of Jan-1 week has 2 users; only u1 bought ($1.00)
    assert (w0_0["cohort_users"], w0_0["n_buyers"], w0_0["rev_cents"],
            w0_0["cum_rev_cents"], w0_0["ltv_cents_per_user"]) == (
        2, 1, 100, 100, 50)
    w0_2 = out[(1, 2)]
    assert (w0_2["rev_cents"], w0_2["cum_rev_cents"],
            w0_2["ltv_cents_per_user"]) == (200, 300, 150)
    w2_0 = out[(15, 0)]
    assert (w2_0["cohort_users"], w2_0["cum_rev_cents"],
            w2_0["ltv_cents_per_user"]) == (1, 500, 500)


def test_purchase_attribution(spark):
    from aroma_spark.operators.business import purchase_attribution

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 11:00:00", 1, "click", 0.0),
        (3, "2024-01-01 12:00:00", 1, "purchase", 1.00),
        # the purchase at 12:00 does NOT reset the touch — the last
        # NON-purchase event (the 11:00 click) still gets the credit
        (4, "2024-01-01 13:00:00", 1, "purchase", 2.00),
        (5, "2024-01-01 10:00:00", 2, "purchase", 5.00),  # no prior touch
    ]
    out = {r["touch"]: r
           for r in purchase_attribution(_uevents(spark, rows)).collect()}
    assert (out["click"]["n_purchases"], out["click"]["rev_cents"],
            out["click"]["share"]) == (2, 300, 0.666667)
    assert (out["(none)"]["n_purchases"],
            out["(none)"]["rev_cents"]) == (1, 500)


def test_user_type_concentration(spark):
    from aroma_spark.operators.business import user_type_concentration

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 0.0),
        (2, "2024-01-01 11:00:00", 1, "purchase", 0.0),
        (3, "2024-01-01 12:00:00", 1, "purchase", 0.0),
        (4, "2024-01-01 13:00:00", 1, "view", 0.0),
        (5, "2024-01-01 10:00:00", 2, "view", 0.0),
        (6, "2024-01-01 11:00:00", 2, "view", 0.0),
    ]
    out = {r["bucket"]: r
           for r in user_type_concentration(_uevents(spark, rows))
           .collect()}
    # u1: top type 3 of 4 -> (30 div 4) = bucket 7; u2: pure -> 10
    assert (out[7]["lo_share"], out[7]["n_users"],
            out[7]["user_share"]) == (0.7, 1, 0.5)
    assert (out[10]["lo_share"], out[10]["n_users"]) == (1.0, 1)


def test_spend_decile_mobility(spark):
    from aroma_spark.operators.business import spend_decile_mobility

    # 2024-01-01 and 2024-01-08 are consecutive Mondays
    rows = [
        (1, "2024-01-02 10:00:00", 1, "purchase", 1.00),
        (2, "2024-01-02 11:00:00", 2, "purchase", 2.00),
        (3, "2024-01-02 12:00:00", 3, "purchase", 3.00),
        (4, "2024-01-02 13:00:00", 4, "purchase", 4.00),
        (5, "2024-01-09 10:00:00", 1, "purchase", 4.00),
        (6, "2024-01-09 11:00:00", 4, "purchase", 1.00),
    ]
    out = {(r["from_decile"], r["to_decile"]): r["n_users"]
           for r in spend_decile_mobility(_uevents(spark, rows))
           .collect()}
    # week1 deciles over 4 users: u1->0, u2->2, u3->5, u4->7;
    # week2 over 2 users: u4 rank1 -> 0, u1 rank2 -> 5
    assert out == {(0, 5): 1, (7, 0): 1}


def test_repurchase_lag_hist(spark):
    from aroma_spark.operators.business import repurchase_lag_hist

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0),
        (2, "2024-01-04 10:00:00", 1, "purchase", 1.0),  # lag 3 days
        (3, "2024-01-09 10:00:00", 1, "purchase", 1.0),  # 3rd ignored
        (4, "2024-01-02 10:00:00", 2, "purchase", 1.0),
        (5, "2024-01-02 23:00:00", 2, "purchase", 1.0),  # same day: 0
        (6, "2024-01-05 10:00:00", 3, "purchase", 1.0),  # only one
        (7, "2024-01-05 10:00:00", 4, "view", 1.0),      # never bought
    ]
    out = {r["lag_days"]: r
           for r in repurchase_lag_hist(_uevents(spark, rows)).collect()}
    assert (out[3]["n_users"], out[3]["share"]) == (1, 0.5)
    assert (out[0]["n_users"], out[0]["share"]) == (1, 0.5)
    assert len(out) == 2


def test_intraday_value_curve(spark):
    from aroma_spark.operators.business import intraday_value_curve

    rows = [
        (1, "2024-01-01 01:10:00", 1, "purchase", 1.00),
        (2, "2024-01-02 01:50:00", 1, "purchase", 2.00),
        (3, "2024-01-01 23:00:00", 2, "purchase", 1.00),
    ]
    out = {r["hour_of_day"]: r
           for r in intraday_value_curve(_uevents(spark, rows)).collect()}
    # hour 1 pools both days
    assert (out[1]["cents"], out[1]["cum_cents"],
            out[1]["cum_share"]) == (300, 300, 0.75)
    assert (out[23]["cum_cents"], out[23]["cum_share"]) == (400, 1.0)


def test_daily_role_pivot(spark):
    from aroma_spark.operators.business import daily_role_pivot

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0),
        (2, "2024-01-01 11:00:00", 1, "view", 0.0),
        (3, "2024-01-01 12:00:00", 2, "purchase", 1.0),
        (4, "2024-01-02 10:00:00", 1, "error", 0.0),
    ]
    out = {r["day_ts"].day: r
           for r in daily_role_pivot(_uevents(spark, rows)).collect()}
    d1 = out[1]
    assert (d1["n_view"], d1["n_purchase"], d1["n_click"],
            d1["n_signup"], d1["n_error"]) == (2, 1, 0, 0, 0)
    assert (out[2]["n_error"], out[2]["n_view"]) == (1, 0)
