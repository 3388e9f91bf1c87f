"""Goldens for the relational TPC-H shapes (operators/tpch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.tpch import pricing_summary, shipping_priority


def _lineitem(spark, rows):
    """rows = (orderkey, qty, price, disc, tax, flag, status, shipdate)."""
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))


def test_q1_hand_computed(spark):
    # two rows in one group: (qty 2, $10.00, 5% disc, 2% tax) and
    # (qty 3, $1.50, 0% disc, 0% tax); one row past the cutoff ignored
    rows = [
        (1, 2.0, 10.00, 0.05, 0.02, "A", "F", "1998-01-01 00:00:00"),
        (2, 3.0, 1.50, 0.00, 0.00, "A", "F", "1998-02-01 00:00:00"),
        (3, 9.0, 99.0, 0.0, 0.0, "A", "F", "1998-12-01 00:00:00"),
    ]
    r = pricing_summary(_lineitem(spark, rows)).collect()[0]
    assert (r["l_returnflag"], r["l_linestatus"], r["n_rows"]) == ("A", "F", 2)
    assert (r["sum_qty"], r["sum_base_price_c"]) == (5, 1000 + 150)
    # disc_price: 1000*(100-5) + 150*100 = 95000 + 15000 = 110000
    assert r["sum_disc_price_ch"] == 110000
    # charge: 95000*(100+2) + 15000*100 = 9690000 + 1500000
    assert r["sum_charge_chh"] == 9_690_000 + 1_500_000
    assert r["avg_qty"] == 2.5
    assert r["avg_price_c"] == 575.0
    assert r["avg_disc_h"] == 2.5


def test_q1_groups_independent(spark):
    rows = [
        (1, 1.0, 1.00, 0.0, 0.0, "N", "O", "1997-01-01 00:00:00"),
        (2, 1.0, 2.00, 0.0, 0.0, "R", "F", "1997-01-01 00:00:00"),
    ]
    out = {(r["l_returnflag"], r["l_linestatus"]): r["sum_base_price_c"]
           for r in pricing_summary(_lineitem(spark, rows)).collect()}
    assert out == {("N", "O"): 100, ("R", "F"): 200}


def test_q3_hand_computed(spark):
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "1996-01-01 00:00:00"),
            (11, 1, "1996-06-01 00:00:00"),  # after cutoff -> excluded
            (12, 2, "1996-01-01 00:00:00"),  # wrong segment
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = _lineitem(
        spark,
        [
            (10, 1.0, 10.00, 0.10, 0.0, "N", "O", "1996-04-01 00:00:00"),
            (10, 1.0, 5.00, 0.00, 0.0, "N", "O", "1996-05-01 00:00:00"),
            (10, 1.0, 9.00, 0.00, 0.0, "N", "O", "1996-01-01 00:00:00"),  # shipped early -> excluded
            (12, 1.0, 99.0, 0.0, 0.0, "N", "O", "1996-04-01 00:00:00"),
        ],
    )
    out = shipping_priority(cust, orders, li).collect()
    assert len(out) == 1
    r = out[0]
    # revenue: 1000*(100-10) + 500*100 = 90000 + 50000
    assert (r["o_orderkey"], r["revenue_ch"], r["n_lines"], r["rank"]) == (
        10, 140000, 2, 1,
    )


def test_q3_topk_deterministic_tie(spark):
    cust = spark.createDataFrame([(1, "BUILDING")], "c_custkey long, c_mktsegment string")
    orders = spark.createDataFrame(
        [(20, 1, "1996-01-01 00:00:00"), (21, 1, "1996-01-02 00:00:00")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = _lineitem(
        spark,
        [
            (20, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-04-01 00:00:00"),
            (21, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-04-01 00:00:00"),
        ],
    )
    out = shipping_priority(cust, orders, li, k=1).collect()
    assert out[0]["o_orderkey"] == 20  # revenue tie -> lower orderkey


def test_q5_regional_revenue(spark):
    from aroma_spark.operators.tpch import regional_revenue

    region = spark.createDataFrame(
        [(2, "ASIA"), (3, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(20, "CHINA", 2), (21, "JAPAN", 2), (30, "FRANCE", 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(100, 20), (101, 30)], "s_suppkey long, s_nationkey int"
    )
    customer = spark.createDataFrame(
        [(1, 20), (2, 30)], "c_custkey long, c_nationkey int"
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "1996-06-01 00:00:00"),
            (11, 1, "1995-06-01 00:00:00"),  # outside year
            (12, 2, "1996-06-01 00:00:00"),  # FR customer
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = _lineitem(
        spark,
        [
            # order 10, CN supplier matching CN customer: revenue counts
            (10, 1.0, 10.00, 0.10, 0.0, "N", "O", "1996-07-01 00:00:00"),
            # order 10, FR supplier (nation mismatch): dropped
            (10, 1.0, 99.0, 0.0, 0.0, "N", "O", "1996-07-01 00:00:00"),
        ],
    ).withColumn("l_suppkey", F.when(F.col("l_extendedprice") < 50, 100).otherwise(101))
    out = regional_revenue(customer, orders, li, supplier, nation, region).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_name"], r["revenue_ch"], r["n_lines"]) == ("CHINA", 90000, 1)


def test_q18_large_orders(spark):
    from aroma_spark.operators.tpch import large_orders

    orders = spark.createDataFrame(
        [(1, "1996-01-01 00:00:00"), (2, "1996-01-02 00:00:00")],
        "o_orderkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = _lineitem(
        spark,
        [
            (1, 20.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-05 00:00:00"),
            (1, 10.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-06 00:00:00"),
            (2, 5.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-05 00:00:00"),
        ],
    )
    out = large_orders(orders, li, min_qty=25).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["o_orderkey"], r["total_qty"], r["n_lines"]) == (1, 30, 2)


def test_q14_promo_share(spark):
    from aroma_spark.operators.tpch import promo_revenue_monthly

    part = spark.createDataFrame(
        [(1, "PROMO BRUSHED"), (2, "STANDARD PLATED")],
        "p_partkey long, p_type string",
    )
    li = _lineitem(
        spark,
        [
            (10, 1.0, 10.00, 0.10, 0.0, "N", "O", "1996-01-05 00:00:00"),
            (11, 1.0, 5.00, 0.00, 0.0, "N", "O", "1996-01-06 00:00:00"),
            (12, 1.0, 1.00, 0.00, 0.0, "N", "O", "1996-02-01 00:00:00"),
        ],
    ).withColumn("l_partkey", F.when(F.col("l_extendedprice") >= 10, 1).otherwise(2))
    out = {r["month_ts"].month: r for r in promo_revenue_monthly(li, part).collect()}
    jan = out[1]
    # promo: 1000*(100-10)=90000; total: 90000 + 500*100=140000
    assert (jan["promo_rev_ch"], jan["total_rev_ch"]) == (90000, 140000)
    assert jan["promo_share"] == round(90000 / 140000, 6)
    assert (out[2]["promo_rev_ch"], out[2]["promo_share"]) == (0, 0.0)


def test_customer_balance_by_segment(spark):
    from aroma_spark.operators.tpch import customer_balance_by_segment

    cust = spark.createDataFrame(
        [
            ("BUILDING", 100.50),
            ("BUILDING", -10.25),
            ("MACHINERY", 0.01),
        ],
        "c_mktsegment string, c_acctbal double",
    )
    out = {r["c_mktsegment"]: r for r in customer_balance_by_segment(cust).collect()}
    b = out["BUILDING"]
    assert (b["n_customers"], b["sum_bal_c"]) == (2, 10050 - 1025)
    assert (b["min_bal_c"], b["max_bal_c"], b["n_negative"]) == (-1025, 10050, 1)
    assert b["mean_bal_c"] == round((10050 - 1025) / 2, 6)
    assert out["MACHINERY"]["sum_bal_c"] == 1


def test_supplier_share_monthly(spark):
    from aroma_spark.operators.tpch import supplier_share_monthly

    li = _lineitem(
        spark,
        [
            (1, 1.0, 30.00, 0.0, 0.0, "N", "O", "1996-01-05 00:00:00"),
            (2, 1.0, 10.00, 0.0, 0.0, "N", "O", "1996-01-06 00:00:00"),
            (3, 1.0, 1.00, 0.0, 0.0, "N", "O", "1996-02-01 00:00:00"),
        ],
    ).withColumn(
        "l_suppkey",
        F.when(F.col("l_extendedprice") >= 30, 7).otherwise(8),
    )
    out = {r["month_ts"].month: r for r in supplier_share_monthly(li).collect()}
    jan = out[1]
    # supplier 7: 300000 ch, supplier 8: 100000 ch
    assert (jan["n_suppliers"], jan["total_rev_ch"]) == (2, 400000)
    assert (jan["top_suppkey"], jan["top_rev_ch"]) == (7, 300000)
    assert jan["top_share"] == 0.75
    assert out[2]["top_share"] == 1.0


def test_q6_hand_computed(spark):
    from aroma_spark.operators.tpch import forecast_revenue_change

    rows = [
        # in range, 6% disc, qty 10: rev_ch = 1000c * 6 = 6000
        (1, 10.0, 10.00, 0.06, 0.0, "N", "O", "1996-06-01 00:00:00"),
        # in range, 5% disc, qty 23: rev_ch = 200c * 5 = 1000
        (2, 23.0, 2.00, 0.05, 0.0, "N", "O", "1996-07-01 00:00:00"),
        # discount 4% -> excluded
        (3, 5.0, 50.00, 0.04, 0.0, "N", "O", "1996-08-01 00:00:00"),
        # qty 24 -> excluded (strict <)
        (4, 24.0, 50.00, 0.06, 0.0, "N", "O", "1996-09-01 00:00:00"),
        # shipped outside the year -> excluded
        (5, 5.0, 50.00, 0.06, 0.0, "N", "O", "1997-01-01 00:00:00"),
    ]
    r = forecast_revenue_change(_lineitem(spark, rows)).collect()[0]
    assert (r["n_rows"], r["sum_qty"], r["revenue_ch"]) == (2, 33, 7000)
    assert r["avg_disc_h"] == 5.5


def test_q6_empty_selection(spark):
    from aroma_spark.operators.tpch import forecast_revenue_change

    rows = [(1, 50.0, 10.00, 0.06, 0.0, "N", "O", "1996-06-01 00:00:00")]
    r = forecast_revenue_change(_lineitem(spark, rows)).collect()[0]
    assert (r["n_rows"], r["sum_qty"], r["revenue_ch"]) == (0, 0, 0) or (
        r["n_rows"] == 0
    )


def _orders(spark, rows):
    """rows = (orderkey, custkey, orderdate)."""
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))


def test_q10_hand_computed(spark):
    from aroma_spark.operators.tpch import returned_revenue_by_customer

    li = _lineitem(spark, [
        # order 1 (cust 10, in window): R line $10.00 @ 10% -> 1000*90
        (1, 1.0, 10.00, 0.10, 0.0, "R", "F", "1996-02-01 00:00:00"),
        # order 1: non-returned line ignored
        (1, 1.0, 99.00, 0.00, 0.0, "N", "O", "1996-02-01 00:00:00"),
        # order 2 (cust 20, in window): R line $2.00 @ 0% -> 200*100
        (2, 1.0, 2.00, 0.00, 0.0, "R", "F", "1996-02-02 00:00:00"),
        # order 3 (cust 10, out of window): R line ignored
        (3, 1.0, 50.00, 0.00, 0.0, "R", "F", "1996-06-01 00:00:00"),
    ])
    orders = _orders(spark, [
        (1, 10, "1996-01-15 00:00:00"),
        (2, 20, "1996-03-15 00:00:00"),
        (3, 10, "1996-05-15 00:00:00"),
    ])
    customer = spark.createDataFrame(
        [(10, "Cust#10", 0, "BUILDING"), (20, "Cust#20", 1, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_mktsegment string",
    )
    nation = spark.createDataFrame(
        [(0, "FRANCE"), (1, "KENYA")], "n_nationkey int, n_name string"
    )
    out = {r["c_custkey"]: r for r in returned_revenue_by_customer(
        li, orders, customer, nation).collect()}
    assert out[10]["revenue_ch"] == 1000 * 90
    assert out[10]["n_name"] == "FRANCE"
    assert out[20]["revenue_ch"] == 200 * 100
    assert len(out) == 2


def test_q22_idle_rich(spark):
    from aroma_spark.operators.tpch import idle_rich_customers

    customer = spark.createDataFrame(
        [
            # positive balances: 100c, 300c -> avg positive = 200c
            (1, "a", 0, 1.00, "AUTO"),
            (2, "b", 0, 3.00, "AUTO"),   # above avg, no orders -> idle
            (3, "c", 0, 2.50, "STEEL"),  # above avg, HAS orders
            (4, "d", 0, -5.00, "AUTO"),  # negative, excluded
        ],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    orders = _orders(spark, [(9, 3, "1996-01-01 00:00:00")])
    out = {r["c_mktsegment"]: r
           for r in idle_rich_customers(customer, orders).collect()}
    # rich = cust 2 (300c, idle) and cust 3 (250c, has orders)
    a, s = out["AUTO"], out["STEEL"]
    assert (a["n_rich"], a["n_idle"], a["sum_bal_c"],
            a["sum_idle_bal_c"]) == (1, 1, 300, 300)
    assert a["idle_share"] == 1.0
    assert (s["n_rich"], s["n_idle"], s["sum_idle_bal_c"]) == (1, 0, 0)
    assert s["idle_share"] == 0.0


def test_q7_trade_matrix(spark):
    from aroma_spark.operators.tpch import nation_trade_volume

    li = spark.createDataFrame(
        [
            # order 1, supplier 100: $10 @ 10% in 1996 -> 1000*90
            (1, 0, 100, 1, 1.0, 10.00, 0.10, 0.0, "N", "O",
             "1996-02-01 00:00:00"),
            # order 2, supplier 200: $2 @ 0% in 1997 -> 200*100
            (2, 0, 200, 1, 1.0, 2.00, 0.00, 0.0, "N", "O",
             "1997-03-01 00:00:00"),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    orders = _orders(spark, [
        (1, 10, "1996-01-01 00:00:00"), (2, 20, "1997-01-01 00:00:00")])
    customer = spark.createDataFrame(
        [(10, "a", 0, 0.0, "AUTO"), (20, "b", 1, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    supplier = spark.createDataFrame(
        [(100, "s1", 1, 0.0), (200, "s2", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int,"
        " s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "FRANCE", 0), (1, "KENYA", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    out = {(r["supp_nation"], r["cust_nation"], r["l_year"]): r
           for r in nation_trade_volume(
               li, orders, customer, supplier, nation).collect()}
    assert out[("KENYA", "FRANCE", 1996)]["revenue_ch"] == 1000 * 90
    assert out[("FRANCE", "KENYA", 1997)]["revenue_ch"] == 200 * 100
    assert len(out) == 2


def test_q19_disjunctive(spark):
    from aroma_spark.operators.tpch import disjunctive_revenue

    li = spark.createDataFrame(
        [
            # part 1 (Brand#12, size 5): qty 10 in [1,11] -> matches
            (1, 1, 10.0, 10.00, 0.00),
            # part 1: qty 15 outside [1,11] -> no triple matches
            (2, 1, 15.0, 10.00, 0.00),
            # part 2 (Brand#23, size 20): qty 15 in [10,20] -> matches
            (3, 2, 15.0, 4.00, 0.50),
            # part 3 (Brand#99): no triple -> excluded
            (4, 3, 10.0, 9.00, 0.00),
        ],
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#12", 5), (2, "Brand#23", 20), (3, "Brand#99", 5)],
        "p_partkey long, p_brand string, p_size int",
    )
    out = {r["p_brand"]: r
           for r in disjunctive_revenue(li, part).collect()}
    assert out["Brand#12"]["revenue_ch"] == 1000 * 100
    assert out["Brand#12"]["n_lines"] == 1
    assert out["Brand#23"]["revenue_ch"] == 400 * 50
    assert len(out) == 2


def test_fulfillment_by_priority(spark):
    from aroma_spark.operators.tpch import fulfillment_by_priority

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", "1996-01-01 00:00:00"),
            (2, "1-URGENT", "1996-02-01 00:00:00"),
            (3, "5-LOW", "1996-01-01 00:00:00"),
            (4, "5-LOW", "1996-01-01 00:00:00"),  # no lines -> dropped
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = _lineitem(spark, [
        # order 1: last ship 10 days out (two lines)
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-05 00:00:00"),
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-11 00:00:00"),
        # order 2: 2 days
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-03 00:00:00"),
        # order 3: 30 days
        (3, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-31 00:00:00"),
    ])
    out = {r["o_orderpriority"]: r
           for r in fulfillment_by_priority(orders, li).collect()}
    u = out["1-URGENT"]
    assert (u["n_orders"], u["sum_days"], u["min_days"],
            u["max_days"]) == (2, 12, 2, 10)
    assert u["mean_days"] == 6.0
    assert (out["5-LOW"]["n_orders"], out["5-LOW"]["sum_days"]) == (1, 30)


def test_orders_per_customer_hist(spark):
    from aroma_spark.operators.tpch import orders_per_customer_hist

    # cust 1: 1 order (bucket 0), cust 2: 3 orders (bucket 1),
    # cust 3: 4 orders (bucket 2)
    rows = [(k, c, "1996-01-01 00:00:00")
            for k, c in enumerate([1, 2, 2, 2, 3, 3, 3, 3])]
    orders = _orders(spark, rows)
    out = {r["bucket"]: r
           for r in orders_per_customer_hist(orders).collect()}
    assert (out[0]["lo_orders"], out[0]["n_customers"],
            out[0]["sum_orders"]) == (1, 1, 1)
    assert (out[1]["lo_orders"], out[1]["n_customers"],
            out[1]["sum_orders"]) == (2, 1, 3)
    assert (out[2]["lo_orders"], out[2]["n_customers"]) == (4, 1)
    assert out[0]["share"] == round(1 / 3, 6)


def test_part_class_revenue(spark):
    from aroma_spark.operators.tpch import part_class_revenue

    part = spark.createDataFrame(
        [(1, "PROMO BRUSHED TIN"), (2, "STANDARD PLATED")],
        "p_partkey long, p_type string",
    )
    li = spark.createDataFrame(
        [
            (1, 10.00, 0.10),  # 1000 * 90 = 90000
            (1, 1.00, 0.00),   # 100 * 100 = 10000
            (2, 2.00, 0.00),   # 200 * 100 = 20000
        ],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    out = {r["part_class"]: r
           for r in part_class_revenue(li, part).collect()}
    p = out["PROMO"]
    assert (p["n_lines"], p["revenue_ch"]) == (2, 100000)
    assert p["revenue_share"] == round(100000 / 120000, 6)
    assert out["STANDARD"]["revenue_share"] == round(20000 / 120000, 6)


def test_order_price_audit(spark):
    from aroma_spark.operators.tpch import order_price_audit

    orders = spark.createDataFrame(
        # order 1 totalprice exactly matches its one line's charge:
        # 1000c * 95 * 102 = 9_690_000 chh -> 969 c -> $9.69
        [(1, "O", 9.69), (2, "F", 5.00)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    li = _lineitem(spark, [
        (1, 1.0, 10.00, 0.05, 0.02, "N", "O", "1996-01-01 00:00:00"),
        # order 2's line charges sum to 300c but header says 500c
        (2, 1.0, 3.00, 0.00, 0.00, "N", "O", "1996-01-01 00:00:00"),
    ])
    out = {r["o_orderstatus"]: r
           for r in order_price_audit(orders, li).collect()}
    o = out["O"]
    assert (o["n_orders"], o["n_within_tol"], o["max_abs_gap_c"]) == (
        1, 1, 0)
    assert o["within_share"] == 1.0
    f = out["F"]
    assert (f["n_within_tol"], f["max_abs_gap_c"],
            f["sum_abs_gap_c"]) == (0, 200, 200)


def test_region_revenue_mix(spark):
    from aroma_spark.operators.tpch import region_revenue_mix

    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(10, "CHINA", 0), (20, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int")
    supplier = spark.createDataFrame(
        [(100, "s1", 10, 0.0), (200, "s2", 20, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int,"
        " s_acctbal double")
    li = spark.createDataFrame(
        [
            (100, 10.00, 0.10),  # ASIA: 1000*90 = 90000
            (200, 1.00, 0.00),   # EUROPE: 100*100 = 10000
        ],
        "l_suppkey long, l_extendedprice double, l_discount double")
    out = {r["r_name"]: r
           for r in region_revenue_mix(li, supplier, nation, region).collect()}
    assert out["ASIA"]["revenue_ch"] == 90000
    assert out["ASIA"]["revenue_share"] == 0.9
    assert out["EUROPE"]["revenue_share"] == 0.1


def test_orders_month_mix(spark):
    from aroma_spark.operators.tpch import orders_month_mix

    orders = spark.createDataFrame(
        [
            (1, "1995-01-10 00:00:00", 1.00),
            (2, "1996-01-20 00:00:00", 2.00),  # same month, other year
            (3, "1996-03-05 00:00:00", 4.00),
        ],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["month"]: r for r in orders_month_mix(orders).collect()}
    jan = out[1]
    assert (jan["n_orders"], jan["sum_total_c"]) == (2, 300)
    assert jan["order_share"] == round(2 / 3, 6)
    assert out[3]["sum_total_c"] == 400


def test_ship_delay_by_nation(spark):
    from aroma_spark.operators.tpch import ship_delay_by_nation

    orders = _orders(spark, [(1, 10, "1996-01-01 00:00:00")])
    li = _lineitem(spark, [
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-06 00:00:00"),
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-11 00:00:00"),
    ]).withColumn("l_suppkey", F.lit(100))
    supplier = spark.createDataFrame(
        [(100, "s", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    nation = spark.createDataFrame(
        [(0, "CHINA", 0)], "n_nationkey int, n_name string, n_regionkey int")
    r = ship_delay_by_nation(li, orders, supplier, nation).collect()[0]
    assert (r["supp_nation"], r["n_lines"], r["sum_days"], r["min_days"],
            r["max_days"]) == ("CHINA", 2, 15, 5, 10)
    assert r["mean_days"] == 7.5


def test_order_value_by_priority(spark):
    from aroma_spark.operators.tpch import order_value_by_priority

    orders = spark.createDataFrame(
        [("1-URGENT", 1.00), ("1-URGENT", 3.00), ("5-LOW", 10.00)],
        "o_orderpriority string, o_totalprice double")
    out = {r["o_orderpriority"]: r
           for r in order_value_by_priority(orders).collect()}
    u = out["1-URGENT"]
    assert (u["n_orders"], u["sum_total_c"], u["min_total_c"],
            u["max_total_c"]) == (2, 400, 100, 300)
    assert u["mean_total_c"] == 200.0


def test_top_order_monthly(spark):
    from aroma_spark.operators.tpch import top_order_monthly

    orders = spark.createDataFrame(
        [
            (1, "1996-01-05 00:00:00", 1.00),
            (2, "1996-01-20 00:00:00", 3.00),
            (3, "1996-02-01 00:00:00", 2.00),
            # tie with order 5 -> lower orderkey wins
            (5, "1996-02-10 00:00:00", 2.00),
        ],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["month_ts"].month: r for r in top_order_monthly(orders).collect()}
    jan = out[1]
    assert (jan["o_orderkey"], jan["top_total_c"], jan["n_orders"],
            jan["month_total_c"]) == (2, 300, 2, 400)
    assert jan["top_share"] == 0.75
    assert out[2]["o_orderkey"] == 3  # tie -> lower key


def test_order_interarrival_hist(spark):
    from aroma_spark.operators.tpch import order_interarrival_hist

    orders = _orders(spark, [
        # cust 1: gaps 0 (same day) and 3 days
        (1, 1, "1996-01-01 00:00:00"),
        (2, 1, "1996-01-01 00:00:00"),
        (3, 1, "1996-01-04 00:00:00"),
        # cust 2: single order -> no gap
        (4, 2, "1996-06-01 00:00:00"),
    ])
    out = {r["bucket"]: r
           for r in order_interarrival_hist(orders).collect()}
    # gap 0 -> bin(1) len 1 -> bucket 0 (lo 0); gap 3 -> bin(4) -> bucket 2 (lo 3)
    assert (out[0]["lo_gap_days"], out[0]["n_gaps"],
            out[0]["sum_gap_days"]) == (0, 1, 0)
    assert (out[2]["lo_gap_days"], out[2]["n_gaps"],
            out[2]["sum_gap_days"]) == (3, 1, 3)
    assert out[0]["share"] == 0.5


def test_supplier_balance_by_nation(spark):
    from aroma_spark.operators.tpch import supplier_balance_by_nation

    supplier = spark.createDataFrame(
        [(1, "a", 0, 10.00), (2, "b", 0, -2.50), (3, "c", 1, 5.00)],
        "s_suppkey long, s_name string, s_nationkey int,"
        " s_acctbal double")
    nation = spark.createDataFrame(
        [(0, "CHINA", 0), (1, "FRANCE", 0)],
        "n_nationkey int, n_name string, n_regionkey int")
    out = {r["n_name"]: r
           for r in supplier_balance_by_nation(supplier, nation).collect()}
    cn = out["CHINA"]
    assert (cn["n_suppliers"], cn["sum_bal_c"], cn["min_bal_c"],
            cn["n_negative"]) == (2, 750, -250, 1)
    assert cn["mean_bal_c"] == 375.0


def test_priority_segment_mix(spark):
    from aroma_spark.operators.tpch import priority_segment_mix

    customer = spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTO")],
        "c_custkey long, c_mktsegment string")
    orders = spark.createDataFrame(
        [
            (10, 1, "1-URGENT"), (11, 1, "1-URGENT"), (12, 1, "5-LOW"),
            (13, 2, "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string")
    out = {(r["c_mktsegment"], r["o_orderpriority"]): r
           for r in priority_segment_mix(orders, customer).collect()}
    bu = out[("BUILDING", "1-URGENT")]
    assert (bu["n_orders"], bu["seg_total"], bu["pri_total"],
            bu["corpus_total"]) == (2, 3, 2, 4)
    assert bu["lift"] == round(2 * 4 / (3 * 2), 6)
    assert out[("AUTO", "5-LOW")]["lift"] == round(1 * 4 / (1 * 2), 6)


def test_lines_per_order_hist(spark):
    from aroma_spark.operators.tpch import lines_per_order_hist

    # order 1: 1 line (bucket 0); order 2: 3 lines (bucket 1)
    li = _lineitem(spark, [
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-02 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-03 00:00:00"),
    ])
    out = {r["bucket"]: r for r in lines_per_order_hist(li).collect()}
    assert (out[0]["lo_lines"], out[0]["n_orders"],
            out[0]["sum_lines"]) == (1, 1, 1)
    assert (out[1]["n_orders"], out[1]["sum_lines"]) == (1, 3)
    # heaviest key (3 lines) / total (4 lines)
    assert out[0]["max_lines"] == 3
    assert out[0]["top_key_share"] == 0.75


def test_retail_markup_by_class(spark):
    from aroma_spark.operators.tpch import retail_markup_by_class

    part = spark.createDataFrame(
        [(1, "PROMO X", 10.00), (2, "LARGE Y", 4.00)],
        "p_partkey long, p_type string, p_retailprice double")
    li = spark.createDataFrame(
        [(1, 9.00), (1, 11.00), (2, 2.00)],
        "l_partkey long, l_extendedprice double")
    out = {r["part_class"]: r
           for r in retail_markup_by_class(li, part).collect()}
    p = out["PROMO"]
    assert (p["n_lines"], p["sum_sold_c"], p["sum_retail_c"]) == (
        2, 2000, 2000)
    assert p["street_to_list"] == 1.0
    assert out["LARGE"]["street_to_list"] == 0.5


def test_orders_dow_mix(spark):
    from aroma_spark.operators.tpch import orders_dow_mix

    orders = spark.createDataFrame(
        [
            # 2024-01-01 is a Monday (Spark dow=2)
            (1, "2024-01-01 00:00:00", 1.00),
            (2, "2024-01-08 00:00:00", 2.00),
            # Tuesday
            (3, "2024-01-02 00:00:00", 4.00),
        ],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["dow"]: r for r in orders_dow_mix(orders).collect()}
    mon = out[2]
    assert (mon["n_orders"], mon["sum_total_c"]) == (2, 300)
    assert mon["order_share"] == round(2 / 3, 6)


def test_value_vs_speed_deciles(spark):
    from aroma_spark.operators.tpch import value_vs_speed_deciles

    # 10 orders with value = k dollars, fulfillment = k days
    orders = spark.createDataFrame(
        [(k, "1996-01-01 00:00:00", float(k)) for k in range(1, 11)],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = _lineitem(spark, [
        (k, 1.0, 1.0, 0.0, 0.0, "N", "O",
         f"1996-01-{k+1:02d} 00:00:00") for k in range(1, 11)
    ])
    out = {r["decile"]: r
           for r in value_vs_speed_deciles(orders, li).collect()}
    assert len(out) == 10
    assert (out[0]["n_orders"], out[0]["sum_total_c"],
            out[0]["sum_days"]) == (1, 100, 1)
    assert (out[9]["sum_total_c"], out[9]["mean_days"]) == (1000, 10.0)


def test_orders_per_customer_by_region(spark):
    from aroma_spark.operators.tpch import orders_per_customer_by_region

    region = spark.createDataFrame(
        [(0, "ASIA")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(10, "CHINA", 0)], "n_nationkey int, n_name string,"
        " n_regionkey int")
    customer = spark.createDataFrame(
        [(1, "a", 10, 0.0, "AUTO"), (2, "b", 10, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string")
    orders = _orders(spark, [
        (10, 1, "1996-01-01 00:00:00"),
        (11, 1, "1996-02-01 00:00:00"),
        (12, 2, "1996-03-01 00:00:00"),
    ])
    r = orders_per_customer_by_region(
        orders, customer, nation, region).collect()[0]
    assert (r["r_name"], r["n_customers"], r["n_orders"]) == (
        "ASIA", 2, 3)
    assert r["orders_per_customer"] == 1.5


def test_discount_hist(spark):
    from aroma_spark.operators.tpch import discount_hist

    li = _lineitem(spark, [
        (1, 1.0, 10.00, 0.05, 0.0, "N", "O", "1996-01-01 00:00:00"),
        (2, 1.0, 20.00, 0.05, 0.0, "N", "O", "1996-01-01 00:00:00"),
        (3, 1.0, 10.00, 0.00, 0.0, "N", "O", "1996-01-01 00:00:00"),
    ])
    out = {r["disc_h"]: r for r in discount_hist(li).collect()}
    d5 = out[5]
    assert (d5["n_lines"], d5["base_c"], d5["discount_ch"]) == (
        2, 3000, 15000)
    assert d5["discount_share"] == 1.0
    assert (out[0]["discount_ch"], out[0]["discount_share"]) == (0, 0.0)


def test_order_backlog_daily(spark):
    from aroma_spark.operators.tpch import order_backlog_daily

    orders = _orders(spark, [
        (1, 1, "1996-01-01 00:00:00"),
        (2, 1, "1996-01-02 00:00:00"),
    ])
    li = _lineitem(spark, [
        # order 1 ships Jan 3; order 2 ships Jan 3
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-03 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-02 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-03 00:00:00"),
    ])
    out = {str(r["day_ts"])[:10]: r
           for r in order_backlog_daily(orders, li).collect()}
    assert (out["1996-01-01"]["n_placed"],
            out["1996-01-01"]["backlog"]) == (1, 1)
    assert (out["1996-01-02"]["n_placed"],
            out["1996-01-02"]["backlog"]) == (1, 2)
    d3 = out["1996-01-03"]
    assert (d3["n_shipped"], d3["backlog"]) == (2, 0)


def test_priority_mix_monthly(spark):
    from aroma_spark.operators.tpch import priority_mix_monthly

    orders = _orders(spark, [(k, 1, d) for k, d in enumerate([
        # Jan: 2 urgent, 2 low; Feb: 3 urgent, 1 low
        "1996-01-05 00:00:00", "1996-01-06 00:00:00",
        "1996-01-07 00:00:00", "1996-01-08 00:00:00",
        "1996-02-05 00:00:00", "1996-02-06 00:00:00",
        "1996-02-07 00:00:00", "1996-02-08 00:00:00",
    ])]).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey").isin(0, 1, 4, 5, 6), "1-URGENT")
        .otherwise("5-LOW"),
    )
    out = {(r["month_ts"].month, r["o_orderpriority"]): r
           for r in priority_mix_monthly(orders).collect()}
    ju = out[(1, "1-URGENT")]
    assert (ju["n_orders"], ju["month_orders"], ju["share"]) == (
        2, 4, 0.5)
    assert ju["drift"] is None
    fu = out[(2, "1-URGENT")]
    assert fu["share"] == 0.75
    assert fu["drift"] == 0.25


def test_late_order_share(spark):
    from aroma_spark.operators.tpch import late_order_share

    orders = _orders(spark, [
        (1, 1, "1996-01-01 00:00:00"),   # URGENT, one late line
        (2, 1, "1996-01-01 00:00:00"),   # URGENT, on time
        (3, 1, "1996-01-01 00:00:00"),   # LOW, two late lines (1 order)
        (4, 1, "1996-01-01 00:00:00"),   # LOW, exactly 20 days = not late
    ]).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey").isin(1, 2), "1-URGENT")
        .otherwise("5-LOW"),
    )
    li = _lineitem(spark, [
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-01 00:00:00"),  # +31d
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-02 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-10 00:00:00"),
        (3, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-03-01 00:00:00"),
        (3, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-15 00:00:00"),
        (4, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-21 00:00:00"),  # +20d
    ])
    out = {r["o_orderpriority"]: r
           for r in late_order_share(orders, li).collect()}
    u = out["1-URGENT"]
    assert (u["n_orders"], u["n_late_orders"], u["late_share"]) == (
        2, 1, 0.5)
    lo = out["5-LOW"]
    # order 3 counts ONCE despite two late lines; +20d is not > 20
    assert (lo["n_orders"], lo["n_late_orders"], lo["late_share"]) == (
        2, 1, 0.5)


def test_sole_late_suppliers(spark):
    from aroma_spark.operators.tpch import sole_late_suppliers

    orders = _orders(spark, [
        (1, 1, "1996-01-01 00:00:00"),  # supp 10 late, supp 20 on time
        (2, 1, "1996-01-01 00:00:00"),  # both late -> nobody blamed
        (3, 1, "1996-01-01 00:00:00"),  # single-supplier late -> excluded
        (4, 1, "1996-01-01 00:00:00"),  # supp 10 late again (2 supps)
    ])
    li = spark.createDataFrame(
        [
            (1, 10, "1996-02-01 00:00:00"),
            (1, 20, "1996-01-05 00:00:00"),
            (2, 10, "1996-02-01 00:00:00"),
            (2, 20, "1996-02-01 00:00:00"),
            (3, 30, "1996-02-01 00:00:00"),
            (4, 10, "1996-02-01 00:00:00"),
            (4, 30, "1996-01-05 00:00:00"),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    supplier = spark.createDataFrame(
        [(10, 0), (20, 0), (30, 1)],
        "s_suppkey long, s_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "FRANCE"), (1, "KENYA")],
        "n_nationkey int, n_name string",
    )
    out = {r["supp_nation"]: r
           for r in sole_late_suppliers(li, orders, supplier, nation)
           .collect()}
    # supplier 10 blamed in orders 1 and 4; nobody else anywhere
    assert (out["FRANCE"]["numwait"],
            out["FRANCE"]["n_suppliers"]) == (2, 1)
    assert "KENYA" not in out


def test_revenue_pacing_monthly(spark):
    from aroma_spark.operators.tpch import revenue_pacing_monthly

    orders = spark.createDataFrame(
        [
            (1, 1.00, "1996-01-01 00:00:00"),
            (2, 2.00, "1996-01-05 00:00:00"),
            (3, 3.00, "1996-02-01 00:00:00"),
        ],
        "o_orderkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {(r["month_ts"].month, r["day_ts"].day): r
           for r in revenue_pacing_monthly(orders).collect()}
    j1 = out[(1, 1)]
    assert (j1["day_cents"], j1["mtd_cents"], j1["month_cents"],
            j1["pace"]) == (100, 100, 300, 0.333333)
    j5 = out[(1, 5)]
    assert (j5["mtd_cents"], j5["pace"]) == (300, 1.0)
    assert out[(2, 1)]["pace"] == 1.0


def test_order_sla_monthly(spark):
    from aroma_spark.operators.tpch import order_sla_monthly

    orders = _orders(spark, [
        (1, 1, "1996-01-01 00:00:00"),  # ships +10d: within
        (2, 1, "1996-01-02 00:00:00"),  # last line +30d: breach
        (3, 1, "1996-02-01 00:00:00"),  # +20d exactly: within
    ])
    li = _lineitem(spark, [
        (1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-11 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-05 00:00:00"),
        (2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-01 00:00:00"),
        (3, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-02-21 00:00:00"),
    ])
    out = {r["month_ts"].month: r
           for r in order_sla_monthly(orders, li).collect()}
    jan = out[1]
    # order 2's SLA judges the LAST line (+30d), not the early one
    assert (jan["n_orders"], jan["n_within_sla"], jan["sla_share"],
            jan["worst_days"]) == (2, 1, 0.5, 30)
    feb = out[2]
    assert (feb["n_within_sla"], feb["worst_days"]) == (1, 20)


def test_rolling_median_revenue(spark):
    from aroma_spark.operators.tpch import rolling_median_revenue

    orders = spark.createDataFrame(
        [
            (1, 1.00, "1996-01-01 00:00:00"),
            (2, 3.00, "1996-01-02 00:00:00"),
            (3, 2.00, "1996-01-03 00:00:00"),
            (4, 9.00, "1996-01-20 00:00:00"),  # outside every 7d window
        ],
        "o_orderkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["day_ts"].day: r
           for r in rolling_median_revenue(orders).collect()}
    assert (out[1]["n_days"], out[1]["med_cents"]) == (1, 100)
    # window {100, 300}: lower median -> 100
    assert (out[2]["n_days"], out[2]["med_cents"]) == (2, 100)
    # window {100, 300, 200}: median 200
    assert (out[3]["n_days"], out[3]["med_cents"]) == (3, 200)
    # Jan 20 sees only itself
    assert (out[20]["n_days"], out[20]["med_cents"]) == (1, 900)


def test_qty_discount_curve(spark):
    from aroma_spark.operators.tpch import qty_discount_curve

    li = _lineitem(spark, [
        (1, 1.0, 1.00, 0.10, 0.0, "N", "O", "1996-01-01 00:00:00"),
        (2, 1.0, 1.00, 0.20, 0.0, "N", "O", "1996-01-01 00:00:00"),
        (3, 2.0, 2.00, 0.00, 0.0, "N", "O", "1996-01-01 00:00:00"),
    ])
    out = {r["qty"]: r for r in qty_discount_curve(li).collect()}
    q1 = out[1]
    # discounts 10% and 20% -> mean 15 hundredths; revenue in
    # cent-hundredths: 100*90 + 100*80
    assert (q1["n_lines"], q1["mean_disc_h"], q1["revenue_ch"]) == (
        2, 15.0, 17000)
    assert (out[2]["mean_disc_h"], out[2]["revenue_ch"]) == (0.0, 20000)


def test_cust_trend_sign(spark):
    from aroma_spark.operators.tpch import cust_trend_sign

    rows = []
    for i, vals in [(1, [1.0, 2.0, 3.0]), (2, [3.0, 2.0, 1.0]),
                    (3, [5.0, 5.0, 5.0]), (4, [1.0, 9.0])]:
        for j, v in enumerate(vals):
            rows.append((i * 100 + j, i, v, f"1996-01-{j + 1:02d} 00:00:00"))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["trend_sign"]: r for r in cust_trend_sign(orders).collect()}
    # cust 4 (2 orders) is excluded; the three 3-order customers
    # split one per sign
    assert (out[1]["n_customers"], out[-1]["n_customers"],
            out[0]["n_customers"]) == (1, 1, 1)
    assert out[1]["share"] == 0.333333


def test_brand_price_spread(spark):
    from aroma_spark.operators.tpch import brand_price_spread

    part = spark.createDataFrame(
        [
            (1, "B#1", 1.00), (2, "B#1", 3.00), (3, "B#1", 2.00),
            (4, "B#2", 5.00), (5, "B#2", 7.00),
        ],
        "p_partkey long, p_brand string, p_retailprice double",
    )
    out = {r["p_brand"]: r for r in brand_price_spread(part).collect()}
    b1 = out["B#1"]
    assert (b1["n_parts"], b1["min_cents"], b1["med_cents"],
            b1["max_cents"]) == (3, 100, 200, 300)
    # even count: lower median
    assert out["B#2"]["med_cents"] == 500


def test_revenue_seasonal_index(spark):
    from aroma_spark.operators.tpch import revenue_seasonal_index

    orders = spark.createDataFrame(
        [
            # two Januaries averaging 200c/mo, one February at 100c;
            # overall monthly mean = 500/3
            (1, 1.00, "1995-01-10 00:00:00"),
            (2, 3.00, "1996-01-10 00:00:00"),
            (3, 1.00, "1996-02-10 00:00:00"),
        ],
        "o_orderkey long, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {r["month_of_year"]: r
           for r in revenue_seasonal_index(orders).collect()}
    jan = out[1]
    assert (jan["n_months"], jan["sum_cents"]) == (2, 400)
    assert jan["seasonal_idx"] == 1.2
    assert out[2]["seasonal_idx"] == 0.6


def test_region_nation_rollup(spark):
    from aroma_spark.operators.tpch import region_nation_rollup

    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "FRANCE", 0), (1, "JAPAN", 1)],
        "n_nationkey int, n_name string, n_regionkey int")
    customer = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)],
        "c_custkey long, c_nationkey int")
    orders = spark.createDataFrame(
        [(1, 1, 1.00), (2, 2, 2.00), (3, 3, 4.00)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    out = {(r["region_name"], r["nation_name"]): r
           for r in region_nation_rollup(
               orders, customer, nation, region).collect()}
    # leaf rows (level 0), region subtotals (1), grand total (3)
    assert out[("EUROPE", "FRANCE")]["sum_cents"] == 300
    assert out[("EUROPE", "ALL")]["level"] == 1
    assert out[("EUROPE", "ALL")]["sum_cents"] == 300
    assert (out[("ALL", "ALL")]["level"],
            out[("ALL", "ALL")]["n_orders"],
            out[("ALL", "ALL")]["sum_cents"]) == (3, 3, 700)


def test_benford_order_value(spark):
    import math

    from aroma_spark.operators.tpch import benford_order_value

    orders = spark.createDataFrame(
        [(1, 1.23), (2, 19.99), (3, 11.00), (4, 90.00)],
        "o_orderkey long, o_totalprice double",
    )
    out = {r["digit"]: r for r in benford_order_value(orders).collect()}
    # cents: 123, 1999, 1100, 9000 -> digits 1,1,1,9
    assert (out[1]["n_orders"], out[1]["share"]) == (3, 0.75)
    assert out[1]["benford_share"] == round(math.log10(2), 6)
    assert out[9]["n_orders"] == 1
    assert out[9]["excess"] == round(0.25 - math.log10(1 + 1 / 9), 6)


def test_round_number_audit(spark):
    from aroma_spark.operators.tpch import round_number_audit

    orders = spark.createDataFrame(
        [(1, 1.23), (2, 5.00), (3, 20.00), (4, 300.00)],
        "o_orderkey long, o_totalprice double",
    )
    r = round_number_audit(orders).collect()[0]
    # 5.00, 20.00, 300.00 are round dollars; 20/300 round tens;
    # 300 the only round hundred
    assert (r["n_orders"], r["n_round_dollar"], r["n_round_ten"],
            r["n_round_hundred"]) == (4, 3, 2, 1)
    assert (r["dollar_share"], r["ten_share"]) == (0.75, 0.5)
