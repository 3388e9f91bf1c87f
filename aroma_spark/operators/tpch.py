"""Integer-exact renditions of the classic TPC-H analytics shapes
over the driver's relational tables — the pricing-summary scan-agg
(Q1) and the broadcast-dimension shipping-priority join (Q3).

These prove the engine's RELATIONAL face: the transcript/timeseries
operators never exercise a 3-table star join or a
predicate-pushdown-heavy scan-agg, and a user of a general analytics
engine runs exactly these shapes daily.

House bit-determinism discipline meets TPC-H's DOUBLE money columns
the same way operators/business.py does: quantize FIRST —
prices to integer cents, discount/tax (2-decimal fractions) to
integer hundredths, quantity to whole units — all via
``floor(x * k + 0.5)`` (floor, not CAST: Spark's double->bigint cast
truncates where DuckDB's rounds). After quantization every product in
Q1's famous sum chain is exact int64:

    disc_price  = price_c * (100 - disc_h)        (cent-hundredths)
    charge      = disc_price * (100 + tax_h)      (cent-hh-hundredths)

int64 headroom: charge <= ~1.2e11 per row, so the per-group sums are
safe to ~7e6 rows per (returnflag, linestatus) group (SF ~5); past
that, switch the two big sums to decimal(38,0) — the group count is
6, so the wide type costs nothing.

Scale shape:
- Q1 is ONE map-side-combinable aggregation over the pruned scan
  (7 columns of 11 read; the shipdate filter lands in PushedFilters).
- Q3 broadcasts the filtered customer dimension into orders, then
  joins lineitem on orderkey (the one big exchange), aggregates by
  (orderkey, orderdate, shippriority-less schema) and takes a
  deterministic top-10 (revenue DESC, orderkey ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRICE_C = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
DISC_H = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
TAX_H = "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"
QTY_I = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


def pricing_summary(
    lineitem: DataFrame, cutoff: str = "1998-09-02"
) -> DataFrame:
    """TPC-H Q1, integer-exact: per (returnflag, linestatus) over
    lineitems shipped on or before ``cutoff``.

    Emits ``l_returnflag, l_linestatus, sum_qty, sum_base_price_c,
    sum_disc_price_ch, sum_charge_chh, n_rows, avg_qty, avg_price_c,
    avg_disc_h`` — the three averages are shared floats over exact
    sums; the big sums carry their unit suffix (c = cents,
    ch = cent-hundredths, chh = cent-hundredths-hundredths) so no
    consumer mistakes the scale.
    """
    base = lineitem.where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit(cutoff))
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.expr(QTY_I).alias("qty"),
        F.expr(PRICE_C).alias("price_c"),
        F.expr(DISC_H).alias("disc_h"),
        F.expr(TAX_H).alias("tax_h"),
    )
    agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").cast("long").alias("sum_qty"),
        F.sum("price_c").cast("long").alias("sum_base_price_c"),
        F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_h")))
        .cast("long")
        .alias("sum_disc_price_ch"),
        F.sum(
            F.col("price_c")
            * (F.lit(100) - F.col("disc_h"))
            * (F.lit(100) + F.col("tax_h"))
        )
        .cast("long")
        .alias("sum_charge_chh"),
        F.sum("disc_h").cast("long").alias("sum_disc_h"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price_c",
        "sum_disc_price_ch",
        "sum_charge_chh",
        "n_rows",
        F.expr(
            "round(CAST(sum_qty AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)"
        ).alias("avg_qty"),
        F.expr(
            "round(CAST(sum_base_price_c AS DOUBLE)"
            " / CAST(n_rows AS DOUBLE), 6)"
        ).alias("avg_price_c"),
        F.expr(
            "round(CAST(sum_disc_h AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)"
        ).alias("avg_disc_h"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    orderdate_before: str = "1996-03-15",
    shipdate_after: str = "1996-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3, integer-exact: top-``k`` unshipped orders of one
    market segment by discounted revenue.

    The filtered customer dimension broadcasts into orders; the
    orders->lineitem equi-join on orderkey is the one real exchange;
    revenue sums exact cent-hundredths; the top-k cut is the
    deterministic (revenue DESC, orderkey ASC) order.

    Emits ``o_orderkey, o_orderdate, revenue_ch, n_lines, rank``.
    """
    from pyspark.sql import Window

    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(
        F.col("o_orderdate") < F.to_timestamp(F.lit(orderdate_before))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.where(
        F.col("l_shipdate") > F.to_timestamp(F.lit(shipdate_after))
    ).select(
        "l_orderkey",
        (
            F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))
        ).alias("rev_ch"),
    )
    joined = (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(li, ords.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum("rev_ch").cast("long").alias("revenue_ch"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
    # top-k via orderBy+limit (TakeOrdered: per-partition heaps, no
    # single-task global sort — r6, round-5 verdict item 1); only the k
    # survivors are then numbered (a k-row frame, bounded by the knob)
    w = Window.orderBy(F.col("revenue_ch").desc(), F.col("o_orderkey").asc())
    top = joined.orderBy(
        F.col("revenue_ch").desc(), F.col("o_orderkey").asc()
    ).limit(k)
    return top.select(
        "o_orderkey",
        "o_orderdate",
        "revenue_ch",
        "n_lines",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def regional_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape, integer-exact: discounted revenue per nation
    for orders placed in one year where the SUPPLIER sits in the
    customer's nation, restricted to one region — the six-table snow-
    flake join every warehouse benchmark opens with.

    Join strategy at scale: region -> nation -> supplier collapse into
    one tiny broadcast dimension (a few thousand rows at any SF);
    customer joins it broadcast too; the only real exchanges are
    orders->customer (custkey) and lineitem->orders (orderkey) — the
    same two shuffles a hand-tuned warehouse plan uses. Revenue sums
    exact cent-hundredths.

    Emits ``n_name, revenue_ch, n_lines`` per nation with any
    qualifying volume.
    """
    nat = (
        nation.join(
            F.broadcast(
                region.where(F.col("r_name") == region_name).select("r_regionkey")
            ),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_nationkey").alias("sup_nkey"), "n_name")
    cust = customer.select("c_custkey", "c_nationkey")
    ords = orders.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(year_start)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(year_end)))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    )
    joined = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(li, ords.o_orderkey == li.l_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("sup_nkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum("rev_ch").cast("long").alias("revenue_ch"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def large_orders(
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 25,
) -> DataFrame:
    """TPC-H Q18 shape, integer-exact: orders whose TOTAL line
    quantity exceeds ``min_qty`` — the group-then-semijoin pattern
    (aggregate a fact table, filter on the aggregate, pull the
    qualifying parents).

    The quantity rollup is one orderkey-keyed aggregation; the
    qualifying keys then join orders on the SAME key, so AQE reuses
    the partitioning — one logical shuffle end to end. Quantities are
    exact integers via the floor rule.

    Emits ``o_orderkey, o_orderdate, total_qty, n_lines``.
    """
    qty = (
        lineitem.select("l_orderkey", F.expr(QTY_I).alias("qty"))
        .groupBy("l_orderkey")
        .agg(
            F.sum("qty").cast("long").alias("total_qty"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .where(F.col("total_qty") > min_qty)
    )
    return orders.join(qty, orders.o_orderkey == qty.l_orderkey).select(
        "o_orderkey", "o_orderdate", "total_qty", "n_lines"
    )


def promo_revenue_monthly(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """TPC-H Q14 shape, integer-exact: the share of each month's
    discounted revenue that came from PROMO-type parts — the
    fact-to-dimension join on partkey with a conditional-share
    aggregate.

    The part dimension broadcasts (tiny at any SF relative to
    lineitem); revenue sums exact cent-hundredths with the promo
    subset as a conditional sum in the same pass; the share is one
    shared float, cross-multiplied so the only division is final.

    Emits ``month_ts, n_lines, promo_rev_ch, total_rev_ch,
    promo_share``.
    """
    pt = part.select(
        "p_partkey",
        F.col("p_type").startswith("PROMO").alias("is_promo"),
    )
    li = lineitem.select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("month_ts"),
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    )
    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    agg = joined.groupBy("month_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("is_promo"), F.col("rev_ch")).otherwise(0))
        .cast("long")
        .alias("promo_rev_ch"),
        F.sum("rev_ch").cast("long").alias("total_rev_ch"),
    )
    return agg.select(
        "month_ts",
        "n_lines",
        "promo_rev_ch",
        "total_rev_ch",
        F.expr(
            "CASE WHEN total_rev_ch > 0 THEN"
            " round(CAST(promo_rev_ch AS DOUBLE)"
            " / CAST(total_rev_ch AS DOUBLE), 6) END"
        ).alias("promo_share"),
    )


def order_status_priority(orders: DataFrame) -> DataFrame:
    """Order status x priority cross-tab with within-priority shares —
    the operational mix report over the two orders columns nothing
    else reads (o_orderstatus, o_orderpriority), plus exact
    cents-quantized total value per cell.

    One map-side-combinable aggregation; the share is one shared
    float over the per-priority window total.

    Emits ``o_orderpriority, o_orderstatus, n_orders, total_cents,
    n_priority, status_share``.
    """
    from pyspark.sql import Window

    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("total_cents"),
    )
    w = Window.partitionBy("o_orderpriority")
    out = cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_orders",
        "total_cents",
        F.sum("n_orders").over(w).cast("long").alias("n_priority"),
    )
    return out.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_orders",
        "total_cents",
        "n_priority",
        F.expr(
            "round(CAST(n_orders AS DOUBLE) / CAST(n_priority AS DOUBLE), 6)"
        ).alias("status_share"),
    )


def returns_by_month(lineitem: DataFrame) -> DataFrame:
    """Return-flag mix per ship month with cents-exact value impact —
    "how much shipped value came back?", the operations complement to
    the Q1 pricing summary over the same quantized money columns.

    One map-side-combinable aggregation; the within-month share is
    one shared float over the per-month window total.

    Emits ``month_ts, l_returnflag, n_lines, value_c, n_month,
    flag_share``.
    """
    from pyspark.sql import Window

    cells = lineitem.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month_ts"),
        "l_returnflag",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.expr(PRICE_C)).cast("long").alias("value_c"),
    )
    w = Window.partitionBy("month_ts")
    out = cells.select(
        "month_ts",
        "l_returnflag",
        "n_lines",
        "value_c",
        F.sum("n_lines").over(w).cast("long").alias("n_month"),
    )
    return out.select(
        "month_ts",
        "l_returnflag",
        "n_lines",
        "value_c",
        "n_month",
        F.expr(
            "round(CAST(n_lines AS DOUBLE) / CAST(n_month AS DOUBLE), 6)"
        ).alias("flag_share"),
    )


def customer_balance_by_segment(customer: DataFrame) -> DataFrame:
    """Account-balance profile per market segment — the last unread
    customer column (c_acctbal), cents-quantized with the module's
    floor rule. Balances CAN be negative (TPC-H floors at -999.99),
    and floor(x*100 + 0.5) is round-half-up for negatives too —
    identical in both engines, unlike the raw casts.

    One map-side-combinable aggregation; mean is the one shared
    float.

    Emits ``c_mktsegment, n_customers, sum_bal_c, min_bal_c,
    max_bal_c, n_negative, mean_bal_c``.
    """
    cents = "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
    base = customer.select(
        "c_mktsegment", F.expr(cents).alias("bal_c")
    )
    agg = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("bal_c").cast("long").alias("sum_bal_c"),
        F.min("bal_c").cast("long").alias("min_bal_c"),
        F.max("bal_c").cast("long").alias("max_bal_c"),
        F.sum(F.when(F.col("bal_c") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        "sum_bal_c",
        "min_bal_c",
        "max_bal_c",
        "n_negative",
        F.expr(
            "round(CAST(sum_bal_c AS DOUBLE)"
            " / CAST(n_customers AS DOUBLE), 6)"
        ).alias("mean_bal_c"),
    )


def supplier_share_monthly(lineitem: DataFrame) -> DataFrame:
    """Supplier revenue concentration per ship month: how much of the
    month's discounted revenue does the single biggest supplier take?
    The supply-chain single-point-of-failure indicator, computed as a
    deterministic per-month argmax over exact cent-hundredth sums.

    Two aggregations riding one (month, supplier) exchange; the share
    is one shared float.

    Emits ``month_ts, n_suppliers, total_rev_ch, top_suppkey,
    top_rev_ch, top_share``.
    """
    from pyspark.sql import Window

    per_supp = lineitem.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month_ts"),
        "l_suppkey",
    ).agg(
        F.sum(F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H)))
        .cast("long")
        .alias("rev_ch")
    )
    w = Window.partitionBy("month_ts").orderBy(
        F.col("rev_ch").desc(), F.col("l_suppkey").asc()
    )
    w_tot = Window.partitionBy("month_ts")
    ranked = per_supp.select(
        "month_ts",
        "l_suppkey",
        "rev_ch",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_tot).cast("long").alias("n_suppliers"),
        F.sum("rev_ch").over(w_tot).cast("long").alias("total_rev_ch"),
    )
    top = ranked.where(F.col("rn") == 1).select(
        "month_ts",
        "n_suppliers",
        "total_rev_ch",
        F.col("l_suppkey").alias("top_suppkey"),
        F.col("rev_ch").alias("top_rev_ch"),
    )
    return top.select(
        "month_ts",
        "n_suppliers",
        "total_rev_ch",
        "top_suppkey",
        "top_rev_ch",
        F.expr(
            "CASE WHEN total_rev_ch > 0 THEN round(CAST(top_rev_ch"
            " AS DOUBLE) / CAST(total_rev_ch AS DOUBLE), 6) END"
        ).alias("top_share"),
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo_h: int = 5,
    disc_hi_h: int = 7,
    qty_max: int = 24,
) -> DataFrame:
    """TPC-H Q6, integer-exact: the would-be revenue increase from
    dropping small discounts on low-quantity lineitems shipped in one
    year — ``sum(l_extendedprice * l_discount)`` over the selected
    rows, carried as exact cent-hundredths.

    House discipline: quantize FIRST, then filter and sum in int64 —
    the discount/quantity predicates apply to the quantized values
    (``disc_h`` in hundredths, whole-unit ``qty``), so both engines
    select the identical row set with no double-comparison ambiguity.
    Only the ship-date range stays on the raw column, and that is the
    predicate that matters at scale: it lands in parquet
    ``PushedFilters`` (PLANS.md audit) and is the partition-pruning
    key on a date-partitioned 100 TB warehouse — the quantized
    predicates cost one arithmetic op per surviving row. ONE
    map-side-combinable global aggregation, no shuffle beyond the
    final single-partition combine.

    Emits one row ``n_rows, sum_qty, revenue_ch, avg_disc_h``.
    """
    base = lineitem.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(date_to)))
    ).select(
        F.expr(QTY_I).alias("qty"),
        F.expr(PRICE_C).alias("price_c"),
        F.expr(DISC_H).alias("disc_h"),
    ).where(
        (F.col("disc_h") >= F.lit(disc_lo_h))
        & (F.col("disc_h") <= F.lit(disc_hi_h))
        & (F.col("qty") < F.lit(qty_max))
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("qty").cast("long").alias("sum_qty"),
        F.sum(F.col("price_c") * F.col("disc_h"))
        .cast("long")
        .alias("revenue_ch"),
        F.sum("disc_h").cast("long").alias("sum_disc_h"),
    )
    return agg.select(
        "n_rows",
        "sum_qty",
        "revenue_ch",
        F.expr(
            "CASE WHEN n_rows > 0 THEN round(CAST(sum_disc_h AS"
            " DOUBLE) / CAST(n_rows AS DOUBLE), 6) END"
        ).alias("avg_disc_h"),
    )


def returned_revenue_by_customer(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    top_n: int = 20,
) -> DataFrame:
    """TPC-H Q10, integer-exact: which customers returned the most
    revenue in a quarter? Lineitems flagged ``R`` on orders placed in
    the window, discounted revenue summed per customer in exact
    cent-hundredths, top ``top_n`` with the customer and nation
    dimensions attached.

    Scale shape: the order-date filter prunes orders at the scan
    (PushedFilters + partition pruning on a date-partitioned
    warehouse), the return-flag filter prunes lineitem the same way,
    and the surviving orders slice joins lineitem on o_orderkey — the
    ONE big exchange; AQE broadcasts the quarter's orders while small.
    The per-customer aggregate is map-side combinable, and customer +
    nation are broadcast dimensions bolted on AFTER the aggregate (so
    they join |customers-in-window| rows, not |lineitems|). The top-N
    is a deterministic (revenue DESC, custkey ASC) rank — ties cannot
    split across engines.

    Emits ``c_custkey, c_name, n_name, c_mktsegment, n_lines,
    revenue_ch``.
    """
    from pyspark.sql import Window

    o = orders.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("rev_ch").cast("long").alias("revenue_ch"),
        )
    )
    # top-n via orderBy+limit (TakeOrdered — distributed heaps, no
    # single-task rank window; r6, round-5 verdict item 1)
    top = per_cust.orderBy(
        F.col("revenue_ch").desc(), F.col("o_custkey").asc()
    ).limit(top_n)
    dim = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", "c_name", "n_name", "c_mktsegment")
    return (
        top.join(F.broadcast(dim), top["o_custkey"] == dim["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "c_mktsegment",
            "n_lines",
            "revenue_ch",
        )
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q22 reshaped to this schema: customers whose account
    balance beats the average POSITIVE balance but who have never
    placed an order — the "idle capital" report — aggregated per
    market segment.

    Bit-determinism: balances quantize to integer cents, and the
    above-average comparison is the exact int64 cross-multiplication
    ``bal_c * n_pos > sum_pos_c`` (equivalent to ``bal_c >
    sum_pos_c / n_pos`` with no float threshold to disagree on;
    headroom: max |bal_c| ~1e6 cents keeps the product under 2^63 up
    to ~9e12 positive-balance customers). The (sum, count) pair is a
    one-row global aggregate broadcast into the filter; the
    no-orders test is a LEFT join against the distinct buyer keys — at
    scale one co-partitioned exchange of (custkey) pairs, with the
    orders side pre-shrunk by a map-side combinable distinct. The
    report carries BOTH populations (all rich customers and the idle
    subset) so the result is non-vacuous even on a corpus where every
    rich customer happens to have ordered — the idle count is then a
    verified zero, not an empty result.

    Emits ``c_mktsegment, n_rich, n_idle, sum_bal_c, sum_idle_bal_c,
    idle_share``.
    """
    bal = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias(
            "bal_c"
        ),
    )
    pos = bal.where(F.col("bal_c") > 0).agg(
        F.sum("bal_c").cast("long").alias("sum_pos_c"),
        F.count(F.lit(1)).cast("long").alias("n_pos"),
    )
    rich = bal.crossJoin(F.broadcast(pos)).where(
        F.col("bal_c") * F.col("n_pos") > F.col("sum_pos_c")
    )
    buyers = orders.select(
        "o_custkey", F.lit(True).alias("has_orders")
    ).distinct()
    flagged = rich.join(
        buyers, rich["c_custkey"] == buyers["o_custkey"], "left"
    ).select(
        "c_mktsegment",
        "bal_c",
        F.col("has_orders").isNull().alias("is_idle"),
    )
    agg = flagged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_rich"),
        F.sum(F.when(F.col("is_idle"), 1).otherwise(0))
        .cast("long")
        .alias("n_idle"),
        F.sum("bal_c").cast("long").alias("sum_bal_c"),
        F.sum(F.when(F.col("is_idle"), F.col("bal_c")).otherwise(0))
        .cast("long")
        .alias("sum_idle_bal_c"),
    )
    return agg.select(
        "c_mktsegment",
        "n_rich",
        "n_idle",
        "sum_bal_c",
        "sum_idle_bal_c",
        F.expr(
            "round(CAST(n_idle AS DOUBLE) / CAST(n_rich AS DOUBLE), 6)"
        ).alias("idle_share"),
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 generalized: discounted revenue shipped between every
    (supplier nation, customer nation) pair per ship year — the
    full international trade-flow matrix instead of the spec's two
    hard-coded nations.

    Scale shape: the ONE genuinely big exchange is lineitem ⋈ orders
    on orderkey (both sides 10^9+ rows at SF100k — co-partitioned
    hash join; bucketing both tables on orderkey makes it
    exchange-free). supplier, customer and nation are broadcast
    dimensions — supplier bolts onto lineitem BEFORE the big join
    (map-side, no extra exchange) and customer onto the joined rows.
    The final (nation, nation, year) aggregate is map-side combinable
    into at most |nations|^2 x |years| rows. Revenue is exact
    cent-hundredths; the per-line average is an INTEGER quotient
    (the seasonal_profile discipline: at ~1e9 cent-hundredths a float
    division differs across engines in the last ulp and round(x, 6)
    cannot absorb it, while the int64 quotient is bit-identical —
    revenue_ch >= 0 here, so truncation IS floor).

    Emits ``supp_nation, cust_nation, l_year, n_lines, revenue_ch,
    avg_line_rev_ch``.
    """
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("int").alias("l_year"),
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    )
    supp_dim = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_dim = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = orders.join(
        F.broadcast(cust_dim),
        orders["o_custkey"] == cust_dim["c_custkey"],
    ).select("o_orderkey", "cust_nation")
    joined = (
        li.join(F.broadcast(supp_dim), li["l_suppkey"] == supp_dim["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    agg = joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("rev_ch").cast("long").alias("revenue_ch"),
    )
    return agg.select(
        "supp_nation",
        "cust_nation",
        "l_year",
        "n_lines",
        "revenue_ch",
        F.expr("revenue_ch div n_lines")
        .cast("long")
        .alias("avg_line_rev_ch"),
    )


# Q19-style disjunctive (brand, size range, quantity range) triples —
# module-level so the Spark operator and the DuckDB twin are built
# from the SAME table.
DISJUNCT_TRIPLES = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#15", 1, 35, 20, 30),
)


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    triples=DISJUNCT_TRIPLES,
) -> DataFrame:
    """TPC-H Q19: revenue from lineitems matching ANY of three
    (brand, size-range, quantity-range) triples — the classic
    OR-of-ANDs predicate that defeats naive single-range pushdown.

    Scale shape: the predicate splits across the join — the
    part-side disjunction (brand IN (...) plus the size envelope)
    prunes the broadcast BEFORE the join, and the lineitem side keeps
    the quantity envelope [min(lo), max(hi)] as a scan-level
    range (PushedFilters) with the exact per-triple (brand, size,
    qty) conjunction evaluated after the broadcast join — rows
    outside every envelope never leave the scan. Quantity quantizes
    to whole units first (house rule), so the range tests are exact
    int64 in both engines. Aggregated per brand (one map-side
    combinable agg, |brands| rows) rather than the spec's single
    scalar, so each disjunct's contribution is independently
    verifiable.

    Emits ``p_brand, n_lines, sum_qty, revenue_ch``.
    """
    brands = sorted({t[0] for t in triples})
    qty_lo = min(t[3] for t in triples)
    qty_hi = max(t[4] for t in triples)
    # conservative envelope on the RAW column so it reaches parquet
    # row-group stats (floor(x + 0.5) in [lo, hi]  <=>  x in
    # [lo - 0.5, hi + 0.5)); the exact quantized conjunction below
    # re-checks, so the envelope only prunes, never decides
    li = lineitem.where(
        (F.col("l_quantity") >= F.lit(qty_lo - 0.5))
        & (F.col("l_quantity") < F.lit(qty_hi + 0.5))
    ).select(
        "l_partkey",
        F.expr(QTY_I).alias("qty"),
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    ).where((F.col("qty") >= qty_lo) & (F.col("qty") <= qty_hi))
    p = part.where(F.col("p_brand").isin(list(brands))).select(
        "p_partkey", "p_brand", "p_size"
    )
    cond = F.lit(False)
    for brand, size_lo, size_hi, q_lo, q_hi in triples:
        cond = cond | (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= size_lo)
            & (F.col("p_size") <= size_hi)
            & (F.col("qty") >= q_lo)
            & (F.col("qty") <= q_hi)
        )
    joined = li.join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"]
    ).where(cond)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("qty").cast("long").alias("sum_qty"),
        F.sum("rev_ch").cast("long").alias("revenue_ch"),
    )


def fulfillment_by_priority(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Order-fulfillment latency per priority class: whole days from
    order placement to the LAST line shipped — does priority actually
    buy faster fulfillment? Exact day arithmetic end to end.

    Scale shape: one per-order max over lineitem riding the orderkey
    exchange (map-side combinable: 10^12 lines collapse to |orders|
    rows before the join), then a co-partitioned orderkey join
    against the pruned (orderkey, orderdate, priority) projection of
    orders, then ONE |priorities|-row aggregate. Day differences are
    exact int64; the mean is one shared float at day magnitudes
    (far inside round(x, 6)'s ulp headroom — this is ~1e2, not the
    1e11 that forced integer quotients elsewhere).

    Emits ``o_orderpriority, n_orders, sum_days, min_days, max_days,
    mean_days``.
    """
    last_ship = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_shipdate")
    )
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    joined = o.join(
        last_ship, o["o_orderkey"] == last_ship["l_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(F.col("last_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    agg = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("days").cast("long").alias("sum_days"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "sum_days",
        "min_days",
        "max_days",
        F.expr(
            "round(CAST(sum_days AS DOUBLE) / CAST(n_orders AS DOUBLE), 6)"
        ).alias("mean_days"),
    )


def orders_per_customer_hist(orders: DataFrame) -> DataFrame:
    """Customer purchase-frequency distribution: a power-of-two
    histogram of how many orders each ordering customer placed — the
    whale-vs-one-timer shape of the customer base in ~30 rows at any
    scale.

    Two map-side combinable aggregations (orders -> per-customer
    counts on the custkey exchange, counts -> log2 buckets) — the
    same discipline as the latency histograms: the histogram never
    sees raw orders twice. Bucket b holds customers with
    2^b <= n_orders < 2^(b+1) (floor(log2); exact in both engines
    because n_orders is int64 and the bucket is computed by integer
    bit-length, not float log). The share is one shared float.

    Emits ``bucket, lo_orders, n_customers, sum_orders, share``.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    # floor(log2(n)) via string bit-length trick is overkill here:
    # bucket = length of binary representation - 1, exact for int64
    bucketed = per_cust.select(
        (F.length(F.conv(F.col("n_orders"), 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        "n_orders",
    )
    hist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("sum_orders"),
    )
    # total via a global window over the ~30-row histogram — ONE
    # pass; a crossJoin against hist.agg() would re-execute the
    # per-customer subtree
    from pyspark.sql import Window

    hist = hist.withColumn(
        "total_customers",
        F.sum("n_customers").over(Window.partitionBy()).cast("long"),
    )
    return hist.select(
        "bucket",
        F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)").alias(
            "lo_orders"
        ),
        "n_customers",
        "sum_orders",
        F.expr(
            "round(CAST(n_customers AS DOUBLE)"
            " / CAST(total_customers AS DOUBLE), 6)"
        ).alias("share"),
    )


def part_class_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue share by part CLASS — the first word of ``p_type``
    (TPC-H types read "STANDARD PLATED COPPER"; the leading word is
    the quality tier) — the category-mix report a merchandiser reads
    before the per-SKU detail.

    Scale shape: the class extraction is a map-side string split on
    the |parts| dimension, which then broadcasts into lineitem — the
    fact table is scanned once with only 3 columns and never
    shuffled wider than the |classes|-row aggregate; the share comes
    from a global window over that tiny aggregate. Revenue exact
    cent-hundredths; the share is one shared float.

    Emits ``part_class, n_lines, revenue_ch, revenue_share``.
    """
    from pyspark.sql import Window

    cls = part.select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("part_class"),
    )
    li = lineitem.select(
        "l_partkey",
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    )
    agg = (
        li.join(F.broadcast(cls), li["l_partkey"] == cls["p_partkey"])
        .groupBy("part_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("rev_ch").cast("long").alias("revenue_ch"),
        )
    )
    # bounded global window: frame is the |part classes|-row aggregate
    agg = agg.withColumn(
        "total_ch",
        F.sum("revenue_ch").over(Window.partitionBy()).cast("long"),
    )
    return agg.select(
        "part_class",
        "n_lines",
        "revenue_ch",
        F.expr(
            "round(CAST(revenue_ch AS DOUBLE)"
            " / CAST(total_ch AS DOUBLE), 6)"
        ).alias("revenue_share"),
    )


def order_price_audit(
    orders: DataFrame, lineitem: DataFrame, tol_c: int = 0
) -> DataFrame:
    """Referential money audit: does ``o_totalprice`` equal the sum
    of its lines' charges (price * (1-disc) * (1+tax))? The warehouse
    consistency check every ingestion pipeline should run — reported
    per order status as counts and the worst absolute gap, everything
    in exact integer cents.

    The line charge is computed in cent-hundredth-hundredths
    (exact int64) and floor-divided by 10^4 back to cents for the
    comparison — floor on both engines, and o_totalprice quantizes
    through the same ``floor(x*100+0.5)`` as every money column.
    Scale shape: per-order line-sum on the orderkey exchange
    (map-side combinable), co-partitioned join to orders, ONE
    |statuses|-row rollup.

    Emits ``o_orderstatus, n_orders, n_within_tol, max_abs_gap_c,
    sum_abs_gap_c, within_share``.
    """
    line_charge = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(PRICE_C)
            * (F.lit(100) - F.expr(DISC_H))
            * (F.lit(100) + F.expr(TAX_H))
        )
        .cast("long")
        .alias("charge_chh")
    )
    o = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_c"
        ),
    )
    joined = o.join(
        line_charge, o["o_orderkey"] == line_charge["l_orderkey"]
    ).select(
        "o_orderstatus",
        F.abs(
            F.col("total_c") - F.expr("charge_chh div 10000")
        ).alias("abs_gap_c"),
    )
    agg = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("abs_gap_c") <= tol_c, 1).otherwise(0))
        .cast("long")
        .alias("n_within_tol"),
        F.max("abs_gap_c").cast("long").alias("max_abs_gap_c"),
        F.sum("abs_gap_c").cast("long").alias("sum_abs_gap_c"),
    )
    return agg.select(
        "o_orderstatus",
        "n_orders",
        "n_within_tol",
        "max_abs_gap_c",
        "sum_abs_gap_c",
        F.expr(
            "round(CAST(n_within_tol AS DOUBLE)"
            " / CAST(n_orders AS DOUBLE), 6)"
        ).alias("within_share"),
    )


def region_revenue_mix(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue mix by SUPPLIER region: where does the supply-side
    money flow? The 5-row board slide above tpch_q7_trade's
    nation-pair matrix.

    region -> nation -> supplier collapse into one tiny broadcast
    dimension bolted onto the lineitem scan map-side — the fact
    table never shuffles wider than the |regions|-row aggregate; the
    share comes from a global window over that aggregate. Revenue
    exact cent-hundredths; the share is one shared float.

    Emits ``r_name, n_lines, revenue_ch, revenue_share``.
    """
    from pyspark.sql import Window

    nat = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "r_name")
    supp = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", "r_name")
    li = lineitem.select(
        "l_suppkey",
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias("rev_ch"),
    )
    agg = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("rev_ch").cast("long").alias("revenue_ch"),
        )
    )
    # bounded global window: frame is the |regions|-row aggregate
    agg = agg.withColumn(
        "total_ch",
        F.sum("revenue_ch").over(Window.partitionBy()).cast("long"),
    )
    return agg.select(
        "r_name",
        "n_lines",
        "revenue_ch",
        F.expr(
            "round(CAST(revenue_ch AS DOUBLE)"
            " / CAST(total_ch AS DOUBLE), 6)"
        ).alias("revenue_share"),
    )


def orders_month_mix(orders: DataFrame) -> DataFrame:
    """Order seasonality: the month-of-year mix of order volume and
    header value across all years — does December actually spike?

    ONE map-side combinable aggregation into 12 rows; the share
    comes from a global window over those 12. Header prices quantize
    to exact cents; the share is one shared float.

    Emits ``month, n_orders, sum_total_c, order_share``.
    """
    from pyspark.sql import Window

    agg = orders.groupBy(
        F.month("o_orderdate").cast("int").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("sum_total_c"),
    )
    # bounded global window: frame is the calendar-bucket aggregate
    # (months of the horizon / 7 weekdays), not the order table
    agg = agg.withColumn(
        "all_orders",
        F.sum("n_orders").over(Window.partitionBy()).cast("long"),
    )
    return agg.select(
        "month",
        "n_orders",
        "sum_total_c",
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " / CAST(all_orders AS DOUBLE), 6)"
        ).alias("order_share"),
    )


def ship_delay_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Per-supplier-nation shipping delay: whole days from order
    placement to each line's ship date — which supply bases are
    slow? The logistics companion to tpch_q7_trade's revenue matrix.

    The big lineitem ⋈ orders orderkey join (co-partitioned; the
    orders side pruned to 2 columns), supplier+nation broadcast on
    map-side, ONE |nations|-row aggregate. Day diffs exact int64;
    the mean is one shared float at day magnitudes.

    Emits ``supp_nation, n_lines, sum_days, min_days, max_days,
    mean_days``.
    """
    sd = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    o = orders.select("o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(sd), li["l_suppkey"] == sd["s_suppkey"])
        .select(
            "supp_nation",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("long")
            .alias("days"),
        )
    )
    agg = joined.groupBy("supp_nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("days").cast("long").alias("sum_days"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
    )
    return agg.select(
        "supp_nation",
        "n_lines",
        "sum_days",
        "min_days",
        "max_days",
        F.expr(
            "round(CAST(sum_days AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)"
        ).alias("mean_days"),
    )


def order_value_by_priority(orders: DataFrame) -> DataFrame:
    """Order header value profile per priority class in exact cents —
    do urgent orders actually carry more money?

    ONE map-side combinable aggregation into |priorities| rows; the
    mean is one shared float at cent magnitudes.

    Emits ``o_orderpriority, n_orders, sum_total_c, min_total_c,
    max_total_c, mean_total_c``.
    """
    base = orders.select(
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_c"
        ),
    )
    agg = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("total_c").cast("long").alias("sum_total_c"),
        F.min("total_c").cast("long").alias("min_total_c"),
        F.max("total_c").cast("long").alias("max_total_c"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "sum_total_c",
        "min_total_c",
        "max_total_c",
        F.expr(
            "round(CAST(sum_total_c AS DOUBLE)"
            " / CAST(n_orders AS DOUBLE), 6)"
        ).alias("mean_total_c"),
    )


def top_order_monthly(orders: DataFrame) -> DataFrame:
    """The single biggest order of each month (exact cents,
    deterministic tie to the lower orderkey) and its share of the
    month's header value — the whale-watch report.

    ONE (month) aggregate for totals plus a row_number argmax, both
    riding one month exchange. Cents exact int64; the share is one
    shared float.

    Emits ``month_ts, o_orderkey, top_total_c, n_orders,
    month_total_c, top_share``.
    """
    from pyspark.sql import Window

    base = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts"),
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_c"
        ),
    )
    w = Window.partitionBy("month_ts").orderBy(
        F.col("total_c").desc(), F.col("o_orderkey").asc()
    )
    wm = Window.partitionBy("month_ts")
    ranked = base.select(
        "month_ts",
        "o_orderkey",
        "total_c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wm).cast("long").alias("n_orders"),
        F.sum("total_c").over(wm).cast("long").alias("month_total_c"),
    ).where(F.col("rn") == 1)
    return ranked.select(
        "month_ts",
        "o_orderkey",
        F.col("total_c").alias("top_total_c"),
        "n_orders",
        "month_total_c",
        F.expr(
            "CASE WHEN month_total_c > 0 THEN round(CAST(total_c"
            " AS DOUBLE) / CAST(month_total_c AS DOUBLE), 6) END"
        ).alias("top_share"),
    )


def order_interarrival_hist(orders: DataFrame) -> DataFrame:
    """Reorder-cadence histogram: day gaps between each customer's
    consecutive orders, bucketed power-of-two on ``gap + 1`` (so the
    same-day gap of 0 lands in bucket 0 whose floor is 0 days) —
    how often do repeat customers actually come back?

    One lag window on the custkey exchange over the 3-column order
    projection, then a ~15-row histogram with its share from a
    global window. Gaps exact int64 days.

    Emits ``bucket, lo_gap_days, n_gaps, sum_gap_days, share``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        )
        .cast("long")
        .alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    bucketed = gaps.select(
        (F.length(F.conv(F.col("gap_days") + 1, 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        "gap_days",
    )
    hist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_days").cast("long").alias("sum_gap_days"),
    )
    # bounded global window: frame is the gap-day bucket histogram
    # (<= 64 power-of-two rows), not the order table
    hist = hist.withColumn(
        "total_gaps",
        F.sum("n_gaps").over(Window.partitionBy()).cast("long"),
    )
    return hist.select(
        "bucket",
        (F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)") - F.lit(1))
        .cast("long")
        .alias("lo_gap_days"),
        "n_gaps",
        "sum_gap_days",
        F.expr(
            "round(CAST(n_gaps AS DOUBLE) / CAST(total_gaps AS DOUBLE), 6)"
        ).alias("share"),
    )


def supplier_balance_by_nation(
    supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Supplier account-balance profile per nation in exact signed
    cents (round-half-up via the floor rule, negatives included) —
    the supply-side credit-exposure report.

    Nation broadcasts into the supplier scan; ONE |nations|-row
    aggregate; the mean is one shared float at cent magnitudes.

    Emits ``n_name, n_suppliers, sum_bal_c, min_bal_c, max_bal_c,
    n_negative, mean_bal_c``.
    """
    base = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select(
        "n_name",
        F.expr("CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)").alias(
            "bal_c"
        ),
    )
    agg = base.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("bal_c").cast("long").alias("sum_bal_c"),
        F.min("bal_c").cast("long").alias("min_bal_c"),
        F.max("bal_c").cast("long").alias("max_bal_c"),
        F.sum(F.when(F.col("bal_c") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
    )
    return agg.select(
        "n_name",
        "n_suppliers",
        "sum_bal_c",
        "min_bal_c",
        "max_bal_c",
        "n_negative",
        F.expr(
            "round(CAST(sum_bal_c AS DOUBLE)"
            " / CAST(n_suppliers AS DOUBLE), 6)"
        ).alias("mean_bal_c"),
    )


def priority_segment_mix(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """The (market segment, order priority) cross-tab with the
    independence lift — do BUILDING customers really file more
    URGENT orders, or is that the base rate? The relational sibling
    of the (lang, source) matrix.

    Customer broadcasts into orders (pruned to 2 columns each), ONE
    map-side combinable aggregate into |segments| x |priorities|
    rows, the three marginals as window sums over that tiny
    cross-tab. Counts exact int64; the lift is one shared float over
    four exact ints.

    Emits ``c_mktsegment, o_orderpriority, n_orders, seg_total,
    pri_total, corpus_total, lift``.
    """
    from pyspark.sql import Window

    j = orders.select("o_custkey", "o_orderpriority").join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    cell = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    cell = cell.select(
        "c_mktsegment",
        "o_orderpriority",
        "n_orders",
        F.sum("n_orders")
        .over(Window.partitionBy("c_mktsegment"))
        .cast("long")
        .alias("seg_total"),
        F.sum("n_orders")
        .over(Window.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("pri_total"),
        # bounded global window: frame is the |segment| x |priority|
        # contingency aggregate (tens of rows at any SF)
        F.sum("n_orders")
        .over(Window.partitionBy())
        .cast("long")
        .alias("corpus_total"),
    )
    return cell.select(
        "c_mktsegment",
        "o_orderpriority",
        "n_orders",
        "seg_total",
        "pri_total",
        "corpus_total",
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " * CAST(corpus_total AS DOUBLE)"
            " / (CAST(seg_total AS DOUBLE)"
            " * CAST(pri_total AS DOUBLE)), 6)"
        ).alias("lift"),
    )


def lines_per_order_hist(lineitem: DataFrame) -> DataFrame:
    """Join-skew audit for the orderkey exchange: the power-of-two
    histogram of lineitem fan-out per order, plus the single heaviest
    key's share — the number that says whether the big lineitem ⋈
    orders join needs salting (a hot orderkey is exactly what AQE's
    skew split watches for).

    One map-side combinable per-order count, a ~10-row histogram,
    and the global max/total as window sums over it. Exact int64.

    Emits ``bucket, lo_lines, n_orders, sum_lines, max_lines,
    top_key_share``.
    """
    from pyspark.sql import Window

    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    bucketed = per_order.select(
        (F.length(F.conv(F.col("n_lines"), 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        "n_lines",
    )
    hist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("n_lines").cast("long").alias("sum_lines"),
        F.max("n_lines").cast("long").alias("bucket_max"),
    )
    # bounded global window: frame is the lines-per-order bucket
    # histogram (<= 64 power-of-two rows)
    w = Window.partitionBy()
    hist = hist.withColumn(
        "max_lines", F.max("bucket_max").over(w).cast("long")
    ).withColumn("total_lines", F.sum("sum_lines").over(w).cast("long"))
    return hist.select(
        "bucket",
        F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)").alias("lo_lines"),
        "n_orders",
        "sum_lines",
        "max_lines",
        F.expr(
            "round(CAST(max_lines AS DOUBLE)"
            " / CAST(total_lines AS DOUBLE), 6)"
        ).alias("top_key_share"),
    )


def retail_markup_by_class(
    lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """List-vs-street price per part class: the catalog retail price
    against what lineitems actually sold at (pre-discount), in exact
    cents — is the LARGE class systematically discounted off list?

    The part dimension carries both the class and the retail cents
    and broadcasts into the lineitem scan; ONE |classes|-row
    aggregate. The markup ratio is one shared float over two exact
    sums (sold units weighted by lines, retail by its own line's
    part — the same weighting, so the ratio is apples-to-apples).

    Emits ``part_class, n_lines, sum_sold_c, sum_retail_c,
    street_to_list``.
    """
    cls = part.select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("part_class"),
        F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "retail_c"
        ),
    )
    li = lineitem.select("l_partkey", F.expr(PRICE_C).alias("sold_c"))
    j = li.join(F.broadcast(cls), li["l_partkey"] == cls["p_partkey"])
    agg = j.groupBy("part_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("sold_c").cast("long").alias("sum_sold_c"),
        F.sum("retail_c").cast("long").alias("sum_retail_c"),
    )
    return agg.select(
        "part_class",
        "n_lines",
        "sum_sold_c",
        "sum_retail_c",
        F.expr(
            "CASE WHEN sum_retail_c > 0 THEN round(CAST(sum_sold_c"
            " AS DOUBLE) / CAST(sum_retail_c AS DOUBLE), 6) END"
        ).alias("street_to_list"),
    )


def orders_dow_mix(orders: DataFrame) -> DataFrame:
    """Order volume and header value by day of week (Spark
    ``dayofweek``: 1=Sunday..7=Saturday; the DuckDB twin maps
    ``dayofweek+1``) — the weekly business rhythm in 7 rows.

    ONE map-side combinable aggregate; the share from a global
    window over the 7 rows. Exact cents.

    Emits ``dow, n_orders, sum_total_c, order_share``.
    """
    from pyspark.sql import Window

    agg = orders.groupBy(
        F.dayofweek("o_orderdate").cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("sum_total_c"),
    )
    # bounded global window: frame is the calendar-bucket aggregate
    # (months of the horizon / 7 weekdays), not the order table
    agg = agg.withColumn(
        "all_orders",
        F.sum("n_orders").over(Window.partitionBy()).cast("long"),
    )
    return agg.select(
        "dow",
        "n_orders",
        "sum_total_c",
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " / CAST(all_orders AS DOUBLE), 6)"
        ).alias("order_share"),
    )


def value_vs_speed_deciles(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Does money buy speed? Orders ranked into exact header-value
    deciles, each decile reporting its fulfillment profile (days to
    the LAST line shipped) — the cross of order_value_by_priority
    and fulfillment_by_priority that neither shows alone.

    Per-order last-ship collapses lineitem on the orderkey exchange
    before the join; the decile is integer arithmetic over the
    row_number rank ((rk-1)*10 div n, ties to the lower orderkey);
    the final aggregate is 10 rows. Exact int64; the mean is one
    shared float at day magnitudes.

    Emits ``decile, n_orders, sum_total_c, sum_days, min_days,
    max_days, mean_days``.
    """
    from pyspark.sql import Window

    last_ship = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_shipdate")
    )
    o = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_c"
        ),
    )
    j = o.join(
        last_ship, o["o_orderkey"] == last_ship["l_orderkey"]
    ).select(
        "o_orderkey",
        "total_c",
        F.datediff(F.col("last_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    # distributed two-phase global rank (range partition + bounded
    # prefix-sum offsets) — no single-task sort over |orders|; same rk
    # and n values as the old unpartitioned window (r6, verdict item 1)
    from aroma_spark.operators.ranking import with_global_rank

    ranked = with_global_rank(
        j.select("o_orderkey", "total_c", "days"),
        [F.col("total_c").asc(), F.col("o_orderkey").asc()],
        rank_col="rk",
        total_col="n",
    ).select("total_c", "days", "rk", "n")
    bucketed = ranked.select(
        F.expr("CAST(((rk - 1) * 10) div n AS INT)").alias("decile"),
        "total_c",
        "days",
    )
    agg = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("total_c").cast("long").alias("sum_total_c"),
        F.sum("days").cast("long").alias("sum_days"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
    )
    return agg.select(
        "decile",
        "n_orders",
        "sum_total_c",
        "sum_days",
        "min_days",
        "max_days",
        F.expr(
            "round(CAST(sum_days AS DOUBLE) / CAST(n_orders AS DOUBLE), 6)"
        ).alias("mean_days"),
    )


def orders_per_customer_by_region(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Ordering intensity by customer region: how many orders does
    the average ordering customer place, per region? The demand-side
    companion to region_revenue_mix's supply-side money flow.

    region -> nation collapse broadcasts into customer, customer
    broadcasts into the per-customer order counts (ONE custkey
    exchange); the final aggregate is |regions| rows. Exact int64;
    the mean is one shared float.

    Emits ``r_name, n_customers, n_orders, orders_per_customer``.
    """
    nat = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "r_name")
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", "r_name")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    j = per_cust.join(
        F.broadcast(cust), per_cust["o_custkey"] == cust["c_custkey"]
    )
    agg = j.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("n_orders"),
    )
    return agg.select(
        "r_name",
        "n_customers",
        "n_orders",
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " / CAST(n_customers AS DOUBLE), 6)"
        ).alias("orders_per_customer"),
    )


def discount_hist(lineitem: DataFrame) -> DataFrame:
    """Revenue impact by discount level: for every discount
    hundredth (0..~10), the line count, base revenue and the exact
    cent-hundredths given away — where the margin actually leaks.

    Quantize-first (house rule), ONE map-side combinable aggregate
    into ~11 rows; the given-away share is one shared float.

    Emits ``disc_h, n_lines, base_c, discount_ch, discount_share``.
    """
    from pyspark.sql import Window

    base = lineitem.select(
        F.expr(DISC_H).alias("disc_h"),
        F.expr(PRICE_C).alias("price_c"),
    )
    agg = base.groupBy("disc_h").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("price_c").cast("long").alias("base_c"),
        F.sum(F.col("price_c") * F.col("disc_h"))
        .cast("long")
        .alias("discount_ch"),
    )
    # bounded global window: frame is the |distinct disc_h|-row
    # aggregate (discounts are hundredths in [0,1] -> <= 101 rows)
    agg = agg.withColumn(
        "total_discount_ch",
        F.sum("discount_ch").over(Window.partitionBy()).cast("long"),
    )
    return agg.select(
        "disc_h",
        "n_lines",
        "base_c",
        "discount_ch",
        F.expr(
            "CASE WHEN total_discount_ch > 0 THEN"
            " round(CAST(discount_ch AS DOUBLE)"
            " / CAST(total_discount_ch AS DOUBLE), 6) END"
        ).alias("discount_share"),
    )


def order_backlog_daily(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Open-order backlog over time by EVENT SWEEP: +1 the day an
    order is placed, -1 the day its last line ships, cumulative-sum
    over days — the classic O(|days|) interval-count that never
    explodes an order into its covered days (a month-long order
    would otherwise fan out 30x; at 10^12 orders that is the
    difference between a |days|-row window and a join the size of
    the warehouse).

    An order is counted in the backlog from its order day INCLUSIVE
    to its ship day EXCLUSIVE. Per-order last-ship collapses
    lineitem on the orderkey exchange; the +1/-1 deltas aggregate
    map-side to |days| rows; ONE ordered window does the cumsum.
    Exact int64 everywhere.

    Emits ``day_ts, n_placed, n_shipped, backlog``.
    """
    from pyspark.sql import Window

    last_ship = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_shipdate")
    )
    o = orders.select("o_orderkey", "o_orderdate")
    j = o.join(last_ship, o["o_orderkey"] == last_ship["l_orderkey"])
    starts = j.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_placed"))
    ends = j.groupBy(
        F.date_trunc("day", F.col("last_shipdate")).alias("day_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_shipped"))
    merged = starts.join(ends, "day_ts", "full_outer").select(
        "day_ts",
        F.coalesce(F.col("n_placed"), F.lit(0))
        .cast("long")
        .alias("n_placed"),
        F.coalesce(F.col("n_shipped"), F.lit(0))
        .cast("long")
        .alias("n_shipped"),
    )
    w = (
        Window.orderBy("day_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return merged.select(
        "day_ts",
        "n_placed",
        "n_shipped",
        F.sum(F.col("n_placed") - F.col("n_shipped"))
        .over(w)
        .cast("long")
        .alias("backlog"),
    )


def priority_mix_monthly(orders: DataFrame) -> DataFrame:
    """Order-priority mix per month with month-over-month drift per
    priority (calendar chain break, the dod_growth discipline) — is
    the urgent share creeping up?

    ONE map-side combinable (month, priority) aggregate; month
    totals and the lag run over that |months| x |priorities| frame.
    Counts exact int64; share and drift re-derive inside single
    float expressions over exact counts.

    Emits ``month_ts, o_orderpriority, n_orders, month_orders,
    share, drift``.
    """
    from pyspark.sql import Window

    cell = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    cell = cell.withColumn(
        "month_orders",
        F.sum("n_orders")
        .over(Window.partitionBy("month_ts"))
        .cast("long"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month_ts")
    chain = F.lag("month_ts").over(w) == F.col("month_ts") - F.expr(
        "INTERVAL 1 MONTH"
    )
    cell = cell.select(
        "month_ts",
        "o_orderpriority",
        "n_orders",
        "month_orders",
        F.when(chain, F.lag("n_orders").over(w))
        .cast("long")
        .alias("prev_n"),
        F.when(chain, F.lag("month_orders").over(w))
        .cast("long")
        .alias("prev_month_orders"),
    )
    return cell.select(
        "month_ts",
        "o_orderpriority",
        "n_orders",
        "month_orders",
        "prev_n",
        "prev_month_orders",
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " / CAST(month_orders AS DOUBLE), 6)"
        ).alias("share"),
        F.expr(
            "CASE WHEN prev_month_orders > 0 THEN"
            " round(CAST(n_orders AS DOUBLE)"
            " / CAST(month_orders AS DOUBLE)"
            " - CAST(prev_n AS DOUBLE)"
            " / CAST(prev_month_orders AS DOUBLE), 6) END"
        ).alias("drift"),
    )


def late_order_share(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 20
) -> DataFrame:
    """TPC-H Q4 shape: per priority class, the count and share of
    orders with at least one line shipped more than ``late_days``
    whole days after order placement — the EXISTS semi-join no other
    relational query here exercises (the spec's Q4 tests
    commit-vs-receipt dates; this corpus carries neither, so lateness
    is ship-vs-order against one fixed threshold for every row).

    Scale shape: lineitem pruned to (orderkey, shipdate) and LEFT
    SEMI joined into orders on orderkey with the date predicate
    inside the join condition — the semi-join deduplicates during
    the join (no distinct pass over lineitem, at most one output row
    per order however many lines are late), and only order headers
    flow out. The |priorities|-row denominator aggregates the same
    pruned orders projection; the two tiny results recombine via
    broadcast. Day diffs exact int64.

    Emits ``o_orderpriority, n_orders, n_late_orders, late_share``.
    """
    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (
            F.datediff(li["l_shipdate"], o["o_orderdate"])
            > F.lit(late_days)
        ),
        "left_semi",
    )
    n_late = late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_late_orders")
    )
    n_all = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    joined = n_all.join(
        F.broadcast(n_late), "o_orderpriority", "left"
    ).select(
        "o_orderpriority",
        "n_orders",
        F.coalesce(F.col("n_late_orders"), F.lit(0))
        .cast("long")
        .alias("n_late_orders"),
    )
    return joined.select(
        "o_orderpriority",
        "n_orders",
        "n_late_orders",
        F.expr(
            "round(CAST(n_late_orders AS DOUBLE)"
            " / CAST(n_orders AS DOUBLE), 6)"
        ).alias("late_share"),
    )


def sole_late_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    late_days: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: per supplier nation, the (supplier, order)
    pairs where that supplier shipped late in a MULTI-supplier order
    and no co-supplier did — the spec's "waiting suppliers" blame
    query, whose EXISTS + NOT-EXISTS pair of correlated subqueries is
    re-expressed Spark-first as per-(order, supplier) then per-order
    aggregation (one shuffle each, both on orderkey, so the second is
    co-partitioned with the first) instead of two extra self-joins of
    lineitem. Lateness is ship-vs-order beyond ``late_days`` whole
    days, as in :func:`late_order_share`.

    Scale shape: lineitem ⋈ orders on orderkey (the one big
    exchange) flags each line; (orderkey, suppkey) max-late then
    orderkey counts reuse that partitioning; only sole-late pairs —
    a vanishing fraction — reach the broadcast supplier→nation
    collapse. All counts exact int64.

    Emits ``supp_nation, numwait, n_suppliers``.
    """
    o = orders.select("o_orderkey", "o_orderdate")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    flagged = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            > F.lit(late_days)
        )
        .cast("int")
        .alias("late"),
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_supps"),
        F.sum("late").cast("long").alias("n_late_supps"),
    )
    blame = per_supp.where(F.col("late") == 1).join(
        per_order.where(
            (F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1)
        ),
        "l_orderkey",
    )
    sn = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    return (
        blame.join(F.broadcast(sn), blame["l_suppkey"] == sn["s_suppkey"])
        .groupBy("supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numwait"),
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        )
    )


def revenue_pacing_monthly(orders: DataFrame) -> DataFrame:
    """Month-to-date revenue pacing: per (month, order day), the
    day's order cents, the running month-to-date total, and the
    share of the month's final revenue booked so far — the curve a
    finance review reads on day 12 to ask "are we pacing ahead of or
    behind a normal month?". Pacing differences across months pop
    immediately because the share axis is normalized to [0, 1].

    Days without orders simply don't appear (both engines agree);
    the MTD total is a cumulative window over each month's day rows
    — |days| rows, never the order table — and the month total is
    the same window unbounded. All int64 cents until the one share
    float.

    Emits ``month_ts, day_ts, day_cents, mtd_cents, month_cents,
    pace``.
    """
    from pyspark.sql import Window

    daily = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts"),
        F.date_trunc("day", F.col("o_orderdate")).alias("day_ts"),
    ).agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("day_cents")
    )
    w_mtd = (
        Window.partitionBy("month_ts")
        .orderBy("day_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("month_ts")
    cum = daily.select(
        "month_ts",
        "day_ts",
        "day_cents",
        F.sum("day_cents").over(w_mtd).cast("long").alias("mtd_cents"),
        F.sum("day_cents").over(w_all).cast("long").alias("month_cents"),
    )
    return cum.select(
        "month_ts",
        "day_ts",
        "day_cents",
        "mtd_cents",
        "month_cents",
        F.expr(
            "round(CAST(mtd_cents AS DOUBLE)"
            " / CAST(month_cents AS DOUBLE), 6)"
        ).alias("pace"),
    )


def order_sla_monthly(
    orders: DataFrame, lineitem: DataFrame, sla_days: int = 20
) -> DataFrame:
    """Monthly fulfillment-SLA attainment: per order month, the share
    of orders whose LAST line shipped within ``sla_days`` whole days
    of placement — the operations trend line behind
    :func:`fulfillment_by_priority`'s static profile ("are we getting
    faster or slower, month over month?").

    Per-order last-ship is one map-side combinable max on orderkey;
    the orders join is the usual co-partitioned orderkey exchange;
    |months| output rows. Day diffs exact int64; attainment is one
    shared float.

    Emits ``month_ts, n_orders, n_within_sla, sla_share,
    worst_days``.
    """
    ls = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    j = orders.select("o_orderkey", "o_orderdate").join(
        ls, orders["o_orderkey"] == ls["l_orderkey"]
    ).select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts"),
        F.datediff(F.col("last_ship"), F.col("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    agg = j.groupBy("month_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(F.col("days") <= F.lit(int(sla_days)), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_within_sla"),
        F.max("days").cast("long").alias("worst_days"),
    )
    return agg.select(
        "month_ts",
        "n_orders",
        "n_within_sla",
        F.expr(
            "round(CAST(n_within_sla AS DOUBLE)"
            " / CAST(n_orders AS DOUBLE), 6)"
        ).alias("sla_share"),
        "worst_days",
    )


def rolling_median_revenue(
    orders: DataFrame, window_days: int = 7
) -> DataFrame:
    """Exact trailing-``window_days``-day MEDIAN of daily order
    revenue — the robust topline trend a mean-based rolling window
    (rolling_revenue_7d) lets one whale day distort. Median = the
    type-1 lower median in integer cents under the deterministic
    (cents, day) order, so both engines pick the identical day's
    value.

    The corpus collapses to |days| rows FIRST (one map-side
    combinable aggregate); the trailing frame is then a bounded
    range self-join of that tiny day table against itself (fan-out
    <= window_days per row, never the order table), ranked inside
    each window. All int64 until nothing — the median is an exact
    cents value.

    Emits ``day_ts, n_days, med_cents``.
    """
    from pyspark.sql import Window

    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day_ts")
    ).agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("cents")
    )
    a = daily.select(F.col("day_ts").alias("end_ts"))
    b = daily.select(
        F.col("day_ts").alias("b_ts"), F.col("cents").alias("b_cents")
    )
    pairs = a.join(
        b,
        (F.col("b_ts") <= F.col("end_ts"))
        & (
            F.col("b_ts")
            > F.col("end_ts") - F.expr(f"INTERVAL {int(window_days)} DAYS")
        ),
    )
    w = Window.partitionBy("end_ts").orderBy("b_cents", "b_ts")
    ranked = pairs.select(
        "end_ts",
        "b_cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("end_ts"))
        .cast("long")
        .alias("n_days"),
    )
    return ranked.where(
        F.col("rk") == F.expr("(n_days + 1) div 2")
    ).select(
        F.col("end_ts").alias("day_ts"),
        "n_days",
        F.col("b_cents").alias("med_cents"),
    )


def qty_discount_curve(lineitem: DataFrame) -> DataFrame:
    """The volume-discount curve: per whole-unit order quantity, how
    deep does the given discount actually run, and how much revenue
    rides each quantity level — the pricing-policy audit ("do big
    orders really get the negotiated break?") that discount_hist's
    marginal histogram cannot answer because it integrates out
    quantity.

    ONE map-side combinable aggregation over the quantized columns
    (house floor rules: quantity to whole units, discount to integer
    hundredths, price to cents); |quantities| output rows. The mean
    discount is the one shared float.

    Emits ``qty, n_lines, mean_disc_h, revenue_ch``.
    """
    base = lineitem.select(
        F.expr(QTY_I).alias("qty"),
        F.expr(DISC_H).alias("disc_h"),
        (F.expr(PRICE_C) * (F.lit(100) - F.expr(DISC_H))).alias(
            "rev_ch"
        ),
    )
    agg = base.groupBy("qty").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("disc_h").cast("long").alias("sum_disc_h"),
        F.sum("rev_ch").cast("long").alias("revenue_ch"),
    )
    return agg.select(
        "qty",
        "n_lines",
        F.expr(
            "round(CAST(sum_disc_h AS DOUBLE)"
            " / CAST(n_lines AS DOUBLE), 6)"
        ).alias("mean_disc_h"),
        "revenue_ch",
    )


def cust_trend_sign(orders: DataFrame, min_orders: int = 3) -> DataFrame:
    """Customer spend-trajectory census: for every customer with at
    least ``min_orders`` orders, the SIGN of the OLS slope of order
    value over order sequence — are individual customers spending
    more, less, or flat over their own history? The per-entity trend
    question the corpus-level revenue trends average away.

    The whole census is integer-exact: the OLS slope's sign equals
    the sign of ``n*Σxy − Σx*Σy`` (the denominator is positive), so
    no division, no float, no tie ambiguity — both engines classify
    every customer identically. x = the customer's order sequence
    index under the deterministic (orderdate, orderkey) order; y =
    exact cents.

    Scale shape: one custkey window for the sequence index, one
    custkey aggregate for the sufficient statistics (both on the
    same exchange), then a 3-row census. int64 headroom: n*Σxy <=
    orders_per_cust^2 * max_cents * n — safe past 10^4 orders per
    customer at 10^7-cent orders.

    Emits ``trend_sign, n_customers, share``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("x"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "y"
        ),
    )
    per = (
        seq.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
        .where(F.col("n") >= F.lit(int(min_orders)))
    )
    signed = per.select(
        F.expr(
            "CASE WHEN n * sxy - sx * sy > 0 THEN 1"
            " WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END"
        )
        .cast("int")
        .alias("trend_sign")
    )
    hist = signed.groupBy("trend_sign").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return hist.select(
        "trend_sign",
        "n_customers",
        F.expr(
            "round(CAST(n_customers AS DOUBLE)"
            " / CAST(sum(n_customers) OVER () AS DOUBLE), 6)"
        ).alias("share"),
    )


def supplier_breadth_hist(lineitem: DataFrame) -> DataFrame:
    """Supplier catalog breadth: how many DISTINCT parts each
    supplier actually ships, histogrammed into power-of-two buckets
    — the supply-base diversification census (a bucket-0/1-heavy
    base is single-SKU specialists; heavy high buckets mean broad
    generalists carry the catalog).

    The interesting scale step is the (suppkey, partkey) DISTINCT
    reduction — it collapses 10^12 lines to the bipartite edge set
    map-side before anything counts — followed by a per-supplier
    count riding the same suppkey exchange and an ~log2(|parts|)-row
    histogram. All int64.

    Emits ``bucket, lo_parts, n_suppliers, sum_parts, share``.
    """
    edges = lineitem.select("l_suppkey", "l_partkey").distinct()
    per = edges.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    hist = per.groupBy(
        F.expr("CAST(length(bin(n_parts)) - 1 AS INT)").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("n_parts").cast("long").alias("sum_parts"),
    )
    return hist.select(
        "bucket",
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), bucket) AS BIGINT)")
        .alias("lo_parts"),
        "n_suppliers",
        "sum_parts",
        F.expr(
            "round(CAST(n_suppliers AS DOUBLE)"
            " / CAST(sum(n_suppliers) OVER () AS DOUBLE), 6)"
        ).alias("share"),
    )


def brand_price_spread(part: DataFrame) -> DataFrame:
    """Per-brand retail-price dispersion in exact cents: count, min,
    max and the type-1 median under the deterministic
    (cents, partkey) order — which brands price tightly and which
    span the whole catalog? The part-table companion of the class
    markup report.

    One brand window for the rank, one |brands|-row rollup on the
    same exchange. All int64.

    Emits ``p_brand, n_parts, min_cents, med_cents, max_cents``.
    """
    from pyspark.sql import Window

    base = part.select(
        "p_brand",
        F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        "p_partkey",
    )
    w = Window.partitionBy("p_brand").orderBy("cents", "p_partkey")
    ranked = base.select(
        "p_brand",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("p_brand"))
        .cast("long")
        .alias("n_parts"),
    )
    med = ranked.where(F.col("rk") == F.expr("(n_parts + 1) div 2")).select(
        "p_brand", F.col("cents").alias("med_cents")
    )
    agg = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    return agg.join(F.broadcast(med), "p_brand").select(
        "p_brand", "n_parts", "min_cents", "med_cents", "max_cents"
    )


def revenue_seasonal_index(orders: DataFrame) -> DataFrame:
    """Month-of-year revenue seasonality: each calendar month's mean
    monthly revenue against the overall monthly mean — the index a
    demand forecast deseasonalizes with (1.0 = an average month;
    1.3 = a consistently heavy month). Pools every year the corpus
    spans, so one anomalous December doesn't masquerade as
    seasonality.

    Monthly totals first (|month_ts| rows), then a 12-row rollup
    and two window totals over those 12 rows. Cents exact int64; the
    index divides two exact means in one float expression.

    Emits ``month_of_year, n_months, sum_cents, seasonal_idx``.
    """
    from pyspark.sql import Window

    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts")
    ).agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("cents")
    )
    moy = monthly.groupBy(
        F.month(F.col("month_ts")).cast("int").alias("month_of_year")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    # bounded global window: frame is the 12-row month-of-year aggregate
    w = Window.partitionBy()
    tot = moy.select(
        "month_of_year",
        "n_months",
        "sum_cents",
        F.sum("sum_cents").over(w).cast("long").alias("total_cents"),
        F.sum("n_months").over(w).cast("long").alias("total_months"),
    )
    return tot.select(
        "month_of_year",
        "n_months",
        "sum_cents",
        F.expr(
            "round((CAST(sum_cents AS DOUBLE) / CAST(n_months AS DOUBLE))"
            " / (CAST(total_cents AS DOUBLE)"
            " / CAST(total_months AS DOUBLE)), 6)"
        ).alias("seasonal_idx"),
    )


def region_nation_rollup(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Hierarchical revenue rollup with SUBTOTALS: order cents by
    (region, nation) plus per-region subtotals and the grand total
    in ONE pass — the GROUPING-SETS surface (Spark ``rollup()``,
    SQL ``GROUP BY ROLLUP``) every finance report renders, and which
    no flat group-by here exercises. Subtotal rows label the
    rolled-away level ``ALL`` and carry ``grouping_id`` so the three
    levels are machine-separable.

    The dimension chain customer→nation→region broadcasts (a few
    hundred rows end to end); the fact table shuffles ONCE on the
    grouping keys — Spark expands the rollup map-side, so subtotals
    cost no extra scan. Cents exact int64.

    Emits ``region_name, nation_name, level, n_orders, sum_cents``.
    """
    dim = (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select(
            "c_custkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    j = orders.select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    ).join(F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"])
    rolled = j.rollup("region_name", "nation_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.grouping_id().cast("int").alias("level"),
    )
    return rolled.select(
        F.coalesce(F.col("region_name"), F.lit("ALL")).alias(
            "region_name"
        ),
        F.coalesce(F.col("nation_name"), F.lit("ALL")).alias(
            "nation_name"
        ),
        "level",
        "n_orders",
        "sum_cents",
    )


def benford_order_value(orders: DataFrame) -> DataFrame:
    """Benford leading-digit audit on ORDER MONEY — the canonical
    forensic-accounting screen (fabricated or threshold-gamed
    amounts bend the first-digit law long before any per-vendor
    review finds them). The text-length Benford query proves the
    digit machinery; this applies it to the column auditors
    actually run it on.

    Leading digit via the engine-portable string path on exact
    cents (no log10 — ``substr(CAST(cents AS VARCHAR), 1, 1)``),
    ONE 9-row aggregate, expected shares as repr-exact literals.

    Emits ``digit, n_orders, share, benford_share, excess``.
    """
    import math

    base = orders.select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)"
            " AS BIGINT) AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    ).where(F.col("digit") >= 1)
    agg = base.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    # CAST each expectation to DOUBLE: a bare decimal literal parses
    # as DECIMAL in Spark SQL and would ship a decimal column where
    # the contract (and the DuckDB twin) says double
    cases = " ".join(
        f"WHEN digit = {d} THEN"
        f" CAST({math.log10(1 + 1 / d)!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return agg.select(
        "digit",
        "n_orders",
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " / CAST(sum(n_orders) OVER () AS DOUBLE), 6)"
        ).alias("share"),
        F.expr(f"round(CASE {cases} END, 6)").alias("benford_share"),
        F.expr(
            "round(CAST(n_orders AS DOUBLE)"
            " / CAST(sum(n_orders) OVER () AS DOUBLE)"
            f" - CASE {cases} END, 6)"
        ).alias("excess"),
    )


def round_number_audit(orders: DataFrame) -> DataFrame:
    """Round-figure bias: how many order totals land on exact
    dollars, exact tens and exact hundreds of dollars — organic
    prices spread across cents, while hand-entered, negotiated or
    fabricated amounts cluster on round figures. The modular
    companion of the Benford screen (Benford reads the FIRST digit;
    this reads the LAST ones).

    Pure int64 modular arithmetic on exact cents, ONE summary row.

    Emits ``n_orders, n_round_dollar, n_round_ten, n_round_hundred,
    dollar_share, ten_share``.
    """
    base = orders.select(
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        )
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("cents") % 100 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_round_dollar"),
        F.sum(F.when(F.col("cents") % 1000 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_round_ten"),
        F.sum(F.when(F.col("cents") % 10000 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_round_hundred"),
    )
    return agg.select(
        "n_orders",
        "n_round_dollar",
        "n_round_ten",
        "n_round_hundred",
        F.expr(
            "round(CAST(n_round_dollar AS DOUBLE)"
            " / CAST(n_orders AS DOUBLE), 6)"
        ).alias("dollar_share"),
        F.expr(
            "round(CAST(n_round_ten AS DOUBLE)"
            " / CAST(n_orders AS DOUBLE), 6)"
        ).alias("ten_share"),
    )
