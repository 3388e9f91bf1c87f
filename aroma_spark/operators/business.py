"""Business-metric analytics over the raw event stream: exact
monetary rollups from the float ``value`` column and typed extraction
from the semi-structured JSON ``props`` column.

These exercise the two event-table columns the transcript view drops:
``value`` (a 2-decimal monetary amount stored as DOUBLE) and the
``props`` JSON payload. Both are the bread and butter of product
analytics — revenue per event type per day, and "pull field k out of
the JSON blob and aggregate it" — and both have cross-engine traps
this module defuses explicitly.

House bit-determinism discipline, with two new rules:
- Floats NEVER sum as floats. ``value`` quantizes to integer cents
  FIRST via ``floor(value * 100 + 0.5)`` — floor, not CAST, because
  Spark's double->bigint cast truncates while DuckDB's ROUNDS; floor
  is the one primitive both engines define identically. After that
  everything is the usual exact int64.
- JSON extraction goes through the STRING path on both engines
  (Spark ``get_json_object`` / DuckDB ``json_extract_string``) and
  casts to BIGINT explicitly — the typed-JSON fast paths disagree
  about quotes and nulls; the string path doesn't.

Scale shape: both operators are single map-side-combinable
aggregations over the raw scan with column pruning (only ts,
event_type, value/props read); output cardinality is days x types —
tiny anywhere.

No reference analog (the reference has no monetary or JSON columns);
these extend the rollup family to the raw business event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value -> integer cents; floor(x*100 + 0.5) == round-half-up for the
# non-negative amounts this column carries, and floor is bit-identical
# across engines where the raw casts are not
CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def value_rollup_daily(events: DataFrame) -> DataFrame:
    """Exact revenue rollup per (day, event_type) from integer cents.

    Emits ``day_ts, event_type, n_events, sum_cents, min_cents,
    max_cents, mean_cents`` — the mean is the one shared float
    (cents magnitudes sit far inside round(x,6)'s 2^53 headroom).
    """
    base = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.expr(CENTS).alias("cents"),
    )
    agg = base.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    return agg.select(
        F.col("day").alias("day_ts"),
        "event_type",
        "n_events",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr(
            "round(CAST(sum_cents AS DOUBLE) / CAST(n_events AS DOUBLE), 6)"
        ).alias("mean_cents"),
    )


def props_field_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """Typed aggregation of one integer field out of the ``props``
    JSON blob, per event type — the "is that JSON field actually
    populated, and what does it look like?" profiling query that
    precedes promoting a props field to a real column.

    Extraction uses the cross-engine-safe string path (module
    docstring); events whose props lack the field (or aren't valid
    JSON) count in ``n_events`` but not ``n_with_field``.

    Emits ``event_type, n_events, n_with_field, sum_field, min_field,
    max_field, mean_field``.
    """
    k = F.expr(
        f"CAST(get_json_object(props, '$.{field}') AS BIGINT)"
    ).alias("kv")
    base = events.select("event_type", k)
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("kv").cast("long").alias("n_with_field"),
        F.sum("kv").cast("long").alias("sum_field"),
        F.min("kv").cast("long").alias("min_field"),
        F.max("kv").cast("long").alias("max_field"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_with_field",
        "sum_field",
        "min_field",
        "max_field",
        F.expr(
            "CASE WHEN n_with_field > 0 THEN"
            " round(CAST(sum_field AS DOUBLE)"
            " / CAST(n_with_field AS DOUBLE), 6) END"
        ).alias("mean_field"),
    )


def rfm_users(events: DataFrame) -> DataFrame:
    """Classic RFM (recency / frequency / monetary) scoring per user
    from the raw event stream — the segmentation table CRM pipelines
    build first. Quintile scores are EXPLICIT integer arithmetic,
    ``score = 5 - (rank-1)*5 DIV n`` over a fully deterministic
    (metric, user_id) total order — not NTILE, whose remainder
    distribution is an engine implementation detail.

    Recency is whole days behind the corpus's last event (a 1-row
    broadcast, never a driver collect); monetary uses the module's
    cents quantization. Per-user reduction + three rank windows over
    the (tiny) users table.

    Emits ``user_id, recency_days, n_events, m_cents, r_score,
    f_score, m_score`` — 5 is best on every axis.
    """
    from pyspark.sql import Window

    per_user = events.groupBy("user_id").agg(
        F.max(F.to_date(F.col("ts"))).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr(CENTS)).cast("long").alias("m_cents"),
    )
    corpus = events.agg(F.max(F.to_date(F.col("ts"))).alias("max_day"))
    base = per_user.crossJoin(F.broadcast(corpus)).select(
        "user_id",
        F.datediff(F.col("max_day"), F.col("last_day"))
        .cast("long")
        .alias("recency_days"),
        "n_events",
        "m_cents",
    )
    # three chained distributed global ranks (range partition + bounded
    # offsets — ranking.with_global_rank) instead of three unpartitioned
    # row_number windows that each single-tasked |users| (r6, round-5
    # verdict item 1); rank values identical by construction
    from aroma_spark.operators.ranking import with_global_rank

    ranked = with_global_rank(
        base,
        [F.col("recency_days").asc(), F.col("user_id").asc()],
        rank_col="rk_r",
        total_col="n",
    )
    ranked = with_global_rank(
        ranked,
        [F.col("n_events").desc(), F.col("user_id").asc()],
        rank_col="rk_f",
    )
    ranked = with_global_rank(
        ranked,
        [F.col("m_cents").desc(), F.col("user_id").asc()],
        rank_col="rk_m",
    )
    def _score(rk: str):
        return F.expr(f"5 - ({rk} - 1) * 5 DIV n").cast("long")

    return ranked.select(
        "user_id",
        "recency_days",
        "n_events",
        "m_cents",
        _score("rk_r").alias("r_score"),
        _score("rk_f").alias("f_score"),
        _score("rk_m").alias("m_score"),
    )


def pareto_revenue(events: DataFrame, pct_x10: int = 8) -> DataFrame:
    """Revenue concentration: how many users produce ``pct_x10``/10
    (default 80%) of total monetary value — the Pareto number behind
    "is this a whale business?".

    Users rank by cents descending (user_id tie-break); a user is in
    the covering set while the cumulative BEFORE them is under the
    target: ``10 * (cum - m) < pct_x10 * total`` — the value-area
    inclusion rule, all int64. ONE summary row.

    Emits ``n_users, users_to_pct, total_cents, covered_cents,
    top_user_share``.
    """
    from pyspark.sql import Window

    per_user = events.groupBy("user_id").agg(
        F.sum(F.expr(CENTS)).cast("long").alias("m")
    )
    # distributed global running sum (ranking.with_global_cumsum: range
    # partition + bounded per-partition sum offsets) — no single-task
    # cumsum over |users| (r6, same class as the verdict-item-1 rank
    # windows); total/top via a broadcast 1-row aggregate
    from aroma_spark.operators.ranking import with_global_cumsum

    totals = per_user.agg(
        F.sum("m").alias("total"), F.max("m").alias("top_m")
    )
    stepped = with_global_cumsum(
        per_user,
        [F.col("m").desc(), F.col("user_id").asc()],
        "m",
        cum_col="cum",
    ).crossJoin(F.broadcast(totals)).select("m", "cum", "total", "top_m")
    included = (
        F.lit(10) * (F.col("cum") - F.col("m"))
        < F.lit(pct_x10) * F.col("total")
    )
    agg = stepped.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.when(included, 1).otherwise(0)).cast("long").alias("users_to_pct"),
        F.max("total").cast("long").alias("total_cents"),
        F.sum(F.when(included, F.col("m")).otherwise(0))
        .cast("long")
        .alias("covered_cents"),
        F.max("top_m").cast("long").alias("top_m"),
    )
    return agg.select(
        "n_users",
        "users_to_pct",
        "total_cents",
        "covered_cents",
        F.expr(
            "round(CAST(top_m AS DOUBLE) / CAST(total_cents AS DOUBLE), 6)"
        ).alias("top_user_share"),
    )


def interpurchase_daily(events: DataFrame) -> DataFrame:
    """Inter-purchase gap profile per day: for every user's
    consecutive purchase pair, the gap in exact integer microseconds,
    aggregated onto the day of the LATER purchase — the
    repeat-purchase-cadence report (how long do buyers wait between
    purchases, and is that drifting?).

    Scale shape: the event-type filter prunes the scan
    (``EqualTo(event_type, purchase)`` in PushedFilters — on a 100 TB
    warehouse partitioned or z-ordered by type/day that is the
    difference between reading purchases and reading everything);
    the lag window rides ONE hash exchange on user_id over the
    filtered slice only; the per-day aggregate is map-side
    combinable. Gaps are exact int64 µs (epoch-µs subtraction, the
    signals discipline); the mean is an INTEGER quotient (the
    seasonal_profile discipline — at ~1e11 µs a float division
    differs across engines in the last ulp and round(x, 6) cannot
    absorb it; gaps are nonnegative by the window order, so
    truncation IS floor and sub-µs mean precision is noise).

    Emits ``day_ts, n_gaps, sum_gap_us, min_gap_us, max_gap_us,
    mean_gap_us``.
    """
    from pyspark.sql import Window

    p = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = p.select(
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    agg = gaps.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("sum_gap_us"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    return agg.select(
        "day_ts",
        "n_gaps",
        "sum_gap_us",
        "min_gap_us",
        "max_gap_us",
        F.expr("sum_gap_us div n_gaps").cast("long").alias(
            "mean_gap_us"
        ),
    )


def rolling_revenue_7d(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing ``window_days``-day purchase revenue per day — the
    classic smoothed-revenue line — computed as a calendar RANGE
    window over DAILY PRE-AGGREGATES, never over raw events.

    Scale shape: the purchase filter prunes the scan, ONE map-side
    combinable aggregation collapses 10^12 events to |days| rows, and
    the rolling frame then runs over those |days| rows on a single
    partition — microscopic by construction, because the window input
    is the daily rollup, not the event stream. Missing calendar days
    simply contribute nothing to the frame (n_days_in_window reports
    how many actual days back the frame reached). All sums exact
    int64 cents.

    Emits ``day_ts, day_cents, n_days_in_window, rolling_cents,
    rolling_n_events``.
    """
    from pyspark.sql import Window

    daily = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day_ts"))
        .agg(
            F.sum(F.expr(CENTS)).cast("long").alias("day_cents"),
            F.count(F.lit(1)).cast("long").alias("day_n"),
        )
    )
    # RANGE frame keyed on whole days-since-epoch so the window is
    # calendar-aware (skips missing days) yet integer-ordered
    keyed = daily.withColumn(
        "day_no", F.datediff(F.col("day_ts"), F.lit("1970-01-01")).cast("long")
    )
    w = (
        Window.orderBy("day_no")
        .rangeBetween(-(window_days - 1), 0)
    )
    out = keyed.select(
        "day_ts",
        "day_cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n_days_in_window"),
        F.sum("day_cents").over(w).cast("long").alias("rolling_cents"),
        F.sum("day_n").over(w).cast("long").alias("rolling_n_events"),
    )
    return out


def revenue_heatmap(events: DataFrame) -> DataFrame:
    """Purchase revenue by (day-of-week, hour-of-day) — the
    revenue-weighted version of the activity heatmap: WHEN is the
    money made, not just when are users active?

    ``dow`` follows Spark's ``dayofweek`` (1=Sunday..7=Saturday; the
    DuckDB twin maps ``dayofweek(ts)+1``). One pruned scan (purchase
    filter pushed), ONE map-side combinable aggregation into at most
    168 rows. Cents exact int64; the per-event mean is one shared
    float at cent magnitudes.

    Emits ``dow, hod, n_purchases, sum_cents, mean_cents``.
    """
    base = events.where(F.col("event_type") == "purchase").select(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
        F.expr(CENTS).alias("cents"),
    )
    agg = base.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    return agg.select(
        "dow",
        "hod",
        "n_purchases",
        "sum_cents",
        F.expr(
            "round(CAST(sum_cents AS DOUBLE)"
            " / CAST(n_purchases AS DOUBLE), 6)"
        ).alias("mean_cents"),
    )


VALUE_PCTS = ((50, "p50"), (90, "p90"), (99, "p99"))


def purchase_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact daily purchase-value percentiles (p50/p90/p99 in integer
    cents): the basket-size distribution tail, type-1 quantiles at
    rank ``max(1, ceil(q/100 * n))`` under the deterministic
    (cents, event_id) order — no interpolation, no float, every
    engine picks the SAME purchase.

    The purchase filter prunes the scan; ONE hash exchange on the day
    for the rank window (exactness genuinely needs the per-day sort —
    the sketch path is ``hist_quantiles_1d``); then a |days|-row
    conditional aggregate. All int64.

    Emits ``day_ts, n_purchases, p50_cents, p90_cents, p99_cents``.
    """
    from pyspark.sql import Window

    base = events.where(F.col("event_type") == "purchase").select(
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.expr(CENTS).alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("day_ts").orderBy("cents", "event_id")
    ranked = base.select(
        "day_ts",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("day_ts"))
        .cast("long")
        .alias("n_purchases"),
    )
    aggs = [F.max("n_purchases").cast("long").alias("n_purchases")]
    for q, name in VALUE_PCTS:
        target = F.greatest(
            F.lit(1), F.ceil(F.col("n_purchases") * F.lit(q) / F.lit(100))
        )
        aggs.append(
            F.min(F.when(F.col("rk") == target, F.col("cents")))
            .cast("long")
            .alias(f"{name}_cents")
        )
    return ranked.groupBy("day_ts").agg(*aggs)


def wow_revenue(events: DataFrame) -> DataFrame:
    """Week-over-week purchase-revenue growth: each ISO week's cents
    next to the previous CALENDAR week's (a missing week breaks the
    chain, the :func:`~aroma_spark.operators.stats.dod_growth`
    discipline at weekly grain).

    ONE map-side combinable weekly aggregate over the pruned
    purchase scan, then a lag window over |weeks| rows on a single
    partition. Cents exact int64; the growth is one shared float,
    NULL on chain breaks and the first week.

    Emits ``week_ts, week_cents, n_purchases, prev_week_cents,
    wow_growth``.
    """
    from pyspark.sql import Window

    weekly = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("week", F.col("ts")).alias("week_ts"))
        .agg(
            F.sum(F.expr(CENTS)).cast("long").alias("week_cents"),
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
        )
    )
    w = Window.orderBy("week_ts")
    out = weekly.select(
        "week_ts",
        "week_cents",
        "n_purchases",
        F.when(
            F.lag("week_ts").over(w)
            == F.col("week_ts") - F.expr("INTERVAL 7 DAYS"),
            F.lag("week_cents").over(w),
        )
        .cast("long")
        .alias("prev_week_cents"),
    )
    return out.select(
        "week_ts",
        "week_cents",
        "n_purchases",
        "prev_week_cents",
        F.expr(
            "CASE WHEN prev_week_cents > 0 THEN"
            " round(CAST(week_cents - prev_week_cents AS DOUBLE)"
            " / CAST(prev_week_cents AS DOUBLE), 6) END"
        ).alias("wow_growth"),
    )


def revenue_new_vs_returning(events: DataFrame) -> DataFrame:
    """Daily purchase revenue split by NEW vs RETURNING buyers: cents
    from users whose first-ever activity (any event type) is that
    same day vs. everyone else — the acquisition-vs-retention money
    split under the growth-accounting lens.

    Two passes over the one user_id exchange: the per-user first
    active day (a map-side combinable min), then a co-partitioned
    join onto the purchase slice (the purchase filter pushed to its
    scan) and ONE |days|-row rollup. Cents exact int64; the new
    share is one shared float, guarded for zero-revenue days.

    Emits ``day_ts, n_purchases, new_cents, returning_cents,
    total_cents, new_share``.
    """
    first_day = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.expr(CENTS).alias("cents"),
    )
    j = p.join(first_day, "user_id").select(
        "day_ts",
        "cents",
        (F.col("day_ts") == F.col("first_day")).alias("is_new"),
    )
    agg = j.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.when(F.col("is_new"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("new_cents"),
        F.sum(F.when(~F.col("is_new"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("returning_cents"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    return agg.select(
        "day_ts",
        "n_purchases",
        "new_cents",
        "returning_cents",
        "total_cents",
        F.expr(
            "CASE WHEN total_cents > 0 THEN round(CAST(new_cents"
            " AS DOUBLE) / CAST(total_cents AS DOUBLE), 6) END"
        ).alias("new_share"),
    )


def top_buyer_daily(events: DataFrame) -> DataFrame:
    """The day's biggest spender: per day, the user with the highest
    purchase cents (deterministic tie to the lower user id) and
    their share of the day's revenue — the daily drill-down of the
    corpus-level Pareto report.

    ONE map-side combinable (day, user) cents aggregate over the
    pruned purchase scan, then the argmax and day total as window
    functions over that frame. Exact int64 cents.

    Emits ``day_ts, top_user_id, top_cents, n_user_purchases,
    day_cents, top_share``.
    """
    from pyspark.sql import Window

    cell = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day_ts"), "user_id"
        )
        .agg(
            F.sum(F.expr(CENTS)).cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n_user_purchases"),
        )
    )
    w = Window.partitionBy("day_ts").orderBy(
        F.col("cents").desc(), F.col("user_id").asc()
    )
    wd = Window.partitionBy("day_ts")
    ranked = cell.select(
        "day_ts",
        "user_id",
        "cents",
        "n_user_purchases",
        F.row_number().over(w).alias("rn"),
        F.sum("cents").over(wd).cast("long").alias("day_cents"),
    ).where(F.col("rn") == 1)
    return ranked.select(
        "day_ts",
        F.col("user_id").alias("top_user_id"),
        F.col("cents").alias("top_cents"),
        "n_user_purchases",
        "day_cents",
        F.expr(
            "CASE WHEN day_cents > 0 THEN round(CAST(cents AS DOUBLE)"
            " / CAST(day_cents AS DOUBLE), 6) END"
        ).alias("top_share"),
    )


def revenue_outlier_days(events: DataFrame) -> DataFrame:
    """Days whose purchase revenue is an outlier against the corpus
    median daily revenue — flagged by the EXACT integer comparison
    ``rev > 2 * median`` / ``2 * rev < median`` (no float threshold),
    with the ratio as the one shared float for reading.

    Daily cents first (map-side combinable), the median of the
    |days|-row series by rank window over it, the flags pure int64
    comparisons. The whole post-aggregate stage runs over |days|
    rows.

    Emits ``day_ts, day_cents, median_cents, rev_ratio, is_high,
    is_low``.
    """
    from pyspark.sql import Window

    daily = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day_ts"))
        .agg(F.sum(F.expr(CENTS)).cast("long").alias("day_cents"))
    )
    # bounded global windows: frame is the per-day aggregate (calendar
    # days of the horizon), not the event table
    w = Window.orderBy("day_cents", "day_ts")
    ranked = daily.select(
        "day_ts",
        "day_cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    med = ranked.where(
        F.col("rk") == F.expr("(n + 1) div 2")
    ).select(F.col("day_cents").alias("median_cents"))
    out = daily.crossJoin(F.broadcast(med))
    return out.select(
        "day_ts",
        "day_cents",
        "median_cents",
        F.expr(
            "CASE WHEN median_cents > 0 THEN round(CAST(day_cents"
            " AS DOUBLE) / CAST(median_cents AS DOUBLE), 6) END"
        ).alias("rev_ratio"),
        (F.col("day_cents") > F.lit(2) * F.col("median_cents")).alias(
            "is_high"
        ),
        (F.lit(2) * F.col("day_cents") < F.col("median_cents")).alias(
            "is_low"
        ),
    )


def value_quality_audit(events: DataFrame) -> DataFrame:
    """Monetary-value data-quality audit per event type: zero,
    negative and null value counts — a purchase with value 0 is a
    broken tracking call, and this report is where it shows.

    ONE map-side combinable aggregate into |types| rows. Exact
    int64; shares are shared floats.

    Emits ``event_type, n_events, n_null, n_zero, n_negative,
    zero_share``.
    """
    c = F.expr(CENTS)
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.sum(F.when(c == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.sum(F.when(c < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_null",
        "n_zero",
        "n_negative",
        F.expr(
            "round(CAST(n_zero AS DOUBLE) / CAST(n_events AS DOUBLE), 6)"
        ).alias("zero_share"),
    )


def spend_activity_deciles(events: DataFrame) -> DataFrame:
    """Do bigger spenders show up more? Users ranked into spend
    deciles (exact row_number rank over total purchase cents, ties
    to the lower user id; non-buyers excluded), each decile reporting
    its exact revenue and active-day mass — the monetization-vs-
    engagement curve in ten rows.

    Per-user totals ride ONE user_id exchange (cents from the pruned
    purchase slice, active days as an exact (user, day) dedup); the
    decile is integer arithmetic over the rank ((rk-1)*10 div n);
    the final aggregate is 10 rows. Exact int64; the mean is one
    shared float.

    Emits ``decile, n_users, sum_cents, sum_active_days,
    mean_active_days``.
    """
    from pyspark.sql import Window

    spend = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.expr(CENTS)).cast("long").alias("cents"))
    )
    days = (
        events.select(
            "user_id", F.date_trunc("day", F.col("ts")).alias("d")
        )
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("active_days"))
    )
    j = spend.join(days, "user_id")
    # distributed global rank (ranking.with_global_rank) — no
    # single-task sort over |users| (r6, round-5 verdict item 1)
    from aroma_spark.operators.ranking import with_global_rank

    ranked = with_global_rank(
        j,
        [F.col("cents").asc(), F.col("user_id").asc()],
        rank_col="rk",
        total_col="n",
    ).select("cents", "active_days", "rk", "n")
    bucketed = ranked.select(
        F.expr("CAST(((rk - 1) * 10) div n AS INT)").alias("decile"),
        "cents",
        "active_days",
    )
    agg = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum("active_days").cast("long").alias("sum_active_days"),
    )
    return agg.select(
        "decile",
        "n_users",
        "sum_cents",
        "sum_active_days",
        F.expr(
            "round(CAST(sum_active_days AS DOUBLE)"
            " / CAST(n_users AS DOUBLE), 6)"
        ).alias("mean_active_days"),
    )


def type_hour_lift(events: DataFrame) -> DataFrame:
    """The (event type, hour-of-day) independence-lift matrix: do
    purchases really skew to the evening, or is that just when
    everything happens? lift > 1 marks the hours a type
    over-indexes — the temporal-targeting read.

    ONE map-side combinable aggregate into at most |types| x 24
    rows; all three marginals as window sums over that tiny matrix.
    Counts exact int64; the lift is one shared float over four exact
    ints.

    Emits ``event_type, hod, n_events, type_total, hour_total,
    corpus_total, lift``.
    """
    from pyspark.sql import Window

    cell = events.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    cell = cell.select(
        "event_type",
        "hod",
        "n_events",
        F.sum("n_events")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("type_total"),
        F.sum("n_events")
        .over(Window.partitionBy("hod"))
        .cast("long")
        .alias("hour_total"),
        # bounded global window: frame is the |event types| x 24
        # contingency aggregate
        F.sum("n_events")
        .over(Window.partitionBy())
        .cast("long")
        .alias("corpus_total"),
    )
    return cell.select(
        "event_type",
        "hod",
        "n_events",
        "type_total",
        "hour_total",
        "corpus_total",
        F.expr(
            "round(CAST(n_events AS DOUBLE)"
            " * CAST(corpus_total AS DOUBLE)"
            " / (CAST(type_total AS DOUBLE)"
            " * CAST(hour_total AS DOUBLE)), 6)"
        ).alias("lift"),
    )


def repeat_buyers_weekly(events: DataFrame) -> DataFrame:
    """Buyer retention at weekly grain: of each week's purchasers,
    how many also purchased the PREVIOUS calendar week? The money
    sibling of growth accounting's activity decomposition — activity
    can retain while buying churns.

    Dedup to (user, week) purchase flags map-side, one lag window
    per user over those |users| x |weeks| rows (calendar chain
    check), ONE |weeks|-row rollup. Exact counts; the share is one
    shared float.

    Emits ``week_ts, n_buyers, n_repeat, repeat_share``.
    """
    from pyspark.sql import Window

    uw = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("week_ts")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("week_ts")
    marked = uw.select(
        "week_ts",
        (
            F.lag("week_ts").over(w)
            == F.col("week_ts") - F.expr("INTERVAL 7 DAYS")
        ).alias("is_repeat"),
    )
    agg = marked.groupBy("week_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_buyers"),
        F.sum(F.when(F.col("is_repeat"), 1).otherwise(0))
        .cast("long")
        .alias("n_repeat"),
    )
    return agg.select(
        "week_ts",
        "n_buyers",
        "n_repeat",
        F.expr(
            "round(CAST(n_repeat AS DOUBLE) / CAST(n_buyers AS DOUBLE), 6)"
        ).alias("repeat_share"),
    )


def props_field_hist(events: DataFrame, field: str = "k") -> DataFrame:
    """Power-of-two histogram of one integer ``props`` JSON field —
    the distribution view behind :func:`props_field_stats`' min/max
    envelope (a min of 1 and max of 100 hides whether the mass sits
    at 2 or at 90).

    Extraction via the cross-engine string path (module docstring);
    rows without the field are counted separately, never binned.
    Bucket by integer bit-length of ``value + 1`` (so 0 lands in
    bucket 0); ONE map-side combinable aggregate into ~10 rows plus
    the missing row (bucket = -1). Exact int64.

    Emits ``bucket, lo_value, n_events, sum_value, share``.
    """
    from pyspark.sql import Window

    kv = F.expr(
        f"CAST(get_json_object(props, '$.{field}') AS BIGINT)"
    )
    bucketed = events.select(
        F.when(
            kv.isNull(), F.lit(-1)
        )
        .otherwise(F.length(F.conv(kv + 1, 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        F.coalesce(kv, F.lit(0)).alias("v"),
    )
    hist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v").cast("long").alias("sum_value"),
    )
    # bounded global window: frame is the power-of-two value histogram
    # (<= 64 rows)
    hist = hist.withColumn(
        "total",
        F.sum("n_events").over(Window.partitionBy()).cast("long"),
    )
    return hist.select(
        "bucket",
        F.expr(
            "CASE WHEN bucket >= 0 THEN"
            " CAST(shiftleft(1L, bucket) - 1 AS BIGINT) END"
        ).alias("lo_value"),
        "n_events",
        "sum_value",
        F.expr(
            "round(CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE), 6)"
        ).alias("share"),
    )


def median_value_by_type(events: DataFrame) -> DataFrame:
    """Exact median monetary value per event type (type-1 rank in
    integer cents under the deterministic (cents, event_id) order) —
    the robust centre the mean-of-cents rollups can't give next to a
    whale-heavy tail.

    One hash exchange on event_type for the rank window, |types|
    output rows. All int64.

    Emits ``event_type, n_events, median_cents``.
    """
    from pyspark.sql import Window

    base = events.select(
        "event_type", F.expr(CENTS).alias("cents"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n_events"),
    )
    return ranked.where(
        F.col("rk") == F.expr("(n_events + 1) div 2")
    ).select(
        "event_type",
        "n_events",
        F.col("cents").alias("median_cents"),
    )


def cohort_ltv_weekly(events: DataFrame) -> DataFrame:
    """Weekly cohort lifetime value: the monetary companion to the
    retention grid — per signup-week cohort and week offset, purchase
    revenue and its running total, normalized to LTV cents per cohort
    user. The curve every growth review reads next to retention
    ("cohorts retain — but do they PAY, and how fast does the curve
    flatten?").

    Cohort = the week of the user's FIRST event of any type; revenue
    counts purchases only, in exact integer cents (house ``floor``
    quantization — purchase values are non-negative, so the final
    integer-quotient per-user LTV is floor division in both engines).
    Only (cohort, offset) cells with at least one purchase appear —
    the sparse grid is identical across engines.

    Scale shape: first-week min and per-(user, week) purchase cents
    ride the same user_id exchange (co-partitioned join), collapse to
    the |weeks|^2/2 grid, and the running total is a window over THAT
    tiny grid, never the corpus. The |weeks|-row cohort-size rollup
    joins back via broadcast. All int64 until the one share float.

    Emits ``cohort_week, offset_week, cohort_users, n_buyers,
    rev_cents, cum_rev_cents, ltv_cents_per_user``.
    """
    from pyspark.sql import Window

    week = F.date_trunc("week", F.col("ts"))
    fw = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    sizes = fw.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    rev = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        week.alias("active_week"),
        F.expr(CENTS).alias("cents"),
    )
    grid = (
        rev.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("int")
            .alias("offset_week"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_buyers"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("offset_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = grid.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(w).cast("long")
    ).join(F.broadcast(sizes), "cohort_week")
    return out.select(
        "cohort_week",
        "offset_week",
        "cohort_users",
        "n_buyers",
        "rev_cents",
        "cum_rev_cents",
        F.expr("CAST(cum_rev_cents div cohort_users AS BIGINT)").alias(
            "ltv_cents_per_user"
        ),
    )


def purchase_attribution(events: DataFrame) -> DataFrame:
    """Last-touch purchase attribution: each purchase is credited to
    the user's most recent PRIOR non-purchase event type (the
    marketing-analytics staple "what did they do right before
    buying?"); purchases with no prior touch credit ``(none)``.

    The carry-forward is LOCF over a conditional: one window per
    user in the deterministic (ts, event_id) order, taking the last
    non-null of ``CASE WHEN type <> purchase THEN type END`` over
    ROWS UNBOUNDED PRECEDING..1 PRECEDING — the same ignore-nulls
    window primitive both engines define identically (Spark
    ``last(expr, ignorenulls)``, DuckDB ``last_value(expr IGNORE
    NULLS)``), so no join against a lagged self-copy is needed.

    Scale shape: ONE user_id exchange for the window (user event
    histories are short — no skew concern), purchases filtered after
    the carry-forward, then a |event types|-row rollup with the share
    computed over that tiny result. Cents exact int64.

    Emits ``touch, n_purchases, rev_cents, share``.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.expr(CENTS).alias("cents"),
    )
    attr = base.withColumn(
        "last_touch",
        F.last(
            F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            ),
            ignorenulls=True,
        ).over(w),
    )
    agg = (
        attr.where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("(none)")).alias(
                "touch"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    return agg.select(
        "touch",
        "n_purchases",
        "rev_cents",
        F.expr(
            "round(CAST(n_purchases AS DOUBLE)"
            " / CAST(sum(n_purchases) OVER () AS DOUBLE), 6)"
        ).alias("share"),
    )


def user_type_concentration(events: DataFrame) -> DataFrame:
    """How single-minded is each user? Per user, the share of their
    events taken by their SINGLE most frequent event type, floored
    to a decile bucket and histogrammed over users — the
    "specialists vs generalists" census (bucket 10 = users who only
    ever do one thing; bucket 2-3 = diversified usage). The
    concentration companion to the per-role entropy family, which
    profiles streams, not users.

    The bucket is exact integer arithmetic end to end: ``(10 *
    max_n) div total_n`` on int64 counts — no float ever decides
    membership, so the histogram is bit-identical across engines.
    Tied top types change nothing (only the max count matters).

    Scale shape: one (user, type) map-side combinable aggregate,
    one per-user rollup riding the same user_id exchange, then an
    ~11-row histogram. The share float is display-only.

    Emits ``bucket, lo_share, n_users, user_share``.
    """
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    user = per.groupBy("user_id").agg(
        F.max("n").cast("long").alias("max_n"),
        F.sum("n").cast("long").alias("total_n"),
    )
    bucketed = user.select(
        F.expr("CAST((10 * max_n) div total_n AS INT)").alias("bucket")
    )
    hist = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return hist.select(
        "bucket",
        F.expr("round(CAST(bucket AS DOUBLE) / 10.0, 1)").alias(
            "lo_share"
        ),
        "n_users",
        F.expr(
            "round(CAST(n_users AS DOUBLE)"
            " / CAST(sum(n_users) OVER () AS DOUBLE), 6)"
        ).alias("user_share"),
    )


def spend_decile_mobility(events: DataFrame) -> DataFrame:
    """Week-over-week spend-decile mobility: each user's purchase
    spend ranks into a decile within its calendar week (exact
    type-1 rank under the deterministic (cents, user_id) order), and
    users active in two CONSECUTIVE weeks land in a (from_decile,
    to_decile) transition cell — the social-mobility matrix of
    wallet share ("do whales stay whales?"). Diagonal mass =
    stickiness; below-diagonal = churn risk the revenue rollups
    can't see until it already happened.

    Decile = ``((rank - 1) * 10) div week_count`` — integer-exact,
    unique ranks by construction (user_id breaks cents ties), so
    both engines place every user identically. Consecutive weeks
    only: the week key shifts by exactly 7 days on week-truncated
    stamps — no calendar-arithmetic engine quirks can enter.

    Scale shape: one (user, week) aggregate, a rank window per
    week (weeks partition the corpus — no hot key), and a
    user_id-co-partitioned self-join of adjacent weeks; output is
    |weeks| x 100 cells. All int64.

    Emits ``week_ts, from_decile, to_decile, n_users``.
    """
    from pyspark.sql import Window

    weekly = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("week_ts"),
        )
        .agg(F.sum(F.expr(CENTS)).cast("long").alias("cents"))
    )
    w = Window.partitionBy("week_ts").orderBy("cents", "user_id")
    ranked = weekly.select(
        "user_id",
        "week_ts",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("week_ts"))
        .cast("long")
        .alias("n_week"),
    ).select(
        "user_id",
        "week_ts",
        F.expr("CAST(((rk - 1) * 10) div n_week AS INT)").alias(
            "decile"
        ),
    )
    nxt = ranked.select(
        "user_id",
        (F.col("week_ts") - F.expr("INTERVAL 7 DAYS")).alias("week_ts"),
        F.col("decile").alias("to_decile"),
    )
    joined = ranked.alias("a").join(
        nxt.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.week_ts") == F.col("b.week_ts")),
    )
    return joined.groupBy(
        F.col("a.week_ts").alias("week_ts"),
        F.col("a.decile").alias("from_decile"),
        F.col("b.to_decile").alias("to_decile"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


def repurchase_lag_hist(events: DataFrame) -> DataFrame:
    """Time-to-SECOND-purchase census: for every user with at least
    two purchases, the whole-day lag between their first and second
    purchase, histogrammed — the activation metric
    (signup_purchase_lag measures reaching the FIRST purchase;
    whether buyers come BACK, and how fast, is this curve).

    First and second purchase are ranks 1 and 2 under the
    deterministic (ts, event_id) order within each user's purchase
    stream — one user_id window, a self-pivot via conditional
    aggregation (no join), whole-day integer lag, |days| output
    rows. The share is the one display float.

    Emits ``lag_days, n_users, share``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.row_number().over(w).alias("rk"),
    )
    lags = (
        ranked.where(F.col("rk") <= 2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(F.when(F.col("rk") == 1, F.col("ts"))).alias("t1"),
            F.max(F.when(F.col("rk") == 2, F.col("ts"))).alias("t2"),
        )
        .where(F.col("n") == 2)
        .select(
            F.datediff(F.to_date("t2"), F.to_date("t1"))
            .cast("long")
            .alias("lag_days")
        )
    )
    hist = lags.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return hist.select(
        "lag_days",
        "n_users",
        F.expr(
            "round(CAST(n_users AS DOUBLE)"
            " / CAST(sum(n_users) OVER () AS DOUBLE), 6)"
        ).alias("share"),
    )


def intraday_value_curve(events: DataFrame) -> DataFrame:
    """The intraday revenue pacing curve: per hour-of-day, the exact
    cents booked across the whole corpus and the cumulative share of
    the day reached by that hour — "by 14:00 we have usually booked
    61% of the day". The hour-of-day companion of the
    month-to-date pacing curve, and the baseline an intraday
    anomaly check compares against.

    ONE 24-row aggregate; the cumulative window runs over those 24
    rows only. Int64 cents; shares are display floats.

    Emits ``hour_of_day, cents, cum_cents, cum_share``.
    """
    from pyspark.sql import Window

    hourly = events.groupBy(
        F.hour(F.col("ts")).cast("int").alias("hour_of_day")
    ).agg(F.sum(F.expr(CENTS)).cast("long").alias("cents"))
    w = Window.orderBy("hour_of_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hourly.select(
        "hour_of_day",
        "cents",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
        # bounded global window: frame is the 24-row hour-of-day aggregate
        F.sum("cents")
        .over(Window.partitionBy())
        .cast("long")
        .alias("total_cents"),
    )
    return cum.select(
        "hour_of_day",
        "cents",
        "cum_cents",
        F.expr(
            "round(CAST(cum_cents AS DOUBLE)"
            " / CAST(total_cents AS DOUBLE), 6)"
        ).alias("cum_share"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_role_pivot(events: DataFrame) -> DataFrame:
    """The daily event-mix WIDE table: one row per day, one column
    per event type — the layout every spreadsheet-bound consumer
    asks for, produced with Spark's native ``pivot()`` against the
    FIXED public type list (an unpinned pivot would schema-drift the
    moment a new type appears; the explicit list also lets Spark
    skip the extra distinct-values job a blind pivot runs).

    ONE map-side combinable (day, type) aggregation, pivoted to
    |days| x |types| — tiny anywhere. Absent combinations emit 0,
    not NULL (both engines coalesce identically). All int64.

    Emits ``day_ts, n_click, n_error, n_purchase, n_signup,
    n_view``.
    """
    pivoted = (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day_ts"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day_ts",
        *[
            F.coalesce(F.col(t), F.lit(0))
            .cast("long")
            .alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )
