"""Anomaly scoring and seasonality profiles over the signal frame.

The alerting layer of a time-series store, kept bit-deterministic across
engines by the same discipline as the rest of the lattice: every shuffled
quantity is an INTEGER partial (count / sum / sum-of-squares), floats
appear only in the final projection as one rounded expression.

- :func:`rolling_zscore` — per-turn z-score of a signal against its own
  conversation's trailing time window. The z is computed from integer
  window partials via the algebraic identity

      z = (n*x - s) / sqrt(n*ssq - s^2)

  (derived from z = (x - s/n) / (sqrt(n*ssq - s^2)/n) — numerator and
  the radicand are exact int64 arithmetic; sqrt and the single division
  are correctly-rounded IEEE-754, identical on every engine, and the
  result is rounded once). Overflow bound: n*ssq < 2^63 requires
  n * max(value)^2 * n < 2^63 per window — holds for bounded signals
  like text_len (<= 2^20) with windows up to ~10^6 rows; for raw
  microsecond latencies pre-scale to milliseconds first.
- :func:`seasonal_profile` — hour-of-day x day-of-week continuous
  aggregate per role: the seasonality fingerprint (traffic and latency
  by weekly phase) used both for dashboards and as the baseline for
  seasonal anomaly rules. Pure single-shuffle aggregation on a
  low-cardinality key (role x 7 x 24), map-side combined to almost
  nothing.

Physical shape: rolling_zscore rides the canonical conv_id exchange
(same range-frame machinery as operators/rolling.py — no explode, no
self-join); a hot conversation serializes per the documented skew note
there. seasonal_profile's key space is tiny, so the reduce side is a
few hundred rows regardless of corpus size.

No reference analog (the reference has no windowed statistics); the
natural alerting extension of the north_star's telemetry tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    signals: DataFrame,
    window: str = "1 hour",
    value_col: str = "text_len",
    threshold: float = 2.0,
) -> DataFrame:
    """Per turn: trailing-window integer partials + z-score + anomaly flag.

    Window = all turns of the same conversation within the trailing
    ``window`` (time range, inclusive of the current turn; ties at equal
    ts are frame peers — same frame semantics as
    :func:`~aroma_spark.operators.rolling.rolling_window_stats`).
    ``z`` is NULL when the window variance is 0 (constant window, or the
    conversation's first turn); ``is_anomaly`` is then false.
    """
    from aroma_spark.operators.sessions import _interval_to_us

    win_us = _interval_to_us(window)
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-win_us, 0)
    )
    v = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(w).cast("long")
    s = F.sum(v).over(w).cast("long")
    ssq = F.sum(v * v).over(w).cast("long")
    radicand = n * ssq - s * s
    z = F.when(
        radicand > 0,
        F.round((n * v - s).cast("double") / F.sqrt(radicand.cast("double")), 6),
    )
    return signals.select(
        "conv_id",
        "turn_idx",
        "ts",
        v.alias("value"),
        n.alias("w_n"),
        s.alias("w_sum"),
        ssq.alias("w_sumsq"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def seasonal_profile(signals: DataFrame) -> DataFrame:
    """Weekly-phase continuous aggregate: per (role, day-of-week,
    hour-of-day) integer partials + one rounded mean latency.

    ``dow`` is 1=Sunday..7=Saturday (Spark's ``dayofweek``; the DuckDB
    twin uses ``dayofweek(ts)+1`` which is Sunday-based 0..6). Partials
    (n_turns, sums) re-aggregate exactly; ``mean_latency_us`` is derived
    last, the usual lattice discipline — as an INTEGER quotient
    (floor µs): a float division at ~1e10 µs differs across engines in
    the last ulp and round(x, 6) cannot absorb it, while the int64
    quotient is bit-identical everywhere and sub-µs precision of a mean
    latency is noise. FLOOR division specifically (DuckDB ``//``
    semantics): Spark's ``div`` truncates toward zero, which diverges
    from the oracle when sum_latency_us is negative — possible, since
    with_signals permits negative inter_time_us for out-of-order
    timestamps — so the quotient is adjusted down by 1 when the sum is
    negative with a nonzero remainder (n_turns = count(*) is always
    positive, so the adjustment is exact).
    """
    return (
        signals.groupBy(
            "role",
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("inter_time_us").cast("long").alias("sum_latency_us"),
            F.sum("text_len").cast("long").alias("sum_text_len"),
            F.sum("tool_call").cast("long").alias("sum_tool_calls"),
        )
        .select(
            "role",
            "dow",
            "hod",
            "n_turns",
            "sum_latency_us",
            "sum_text_len",
            "sum_tool_calls",
            F.expr(
                "sum_latency_us div n_turns - (CASE WHEN"
                " sum_latency_us < 0 AND sum_latency_us % n_turns <> 0"
                " THEN 1 ELSE 0 END)"
            )
            .cast("long")
            .alias("mean_latency_us"),
        )
    )


def level_shift_score(
    signals: DataFrame,
    value_col: str = "text_len",
    w: int = 8,
    threshold: int = 0,
) -> DataFrame:
    """Window-sliding changepoint score per turn (level-shift detection).

    For each turn i with a full trailing window (rows i-w+1..i) and a
    full leading window (rows i+1..i+w) in stable turn order, the score
    is the absolute difference of the two window SUMS — an exact int64
    quantity (the classic window-sliding changepoint statistic, mean
    shift scaled by the constant w, so ranking and thresholding are
    identical to the mean form but never touch a float until the final
    projection). ``is_shift`` compares integer-to-integer:
    |sum_after - sum_before| > threshold * w  <=>  |mean shift| >
    threshold, evaluated without division.

    Boundary turns (fewer than w rows on either side) are dropped, not
    flagged — a deliberate choice: a changepoint score over a partial
    window is biased toward the series edge.

    Physical shape: two ROWS-frame window passes over the canonical
    conv_id exchange (one sort, both frames reuse it); no join, no
    explode. Hot conversations serialize per the rolling.py skew note.
    No reference analog; the alerting companion of rolling_zscore.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    v = F.col(value_col).cast("long")
    order = Window.partitionBy("conv_id").orderBy("turn_idx")
    before = order.rowsBetween(-(w - 1), 0)
    after = order.rowsBetween(1, w)
    n_b = F.count(F.lit(1)).over(before).cast("long")
    n_a = F.count(F.lit(1)).over(after).cast("long")
    s_b = F.sum(v).over(before).cast("long")
    s_a = F.sum(v).over(after).cast("long")
    return (
        signals.select(
            "conv_id",
            "turn_idx",
            "ts",
            v.alias("value"),
            n_b.alias("n_before"),
            n_a.alias("n_after"),
            s_b.alias("sum_before"),
            s_a.alias("sum_after"),
        )
        .where((F.col("n_before") == w) & (F.col("n_after") == w))
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            "value",
            "sum_before",
            "sum_after",
            F.abs(F.col("sum_after") - F.col("sum_before"))
            .cast("long")
            .alias("shift_score_x_w"),
            F.round(
                (F.col("sum_after") - F.col("sum_before")).cast("double")
                / F.lit(float(w)),
                6,
            ).alias("mean_shift"),
            (
                F.abs(F.col("sum_after") - F.col("sum_before"))
                > F.lit(int(threshold) * w)
            ).alias("is_shift"),
        )
    )


def hist_drift_daily(
    signals: DataFrame, value_col: str = "inter_time_us"
) -> DataFrame:
    """Day-over-day distribution drift of an integer signal: the L1
    (total-variation x2) distance between consecutive days'
    power-of-two histograms — the "did today's latency distribution
    change shape, not just level" screen that catches what the
    mean/zscore monitors miss (a bimodal split leaves the mean flat).

    Bins are the binary length of the value (0 bin for values <= 0) —
    the same engine-exact integer rule as the latency/lifespan
    histograms. The L1 distance is kept EXACT in int64 until one
    final division: with c_l/c_r the per-bin counts and T_l/T_r the
    day totals,

        L1 = sum_bins |c_l * T_r - c_r * T_l| / (T_l * T_r)

    so the summation is over exact integers (no float accumulation
    order to disagree across engines); only the single division is
    float. Overflow bound: |c * T| < T^2 needs day volume T < ~3e9
    turns — beyond that, widen the two moments to decimal(38,0).

    Returns (day, total_l, total_r, l1) for each day whose SUCCESSOR
    day also has data (day pairs with a missing side are not drift,
    they are an outage — gap-shaped questions belong to
    seqshape.gap_outages). L1 is in [0, 2]; 0 = identical shapes.

    Shape at 100 TB: ONE (day, bin) aggregation over the corpus
    (map-side combine, <= 64 bins/day) — the consecutive-day pairing
    is NOT a self-join (which would scan the corpus twice): each tiny
    histogram row is exploded to its two pair roles (left of its own
    day, right of the preceding day) and merged by a second, <=
    128-rows-per-day aggregation; every structure after the first
    aggregation is per-day-constant-size.
    """
    v = F.col(value_col).cast("long")
    bin_col = (
        F.when(v <= 0, F.lit(0))
        .otherwise(F.length(F.conv(v.cast("string"), 10, 2)))
        .cast("int")
    )
    h = (
        signals.select(F.to_date("ts").alias("day"), bin_col.alias("bin"))
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    zero = F.lit(0).cast("long")
    sides = h.select(
        "bin",
        F.explode(
            F.array(
                F.struct(
                    F.col("day").alias("pair_day"),
                    F.col("cnt").alias("l"),
                    zero.alias("r"),
                ),
                F.struct(
                    F.date_sub("day", 1).alias("pair_day"),
                    zero.alias("l"),
                    F.col("cnt").alias("r"),
                ),
            )
        ).alias("s"),
    )
    j = (
        sides.select("bin", "s.pair_day", "s.l", "s.r")
        .groupBy("pair_day", "bin")
        .agg(
            F.sum("l").cast("long").alias("cnt_l"),
            F.sum("r").cast("long").alias("cnt_r"),
        )
    )
    wp = Window.partitionBy("pair_day")
    totals = j.select(
        "pair_day",
        "cnt_l",
        "cnt_r",
        F.sum("cnt_l").over(wp).cast("long").alias("total_l"),
        F.sum("cnt_r").over(wp).cast("long").alias("total_r"),
    )
    num = F.abs(
        F.col("cnt_l") * F.col("total_r") - F.col("cnt_r") * F.col("total_l")
    )
    agg = (
        totals.groupBy("pair_day")
        .agg(
            F.sum(num).cast("long").alias("num"),
            F.max("total_l").cast("long").alias("total_l"),
            F.max("total_r").cast("long").alias("total_r"),
        )
        .where((F.col("total_l") > 0) & (F.col("total_r") > 0))
    )
    return agg.select(
        F.col("pair_day").alias("day"),
        "total_l",
        "total_r",
        (
            F.col("num").cast("double")
            / (F.col("total_l").cast("double") * F.col("total_r").cast("double"))
        ).alias("l1"),
    )


def slo_burn_rate(
    signals: DataFrame,
    threshold_us: int = 300_000_000,
    budget_ppm: int = 1_000,
    burn_alert_tenths: int = 144,
    slow_window_hours: int = 6,
) -> DataFrame:
    """Multi-window SLO error-budget burn rate per hour — the Google
    SRE-workbook alerting rule (public: SRE Workbook ch. 5,
    multiwindow multi-burn-rate alerts) over the transcript latency
    signal.

    A turn is "bad" when its inter-arrival gap exceeds ``threshold_us``
    (the latency SLI); the SLO allows ``budget_ppm`` bad turns per
    million. Each hour emits its fast-window (1h) and slow-window
    (trailing ``slow_window_hours``) burn rates — bad-fraction divided
    by budget — and an alert flag that fires only when BOTH windows
    burn faster than ``burn_alert_tenths``/10 (default 14.4x, the
    standard page threshold), which suppresses both stale alerts (fast
    window already recovered) and flappy ones (slow window still
    within budget).

    Bit-determinism: the window partials are int64 counts; the alert
    predicate stays integral by cross-multiplying
    (10_000_000 * bad >= burn_alert_tenths * budget_ppm * n); the two
    burn columns are each ONE rounded float expression. Trailing
    windows range over the hourly aggregate rows that exist (hours
    with zero turns contribute nothing, identically in both engines).

    Physical shape at 100 TB: one map-side-combinable aggregation onto
    the hour key (#rows = corpus hours, tiny), then a single-partition
    range window over that aggregate — serial but proportional to the
    calendar, not the data (the concurrency.py carry argument).

    Emits one row per hour: ``hour_ts, n_turns, n_bad, n_slow,
    bad_slow, burn_fast, burn_slow, alert``.
    """
    hourly = (
        signals.select(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.when(F.col("inter_time_us") > int(threshold_us), 1)
            .otherwise(0)
            .alias("bad"),
        )
        .groupBy("hour_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("bad").cast("long").alias("n_bad"),
        )
    )
    w = (
        Window.orderBy(F.unix_timestamp("hour_ts"))
        .rangeBetween(-(int(slow_window_hours) - 1) * 3600, 0)
    )
    slow = hourly.select(
        "hour_ts",
        "n_turns",
        "n_bad",
        F.sum("n_turns").over(w).cast("long").alias("n_slow"),
        F.sum("n_bad").over(w).cast("long").alias("bad_slow"),
    )
    k = int(burn_alert_tenths) * int(budget_ppm)
    burn = (
        "round(CAST({bad} AS DOUBLE) * 1000000.0"
        " / (CAST({n} AS DOUBLE) * {ppm}.0), 6)"
    )
    return slow.select(
        "hour_ts",
        "n_turns",
        "n_bad",
        "n_slow",
        "bad_slow",
        F.expr(burn.format(bad="n_bad", n="n_turns", ppm=int(budget_ppm)))
        .alias("burn_fast"),
        F.expr(burn.format(bad="bad_slow", n="n_slow", ppm=int(budget_ppm)))
        .alias("burn_slow"),
        F.expr(
            f"CAST(CASE WHEN 10000000 * n_bad >= {k} * n_turns"
            f" AND 10000000 * bad_slow >= {k} * n_slow"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("alert"),
    )


def seasonal_residual_outliers(signals: DataFrame) -> DataFrame:
    """Seasonally-adjusted robust outlier detection on the hourly
    count series: subtract each hour-of-day's own nearest-rank median
    (so 3am is judged against 3am, not against noon) and flag hours
    whose residual falls outside the Tukey fences of the residual
    distribution.

    This is the detector the plain z-score (rolling_zscore) and the
    raw Tukey fences (robust.tukey_fences_by_bucket) both miss on
    diurnal data: a quiet night hour that matches every other night is
    NOT an anomaly even though it is far below the all-day mean.

    Everything shuffled is exact int64: hourly counts, per-hour-of-day
    nearest-rank (lower) medians with a (n, hour_ts) total order,
    integer residuals, and integral fences — a residual r is an
    outlier iff 2r < 2q1 - 3(q3-q1) or 2r > 2q3 + 3(q3-q1), the
    robust.tukey scaling trick that keeps 1.5*IQR in integers. No
    floats anywhere.

    Scale shape: the raw corpus collapses to the HOURLY rollup first
    (map-side combinable count) — everything after runs on a
    calendar-bounded table (8,760 rows/year regardless of corpus
    size): one 24-group rank window for the profile, one broadcast
    join back, one global rank window for the quartiles. The single
    unpartitioned window is safe BECAUSE the series is
    calendar-bounded (the gini_turns precedent).

    Emits ``hour_ts, n_points, hod, med_hod, residual, is_outlier``
    for every hour present in the data.
    """
    from pyspark.sql import Window

    hourly = signals.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n_points"))
    hourly = hourly.select(
        "hour_ts", "n_points", F.hour("hour_ts").cast("long").alias("hod")
    )
    w_rk = Window.partitionBy("hod").orderBy("n_points", "hour_ts")
    w_tot = Window.partitionBy("hod")
    ranked = hourly.select(
        "hod",
        "n_points",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_tot).alias("n_hours"),
    )
    profile = ranked.filter(
        F.col("rk") == F.floor((F.col("n_hours") + F.lit(1)) / F.lit(2))
    ).select("hod", F.col("n_points").alias("med_hod"))
    resid = hourly.join(F.broadcast(profile), "hod").select(
        "hour_ts",
        "n_points",
        "hod",
        "med_hod",
        (F.col("n_points") - F.col("med_hod")).alias("residual"),
    )
    # bounded global windows: frame is the per-hour aggregate (calendar
    # hours of the horizon), not the raw points
    w_g_rk = Window.orderBy("residual", "hour_ts")
    w_g = Window.partitionBy()
    fenced = resid.select(
        "hour_ts",
        "n_points",
        "hod",
        "med_hod",
        "residual",
        F.row_number().over(w_g_rk).alias("grk"),
        F.count("*").over(w_g).alias("gn"),
    )
    # nearest-rank quartiles of the residual distribution, as columns
    q1 = F.max(
        F.when(F.col("grk") == F.floor((F.col("gn") + 3) / 4), F.col("residual"))
    ).over(w_g)
    q3 = F.max(
        F.when(
            F.col("grk") == F.floor((3 * F.col("gn") + 3) / 4), F.col("residual")
        )
    ).over(w_g)
    out = fenced.select(
        "hour_ts",
        "n_points",
        "hod",
        "med_hod",
        "residual",
        q1.alias("q1"),
        q3.alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return out.select(
        "hour_ts",
        "n_points",
        "hod",
        "med_hod",
        "residual",
        (
            (F.lit(2) * F.col("residual") < F.lit(2) * F.col("q1") - F.lit(3) * iqr)
            | (F.lit(2) * F.col("residual") > F.lit(2) * F.col("q3") + F.lit(3) * iqr)
        ).alias("is_outlier"),
    )


def residual_autocorr_hourly(signals: DataFrame) -> DataFrame:
    """Lag-1 autocorrelation of the seasonally-adjusted hourly count
    series — the model-adequacy check on top of
    :func:`seasonal_residual_outliers`: if the hour-of-day median
    profile explains the data, what remains should be white
    (autocorr ~ 0); persistent residual correlation says a slower
    trend or weekly cycle is still unmodeled.

    The residual construction is IDENTICAL to
    seasonal_residual_outliers (hourly counts minus the hour-of-day
    nearest-rank median); successive OBSERVED hours pair by row order
    of the calendar-bounded series, and the house exact Pearson
    sufficient statistics (stats._corr_expr) score the single global
    sample. Emits ONE row: ``n_pairs, sx, sy, sxy, sxx, syy,
    autocorr`` (NULL autocorr when degenerate).
    """
    from pyspark.sql import Window

    from aroma_spark.operators.stats import _corr_expr

    hourly = signals.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count("*").cast("long").alias("n_points"))
    hourly = hourly.select(
        "hour_ts", "n_points", F.hour("hour_ts").cast("long").alias("hod")
    )
    w_rk = Window.partitionBy("hod").orderBy("n_points", "hour_ts")
    w_tot = Window.partitionBy("hod")
    ranked = hourly.select(
        "hod",
        "n_points",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_tot).alias("n_hours"),
    )
    profile = ranked.filter(
        F.col("rk") == F.floor((F.col("n_hours") + F.lit(1)) / F.lit(2))
    ).select("hod", F.col("n_points").alias("med_hod"))
    resid = hourly.join(F.broadcast(profile), "hod").select(
        "hour_ts", (F.col("n_points") - F.col("med_hod")).alias("r")
    )
    w_seq = Window.orderBy("hour_ts")
    paired = resid.select(
        F.lag("r").over(w_seq).alias("x"), F.col("r").alias("y")
    ).where(F.col("x").isNotNull())
    agg = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return agg.select(
        "n_pairs",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        _corr_expr(
            F.col("n_pairs"), F.col("sx"), F.col("sy"),
            F.col("sxy"), F.col("sxx"), F.col("syy"),
        ).alias("autocorr"),
    )


def peak_hour_by_dow(signals: DataFrame) -> DataFrame:
    """The busiest hour of each weekday: deterministic argmax over
    the (dow, hod) turn-count matrix (ties break to the EARLIER
    hour) with the peak's share of its weekday — where the capacity
    planner draws the scaling schedule from.

    ONE map-side combinable aggregate into at most 168 rows, then
    the argmax and day totals as window functions OVER that tiny
    matrix. ``dow`` follows Spark's ``dayofweek`` (1=Sunday; DuckDB
    twin maps ``dayofweek(ts)+1``). Counts exact int64; the share is
    one shared float.

    Emits ``dow, peak_hod, peak_turns, day_turns, peak_share``.
    """
    from pyspark.sql import Window

    cell = signals.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
    w = Window.partitionBy("dow").orderBy(
        F.col("n_turns").desc(), F.col("hod").asc()
    )
    wd = Window.partitionBy("dow")
    ranked = cell.select(
        "dow",
        "hod",
        "n_turns",
        F.row_number().over(w).alias("rn"),
        F.sum("n_turns").over(wd).cast("long").alias("day_turns"),
    ).where(F.col("rn") == 1)
    return ranked.select(
        "dow",
        F.col("hod").alias("peak_hod"),
        F.col("n_turns").alias("peak_turns"),
        "day_turns",
        F.expr(
            "round(CAST(n_turns AS DOUBLE) / CAST(day_turns AS DOUBLE), 6)"
        ).alias("peak_share"),
    )


def latency_spread_daily(signals: DataFrame) -> DataFrame:
    """Daily latency spread: min / max / range of the inter-turn gap
    with the integer-quotient mean and the range-to-mean ratio — the
    one-line dispersion row the variance-family operators
    (mad_outliers_daily, gmd) drill into.

    ONE map-side combinable aggregate into |days| rows. Exact int64
    µs; integer-quotient mean (1e11 magnitudes; under the canonical
    (ts, event_id) ordering inter_time_us >= 0, so truncation IS
    floor — the signal_corr precondition); the ratio is one shared
    float over exact ints, guarded for zero-sum days.

    Emits ``day_ts, n_turns, min_us, max_us, range_us, mean_us,
    spread_ratio``.
    """
    agg = signals.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("inter_time_us").cast("long").alias("min_us"),
        F.max("inter_time_us").cast("long").alias("max_us"),
        F.sum("inter_time_us").cast("long").alias("sum_us"),
    )
    return agg.select(
        "day_ts",
        "n_turns",
        "min_us",
        "max_us",
        (F.col("max_us") - F.col("min_us")).cast("long").alias("range_us"),
        F.expr("CAST(sum_us div n_turns AS BIGINT)").alias("mean_us"),
        F.expr(
            "CASE WHEN sum_us > 0 THEN round(CAST(max_us - min_us"
            " AS DOUBLE) * CAST(n_turns AS DOUBLE)"
            " / CAST(sum_us AS DOUBLE), 6) END"
        ).alias("spread_ratio"),
    )


def burst_user_daily(events: DataFrame) -> DataFrame:
    """Rate-limit / abuse watch: for each day, the single heaviest
    (user, hour) burst — who fired the most events in one hour, how
    many, and what share of the day that burst was. Deterministic
    argmax (count DESC, user ASC, hour ASC).

    ONE map-side combinable (user, hour) aggregate — 10^12 events
    collapse before any wide operation — then the per-day argmax and
    total as window functions over that (much smaller) frame. Exact
    int64.

    Emits ``day_ts, burst_user_id, burst_hour_ts, burst_events,
    day_events, burst_share``.
    """
    from pyspark.sql import Window

    cell = events.groupBy(
        F.col("user_id"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    cell = cell.withColumn(
        "day_ts", F.date_trunc("day", F.col("hour_ts"))
    )
    w = Window.partitionBy("day_ts").orderBy(
        F.col("n_events").desc(),
        F.col("user_id").asc(),
        F.col("hour_ts").asc(),
    )
    wd = Window.partitionBy("day_ts")
    ranked = cell.select(
        "day_ts",
        "user_id",
        "hour_ts",
        "n_events",
        F.row_number().over(w).alias("rn"),
        F.sum("n_events").over(wd).cast("long").alias("day_events"),
    ).where(F.col("rn") == 1)
    return ranked.select(
        "day_ts",
        F.col("user_id").alias("burst_user_id"),
        F.col("hour_ts").alias("burst_hour_ts"),
        F.col("n_events").alias("burst_events"),
        "day_events",
        F.expr(
            "round(CAST(n_events AS DOUBLE) / CAST(day_events AS DOUBLE), 6)"
        ).alias("burst_share"),
    )


def latency_by_len_bucket(signals: DataFrame, cap: int = 64) -> DataFrame:
    """Does long text arrive slowly? Inter-turn latency profiled by
    EXACT text length (capped at ``cap`` so the tail pools) — the
    size-vs-latency curve that says whether generation length drives
    wall-clock. Exact lengths rather than power-of-two buckets: this
    corpus's text column is a narrow JSON payload whose lengths span
    one power of two, so log buckets would collapse the whole curve
    into a single row.

    ONE map-side combinable aggregate into at most ``cap``+1 rows.
    Exact int64; integer-quotient mean (nonnegative gaps under
    canonical ordering).

    Emits ``text_len, n_turns, sum_latency_us, mean_latency_us``.
    """
    bucketed = signals.select(
        F.least(F.col("text_len"), F.lit(int(cap)))
        .cast("long")
        .alias("text_len"),
        "inter_time_us",
    )
    agg = bucketed.groupBy("text_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("inter_time_us").cast("long").alias("sum_latency_us"),
    )
    return agg.select(
        "text_len",
        "n_turns",
        "sum_latency_us",
        F.expr("CAST(sum_latency_us div n_turns AS BIGINT)").alias(
            "mean_latency_us"
        ),
    )
