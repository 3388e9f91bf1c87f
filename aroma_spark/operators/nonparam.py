"""Nonparametric two-sample / robust-trend statistics: exact
Kolmogorov-Smirnov day-over-day drift, exact Mann-Whitney U between
two roles, and the Theil-Sen median pairwise slope per conversation.

Complements the parametric drift family (anomaly.latency_drift_daily
histogram L1, robust.skew_kurt_by_bucket moments) with the classic
distribution-free tests: KS asks "did the whole distribution move?"
without binning, Mann-Whitney asks "does one role stochastically
dominate the other?" without normality, and Theil-Sen gives a trend
slope immune to outliers that least-squares (stats.trend) is not.

House bit-determinism discipline (operators/stats.py): every shuffled
quantity is an exact int64 count or cross-product of counts —
the KS statistic's numerator ``max |cum_prev*n_cur - cum_cur*n_prev|``,
Mann-Whitney's ``2*U = 2*wins + ties``, Theil-Sen's selected slope as
a raw (dy, dx) integer pair — and each emitted float is ONE fixed
expression shared verbatim with the DuckDB twin (the tau_b_sql
pattern of operators/ordinal.py).

Physical shape at 100 TB:
- KS and Mann-Whitney are LINEAR: no self-join anywhere. Values are
  first collapsed to (bucket, value) -> count (map-side combinable),
  then one window cumulative sum per bucket orders the ECDF, then one
  final aggregate. The classic O(n^2) pair formulation of U is
  replaced by "wins = sum over values of c_a(v) * (#b strictly
  below)", which the exclusive cumulative sum provides in one pass.
- The day-over-day KS pairing duplicates each row into (its own day,
  the next day) tags with a UNION — two narrow projections, no join;
  a day's distribution meets its predecessor's purely by shuffle key.
- Theil-Sen is the one quadratic member, and its self-join is
  conv_id-confined exactly like ordinal.kendall_tau (pairs never
  cross conversations; AQE skew-join splits hot conversations).
- int64 headroom: the KS/U cross terms are bounded by
  n_prev*n_cur per day (< 9.2e18 while both days stay < ~3e9 rows);
  beyond that, pre-bucket values or split days before comparing.

No reference analog (the reference computes no hypothesis-test
statistics); natural extensions of the derived-signal family over the
fixed signal schema of operators/signals.py (reference
src/aroma/preprocessing/intertimes.py:44-80 for the inter-time
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# a defined pairwise-slope median needs a few points (family-wide
# threshold shared with ordinal.kendall_tau)
MIN_TURNS = 4


def ks_d_sql() -> str:
    """The ONE float expression for the KS statistic over exact int64
    columns d_num, n_prev, n_cur — shared verbatim between Spark and
    the DuckDB twin. D = d_num / (n_prev * n_cur)."""
    return (
        "round(CAST(d_num AS DOUBLE)"
        " / (CAST(n_prev AS DOUBLE) * CAST(n_cur AS DOUBLE)), 6)"
    )


def auc_sql() -> str:
    """The ONE float expression for the Mann-Whitney common-language
    effect size over exact int64 columns u2_a, n_a, n_b: AUC =
    U_a / (n_a*n_b) with U_a = u2_a/2 (ties counted half)."""
    return (
        "round(CAST(u2_a AS DOUBLE)"
        " / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"
    )


def slope_sql() -> str:
    """The ONE float expression for the Theil-Sen slope over the exact
    int64 pair (slope_num, slope_den); slope_den > 0 always because
    turn_idx is strictly increasing inside a conversation."""
    return (
        "round(CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE), 6)"
    )


def ks_day_drift(signals: DataFrame, value_col: str = "text_len") -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between each
    calendar day's ``value_col`` distribution and the previous day's.

    For each day d present together with day d-1, the two samples'
    ECDFs are compared at every observed value v:

        D = max_v | F_prev(v) - F_cur(v) |
          = max_v | cum_prev(v)*n_cur - cum_cur(v)*n_prev | / (n_prev*n_cur)

    The numerator (``d_num``) is exact int64; only the final division
    is float (:func:`ks_d_sql`). No binning — this is the true KS
    statistic, sensitive to shifts histogram-L1 drift can miss.

    Emits one row per consecutive-day pair:
    ``day_ts, n_prev, n_cur, d_num, ks_d`` (day_ts = the LATER day).
    """
    base = signals.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col(value_col).cast("long").alias("v"),
    )
    cur = base.select(
        F.col("day").alias("pair_day"),
        "v",
        F.lit(1).alias("c_cur"),
        F.lit(0).alias("c_prev"),
    )
    prev = base.select(
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("pair_day"),
        "v",
        F.lit(0).alias("c_cur"),
        F.lit(1).alias("c_prev"),
    )
    # (pair_day, v) -> side counts; map-side combinable, no join
    g = (
        cur.unionByName(prev)
        .groupBy("pair_day", "v")
        .agg(
            F.sum("c_cur").cast("long").alias("c_cur"),
            F.sum("c_prev").cast("long").alias("c_prev"),
        )
    )
    w_ecdf = (
        Window.partitionBy("pair_day")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("pair_day")
    stepped = g.select(
        "pair_day",
        F.sum("c_cur").over(w_ecdf).alias("cum_cur"),
        F.sum("c_prev").over(w_ecdf).alias("cum_prev"),
        F.sum("c_cur").over(w_tot).alias("n_cur"),
        F.sum("c_prev").over(w_tot).alias("n_prev"),
    )
    out = (
        stepped.groupBy("pair_day")
        .agg(
            F.max("n_prev").cast("long").alias("n_prev"),
            F.max("n_cur").cast("long").alias("n_cur"),
            F.max(
                F.abs(
                    F.col("cum_prev") * F.col("n_cur")
                    - F.col("cum_cur") * F.col("n_prev")
                )
            )
            .cast("long")
            .alias("d_num"),
        )
        .filter((F.col("n_prev") > 0) & (F.col("n_cur") > 0))
    )
    return out.select(
        F.col("pair_day").alias("day_ts"),
        "n_prev",
        "n_cur",
        "d_num",
        F.expr(ks_d_sql()).alias("ks_d"),
    )


def mann_whitney_daily(
    signals: DataFrame,
    value_col: str = "inter_time_us",
    role_a: str = "assistant",
    role_b: str = "user",
) -> DataFrame:
    """Exact Mann-Whitney U between two roles' ``value_col`` samples
    per calendar day, without materializing any pair.

    U_a counts pairs (x in a, y in b) with x > y, plus half the ties.
    Collapsing to per-value counts c_a(v), c_b(v) and ordering by v,
    the exclusive cumulative sum of c_b gives "#b strictly below v" in
    one pass:  wins_a = sum_v c_a(v) * cumB_excl(v),
               ties_pairs = sum_v c_a(v) * c_b(v).
    ``u2_a = 2*wins_a + ties_pairs`` keeps the half-tie exactly in
    int64; AUC = u2_a / (2 n_a n_b) is the one float
    (:func:`auc_sql`) — the common-language effect size P(a > b).

    Emits one row per day where BOTH roles appear:
    ``day_ts, n_a, n_b, wins_a, ties_pairs, u2_a, auc_a``.
    """
    base = signals.filter(F.col("role").isin(role_a, role_b)).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col(value_col).cast("long").alias("v"),
        F.when(F.col("role") == role_a, F.lit(1)).otherwise(F.lit(0)).alias("in_a"),
        F.when(F.col("role") == role_b, F.lit(1)).otherwise(F.lit(0)).alias("in_b"),
    )
    g = base.groupBy("day", "v").agg(
        F.sum("in_a").cast("long").alias("c_a"),
        F.sum("in_b").cast("long").alias("c_b"),
    )
    w_ecdf = (
        Window.partitionBy("day")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = g.select(
        "day",
        "c_a",
        "c_b",
        (F.sum("c_b").over(w_ecdf) - F.col("c_b")).alias("cum_b_excl"),
    )
    out = (
        stepped.groupBy("day")
        .agg(
            F.sum("c_a").cast("long").alias("n_a"),
            F.sum("c_b").cast("long").alias("n_b"),
            F.sum(F.col("c_a") * F.col("cum_b_excl")).cast("long").alias("wins_a"),
            F.sum(F.col("c_a") * F.col("c_b")).cast("long").alias("ties_pairs"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    return out.select(
        F.col("day").alias("day_ts"),
        "n_a",
        "n_b",
        "wins_a",
        "ties_pairs",
        (F.lit(2) * F.col("wins_a") + F.col("ties_pairs"))
        .cast("long")
        .alias("u2_a"),
        F.expr(auc_sql()).alias("auc_a"),
    )


def theil_sen(
    signals: DataFrame,
    y_col: str = "text_len",
    min_turns: int = MIN_TURNS,
) -> DataFrame:
    """Theil-Sen robust trend per conversation: the median of all
    pairwise slopes (y_j - y_i) / (turn_idx_j - turn_idx_i), i < j.

    The selected slope is reported as its RAW integer pair
    ``(slope_num, slope_den)``: pairs are totally ordered by
    (dy/dx as double, dy, dx) — the double puts equal rationals
    adjacent, the integer tie-break makes row_number deterministic,
    and the nearest-rank (lower) median ``rk = (n_pairs+1)//2`` then
    selects a well-defined value in both engines. Only the final
    num/den division is float (:func:`slope_sql`).

    Emits one row per conversation with >= ``min_turns`` turns:
    ``conv_id, n_turns, n_pairs, slope_num, slope_den, slope``.
    """
    vr = signals.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    nn = vr.groupBy("conv_id").agg(F.count("*").cast("long").alias("n_turns"))
    nn = nn.filter(F.col("n_turns") >= min_turns)
    a = vr.alias("a")
    b = vr.alias("b")
    pairs = a.join(b, "conv_id").filter(F.col("a.x") < F.col("b.x")).select(
        "conv_id",
        (F.col("b.y") - F.col("a.y")).alias("dy"),
        (F.col("b.x") - F.col("a.x")).alias("dx"),
    )
    w = Window.partitionBy("conv_id").orderBy(
        (F.col("dy").cast("double") / F.col("dx").cast("double")).asc(),
        F.col("dy").asc(),
        F.col("dx").asc(),
    )
    w_tot = Window.partitionBy("conv_id")
    ranked = pairs.select(
        "conv_id",
        "dy",
        "dx",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(w_tot).alias("n_pairs"),
    )
    target = F.floor((F.col("n_pairs") + F.lit(1)) / F.lit(2)).cast("long")
    med = ranked.groupBy("conv_id").agg(
        F.max("n_pairs").cast("long").alias("n_pairs"),
        F.max(F.when(F.col("rk") == target, F.col("dy")))
        .cast("long")
        .alias("slope_num"),
        F.max(F.when(F.col("rk") == target, F.col("dx")))
        .cast("long")
        .alias("slope_den"),
    )
    return med.join(nn, "conv_id").select(
        "conv_id",
        "n_turns",
        "n_pairs",
        "slope_num",
        "slope_den",
        F.expr(slope_sql()).alias("slope"),
    )


def runs_z_sql() -> str:
    """The ONE float expression for the Wald-Wolfowitz z-score over
    exact int64 columns n_plus, n_minus, n_runs. With n = n1+n2,
    mu = 1 + 2 n1 n2 / n and var = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n-1));
    NULL when the variance is not positive (all signs equal or n < 2)."""
    n1 = "CAST(n_plus AS DOUBLE)"
    n2 = "CAST(n_minus AS DOUBLE)"
    n = f"({n1} + {n2})"
    two = f"(2.0 * {n1} * {n2})"
    mu = f"(1.0 + {two} / {n})"
    var = f"({two} * ({two} - {n}) / ({n} * {n} * ({n} - 1.0)))"
    return (
        f"CASE WHEN n_plus > 0 AND n_minus > 0 AND {two} > {n} THEN"
        f" round((CAST(n_runs AS DOUBLE) - {mu}) / sqrt({var}), 6) END"
    )


def runs_test(
    signals: DataFrame,
    value_col: str = "text_len",
    min_turns: int = MIN_TURNS,
) -> DataFrame:
    """Wald-Wolfowitz runs test per conversation: is the sequence of
    ``value_col`` observations randomly scattered about its own median,
    or does it clump (fewer runs) / oscillate (more runs) than chance?

    Standard construction: each turn is marked +1 above / -1 below the
    conversation's nearest-rank (lower) median, exact ties with the
    median are DROPPED, and ``n_runs`` counts maximal same-sign blocks
    in turn order. n_plus / n_minus / n_runs are exact int64; the
    z-score is one shared float expression (:func:`runs_z_sql`).

    Scale shape: one rank window to find the median, one conv_id-keyed
    join back (both sides already partitioned by conv_id — AQE turns
    the second exchange into a reuse), one lag window, one aggregate.
    No self-join, linear in rows.

    Emits ``conv_id, n_turns, median_value, n_plus, n_minus, n_runs,
    z`` for conversations with >= ``min_turns`` turns.
    """
    vr = signals.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col(value_col).cast("long").alias("v"),
    )
    w_rk = Window.partitionBy("conv_id").orderBy("v", "turn_idx")
    w_tot = Window.partitionBy("conv_id")
    ranked = vr.select(
        "conv_id",
        "turn_idx",
        "v",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_tot).alias("n_turns"),
    ).filter(F.col("n_turns") >= min_turns)
    med = ranked.filter(
        F.col("rk") == F.floor((F.col("n_turns") + F.lit(1)) / F.lit(2))
    ).select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("v").alias("median_value"),
    )
    signed = (
        ranked.select("conv_id", "turn_idx", "v")
        .join(med, "conv_id")
        .filter(F.col("v") != F.col("median_value"))
        .select(
            "conv_id",
            "n_turns",
            "median_value",
            "turn_idx",
            F.when(F.col("v") > F.col("median_value"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    w_seq = Window.partitionBy("conv_id").orderBy("turn_idx")
    stepped = signed.select(
        "conv_id",
        "n_turns",
        "median_value",
        "s",
        F.when(
            F.lag("s").over(w_seq).isNull()
            | (F.lag("s").over(w_seq) != F.col("s")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_run_start"),
    )
    agg = stepped.groupBy("conv_id", "n_turns", "median_value").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_plus"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_minus"),
        F.sum("is_run_start").cast("long").alias("n_runs"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "median_value",
        "n_plus",
        "n_minus",
        "n_runs",
        F.expr(runs_z_sql()).alias("z"),
    )


def phi_sql() -> str:
    """The ONE float expression for the 2x2 phi coefficient over exact
    int64 cells a, b, c, d — every product taken in DOUBLE so no
    intermediate overflows int64. NULL when any margin is zero."""
    da, db, dc, dd = (f"CAST({x} AS DOUBLE)" for x in "abcd")
    num = f"({da} * {dd} - {db} * {dc})"
    den = (
        f"sqrt(({da} + {db}) * ({dc} + {dd})"
        f" * ({da} + {dc}) * ({db} + {dd}))"
    )
    return (
        "CASE WHEN (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0"
        f" AND (b + d) > 0 THEN round({num} / {den}, 6) END"
    )


def log_odds_sql() -> str:
    """The ONE float expression for the 2x2 log odds ratio over exact
    int64 cells a, b, c, d; NULL when any cell is zero (the classical
    estimator is undefined there)."""
    return (
        "CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN"
        " round(ln((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))"
        " / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))), 6) END"
    )


def phi_association_daily(
    signals: DataFrame,
    role_a: str = "assistant",
    role_b: str = "user",
) -> DataFrame:
    """Per-day 2x2 association between role and tool use: does
    ``role_a`` call tools disproportionately more than ``role_b``?

    The contingency table is four exact int64 cells —
    a = (role_a, tool), b = (role_a, no tool), c = (role_b, tool),
    d = (role_b, no tool) — from ONE linear aggregation. phi (the 2x2
    Pearson correlation, equal to sqrt(chi2/N)) and the log odds ratio
    are each one shared float expression (:func:`phi_sql` /
    :func:`log_odds_sql`) so both engines agree bitwise.

    Emits ``day_ts, a, b, c, d, phi, log_odds`` for days where both
    roles appear.
    """
    base = signals.filter(F.col("role").isin(role_a, role_b)).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("role"),
        F.col("tool_call").cast("long").alias("tc"),
    )
    agg = (
        base.groupBy("day")
        .agg(
            F.sum(
                F.when((F.col("role") == role_a) & (F.col("tc") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("a"),
            F.sum(
                F.when((F.col("role") == role_a) & (F.col("tc") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("b"),
            F.sum(
                F.when((F.col("role") == role_b) & (F.col("tc") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("c"),
            F.sum(
                F.when((F.col("role") == role_b) & (F.col("tc") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("d"),
        )
        .filter((F.col("a") + F.col("b") > 0) & (F.col("c") + F.col("d") > 0))
    )
    return agg.select(
        F.col("day").alias("day_ts"),
        "a",
        "b",
        "c",
        "d",
        F.expr(phi_sql()).alias("phi"),
        F.expr(log_odds_sql()).alias("log_odds"),
    )


def two_prop_z_sql() -> str:
    """The ONE float expression for the two-proportion z-test over
    exact int64 columns a_cur, n_cur, a_prev, n_prev (successes and
    trials for the two days): pooled
    p = (a_cur+a_prev)/(n_cur+n_prev),
    z = (a_cur/n_cur - a_prev/n_prev) / sqrt(p(1-p)(1/n_cur+1/n_prev));
    NULL when the pooled rate is degenerate (0 or 1) or either day is
    empty."""
    ac = "CAST(a_cur AS DOUBLE)"
    nc = "CAST(n_cur AS DOUBLE)"
    ap = "CAST(a_prev AS DOUBLE)"
    np_ = "CAST(n_prev AS DOUBLE)"
    p = f"(({ac} + {ap}) / ({nc} + {np_}))"
    return (
        "CASE WHEN n_cur > 0 AND n_prev > 0"
        " AND a_cur + a_prev > 0 AND a_cur + a_prev < n_cur + n_prev THEN"
        f" round(({ac} / {nc} - {ap} / {np_})"
        f" / sqrt({p} * (1.0 - {p}) * (1.0 / {nc} + 1.0 / {np_})), 6)"
        " END"
    )


def tool_rate_ztest_daily(signals: DataFrame) -> DataFrame:
    """Did the tool-call RATE really change overnight? The classic
    two-proportion z-test between each day's tool-call fraction and
    the previous day's — the across-days companion to the within-day
    2x2 association (:func:`phi_association_daily`), and the
    guard against eyeballing "3.1% vs 3.4%" on unequal sample sizes.

    The day pairing reuses the KS-drift union trick (each day's
    (successes, trials) row participates as "cur" of itself and
    "prev" of the next day — no join), so the whole operator is two
    aggregations. Counts exact int64; z is one shared float
    (:func:`two_prop_z_sql`).

    Emits ``day_ts, n_prev, a_prev, n_cur, a_cur, z`` per day whose
    predecessor is present.
    """
    daily = signals.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("tool_call").cast("long").alias("a"),
    )
    cur = daily.select(
        F.col("day").alias("pair_day"),
        F.col("n").alias("n_cur"),
        F.col("a").alias("a_cur"),
        F.lit(None).cast("long").alias("n_prev"),
        F.lit(None).cast("long").alias("a_prev"),
    )
    prev = daily.select(
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("pair_day"),
        F.lit(None).cast("long").alias("n_cur"),
        F.lit(None).cast("long").alias("a_cur"),
        F.col("n").alias("n_prev"),
        F.col("a").alias("a_prev"),
    )
    paired = (
        cur.unionByName(prev)
        .groupBy("pair_day")
        .agg(
            F.max("n_prev").cast("long").alias("n_prev"),
            F.max("a_prev").cast("long").alias("a_prev"),
            F.max("n_cur").cast("long").alias("n_cur"),
            F.max("a_cur").cast("long").alias("a_cur"),
        )
        .filter(F.col("n_prev").isNotNull() & F.col("n_cur").isNotNull())
    )
    return paired.select(
        F.col("pair_day").alias("day_ts"),
        "n_prev",
        "a_prev",
        "n_cur",
        "a_cur",
        F.expr(two_prop_z_sql()).alias("z"),
    )
