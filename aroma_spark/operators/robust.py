"""Robust (rank/median-based) statistics per time bucket and exact
CUSUM changepoint location per conversation.

The outlier-resistant complement to the moment family
(operators/stats.py): the classic 3-sigma z-score (anomaly.zscore_*)
is itself dragged by the outliers it hunts, so production monitors use
the median / MAD pair — a 50% breakdown point instead of 0% — and the
CUSUM statistic locates WHERE a level shift happened, not just that
one did (anomaly.level_shift_score flags the neighborhood; this names
the split turn).

House bit-determinism discipline (see operators/stats.py): medians are
EXACT lower-medians selected by rank over a total order (value,
conv_id, turn_idx) — a real row, never an interpolated float — so the
outlier test |x - med| > k * MAD compares int64s exactly; CUSUM is
kept integral by scaling the mean-deviation prefix sums by n
(C_k = n*prefix_k - k*S); skewness/kurtosis aggregate exact int64
power sums S1..S4 and combine them in ONE fixed double expression
shared verbatim (F.expr) with the DuckDB twin.

Overflow bounds (int64, documented like stats.signal_corr):
- CUSUM: |n*prefix - k*S| <= n^2 * max|x|; with text_len <= 2^20 a
  conversation holds ~2^21 (~2M) turns before saturation.
- S4: n * max|x|^4 < 2^63 requires the clamp — values are winsorized
  at ``clamp`` (default 2^10), giving n <= 2^23 (~8M) rows/bucket
  headroom; the clamp is part of the operator contract (documented
  winsorized moments, standard practice for heavy-tail telemetry).

Physical shape at 100 TB: the bucket medians are sort-selections on
the bucket key (#buckets = #days — tiny output), joined back
broadcast; CUSUM rides the canonical conv_id exchange every other
per-conversation operator shares (one window pass + one aggregation).

No reference analog (the reference computes no robust statistics);
natural extensions of the north_star's derived-signal family over the
fixed signal schema of operators/signals.py (reference
src/aroma/preprocessing/intertimes.py:44-80 for the inter-time
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# a defined (non-degenerate) CUSUM / moment needs a few points
MIN_TURNS = 4


def _lower_median(
    df: DataFrame, key: str, value: str, out: str
) -> DataFrame:
    """Exact lower-median of ``value`` per ``key``: the row at 1-based
    rank floor((n+1)/2) in (value, conv_id, turn_idx) order — the same
    deterministic rank-selection as stats.exact_median_by_bucket."""
    w = Window.partitionBy(key).orderBy(
        F.col(value), F.col("conv_id"), F.col("turn_idx")
    )
    ranked = df.select(
        key,
        value,
        "conv_id",
        "turn_idx",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy(key))
        .cast("long")
        .alias("n_points"),
    )
    return ranked.where(F.col("rk") == F.expr("(n_points + 1) DIV 2")).select(
        key, "n_points", F.col(value).alias(out)
    )


def mad_outliers_by_bucket(
    signals: DataFrame,
    value_col: str = "text_len",
    unit: str = "day",
    k: int = 3,
) -> DataFrame:
    """Median / MAD / robust-outlier count of an integer signal per
    time bucket — "how many points sat more than ``k`` MADs from the
    day's median".

    Two exact rank-selections (median, then median of absolute
    deviations), both lower-medians over a total order, so every
    quantity is int64 and the outlier predicate |x - med| > k*MAD is
    an exact integer comparison — no float ever shuffles and the
    DuckDB twin matches bit-for-bit. A constant bucket has MAD = 0 and
    then every x != med is an outlier (the standard MAD degeneracy;
    callers who dislike it filter mad > 0).

    Emits one row per bucket: ``bucket_ts, n_points, median_<col>,
    mad, n_outliers, max_abs_dev``.
    """
    x = F.col(value_col).cast("long").alias("v")
    base = signals.select(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
        x,
        "conv_id",
        "turn_idx",
    )
    med = _lower_median(base, "bucket_ts", "v", "med")
    dev = base.join(F.broadcast(med), "bucket_ts").select(
        "bucket_ts",
        "conv_id",
        "turn_idx",
        "med",
        F.abs(F.col("v") - F.col("med")).alias("d"),
    )
    mad = _lower_median(dev, "bucket_ts", "d", "mad").select(
        "bucket_ts", "mad"
    )
    return (
        dev.join(F.broadcast(mad), "bucket_ts")
        .groupBy("bucket_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("med").cast("long").alias(f"median_{value_col}"),
            F.min("mad").cast("long").alias("mad"),
            F.sum(
                F.when(F.col("d") > F.lit(int(k)) * F.col("mad"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.max("d").cast("long").alias("max_abs_dev"),
        )
    )


def tukey_fences_by_bucket(
    signals: DataFrame,
    value_col: str = "text_len",
    unit: str = "day",
) -> DataFrame:
    """Exact boxplot five-number summary + Tukey-fence outlier counts
    of an integer signal per time bucket.

    Quartiles are nearest-rank (ceil) selections over the same total
    order as :func:`mad_outliers_by_bucket`: Q1 at 1-based rank
    ceil(n/4) = (n+3) DIV 4, median at ceil(n/2) = (n+1) DIV 2, Q3 at
    ceil(3n/4) = (3n+3) DIV 4 — real rows, never interpolated, so all
    five numbers are int64. The 1.5*IQR fences stay integral by
    cross-multiplying: x is a low outlier iff 2x < 2*Q1 - 3*IQR and a
    high outlier iff 2x > 2*Q3 + 3*IQR — exact integer comparisons the
    DuckDB twin reproduces bit-for-bit.

    Physical shape: one rank window on the bucket key + one conditional
    aggregation selecting the three ranks, then the tiny per-bucket
    summary (#buckets = #days) broadcast back for the fence counts —
    the mad_outliers two-pass shape.

    Emits one row per bucket: ``bucket_ts, n_points, min_<col>, q1,
    median_<col>, q3, max_<col>, iqr, n_low_outliers,
    n_high_outliers``.
    """
    base = signals.select(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
        F.col(value_col).cast("long").alias("v"),
        "conv_id",
        "turn_idx",
    )
    w = Window.partitionBy("bucket_ts").orderBy(
        F.col("v"), F.col("conv_id"), F.col("turn_idx")
    )
    ranked = base.select(
        "bucket_ts",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("bucket_ts"))
        .cast("long")
        .alias("n"),
    )
    q = ranked.groupBy("bucket_ts").agg(
        F.max("n").alias("n_points"),
        F.min("v").cast("long").alias(f"min_{value_col}"),
        F.max(F.when(F.col("rk") == F.expr("(n + 3) DIV 4"), F.col("v")))
        .cast("long")
        .alias("q1"),
        F.max(F.when(F.col("rk") == F.expr("(n + 1) DIV 2"), F.col("v")))
        .cast("long")
        .alias(f"median_{value_col}"),
        F.max(F.when(F.col("rk") == F.expr("(3 * n + 3) DIV 4"), F.col("v")))
        .cast("long")
        .alias("q3"),
        F.max("v").cast("long").alias(f"max_{value_col}"),
    )
    q = q.withColumn("iqr", (F.col("q3") - F.col("q1")).cast("long"))
    counted = (
        base.join(F.broadcast(q), "bucket_ts")
        .groupBy("bucket_ts")
        .agg(
            F.sum(
                F.when(
                    2 * F.col("v") < 2 * F.col("q1") - 3 * F.col("iqr"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                F.when(
                    2 * F.col("v") > 2 * F.col("q3") + 3 * F.col("iqr"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
    )
    return q.join(F.broadcast(counted), "bucket_ts").select(
        "bucket_ts",
        "n_points",
        f"min_{value_col}",
        "q1",
        f"median_{value_col}",
        "q3",
        f"max_{value_col}",
        "iqr",
        "n_low_outliers",
        "n_high_outliers",
    )


def cusum_changepoint(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Exact CUSUM changepoint per conversation: the turn index where
    the cumulative deviation from the conversation mean peaks in
    absolute value — the classic "where did the level shift" locator
    (Page 1954 statistic, evaluated exactly).

    C_k = sum_{i<=k}(x_i - mean) is rational; scaling by n makes it
    the exact int64 ``n*prefix_k - k*S``. The peak row is selected by
    (|C| desc, turn_idx asc) — deterministic under ties. ``max_cusum``
    (float, = max|C_k| / n) appears only in the final projection, ONE
    expression shape shared with the DuckDB twin.

    Emits one row per conversation with >= MIN_TURNS turns:
    ``conv_id, n_turns, split_turn_idx, max_cusum_scaled, max_cusum``.
    """
    wseq = Window.partitionBy("conv_id").orderBy("turn_idx")
    wall = Window.partitionBy("conv_id")
    x = F.col(value_col).cast("long")
    rows = signals.select(
        "conv_id",
        "turn_idx",
        x.alias("v"),
    ).select(
        "conv_id",
        "turn_idx",
        (
            F.count(F.lit(1)).over(wall).cast("long")
            * F.sum("v")
            .over(wseq.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            - F.row_number().over(wseq).cast("long")
            * F.sum("v").over(wall).cast("long")
        ).alias("c_scaled"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_turns"),
    )
    peaked = rows.where(F.col("n_turns") >= MIN_TURNS).select(
        "conv_id",
        "n_turns",
        "turn_idx",
        F.abs(F.col("c_scaled")).alias("abs_c"),
        F.row_number()
        .over(
            Window.partitionBy("conv_id").orderBy(
                F.abs(F.col("c_scaled")).desc(), F.col("turn_idx").asc()
            )
        )
        .alias("pk"),
    )
    return peaked.where(F.col("pk") == 1).select(
        "conv_id",
        "n_turns",
        F.col("turn_idx").alias("split_turn_idx"),
        F.col("abs_c").alias("max_cusum_scaled"),
        F.round(
            F.col("abs_c").cast("double") / F.col("n_turns").cast("double"),
            6,
        ).alias("max_cusum"),
    )


# the ONE skew/kurtosis combination, shared verbatim with the DuckDB
# oracle (identical parse tree -> identical IEEE-754 doubles). Inputs
# are int64 columns n, s1..s4; {p} is the output prefix.
SKEW_KURT_EXPR = """
CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
""".strip()

_M2 = (
    "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - ({m}) * ({m}))"
)
_M3 = (
    "(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    " - 3.0 * ({m}) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    " + 2.0 * ({m}) * ({m}) * ({m}))"
)
_M4 = (
    "(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    " - 4.0 * ({m}) * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    " + 6.0 * ({m}) * ({m}) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    " - 3.0 * ({m}) * ({m}) * ({m}) * ({m}))"
)


def skew_kurt_sql(mean_sql: str = SKEW_KURT_EXPR) -> tuple[str, str]:
    """(skewness_sql, excess_kurtosis_sql) over columns n, s1..s4 —
    the shared expression strings both engines evaluate."""
    m = mean_sql
    m2 = _M2.format(m=m)
    m3 = _M3.format(m=m)
    m4 = _M4.format(m=m)
    skew = (
        f"CASE WHEN {m2} > 0 THEN"
        f" round(({m3}) / (sqrt({m2}) * ({m2})), 6) END"
    )
    kurt = (
        f"CASE WHEN {m2} > 0 THEN"
        f" round(({m4}) / (({m2}) * ({m2})) - 3.0, 6) END"
    )
    return skew, kurt


def skew_kurt_by_bucket(
    signals: DataFrame,
    value_col: str = "text_len",
    unit: str = "day",
    clamp: int = 1024,
) -> DataFrame:
    """Winsorized skewness and excess kurtosis of an integer signal per
    time bucket, from exact int64 power sums S1..S4.

    Values are clamped to ``clamp`` (power-sum overflow headroom — see
    module docstring) before summing; the moments therefore describe
    the winsorized distribution, the standard robustification for
    heavy-tailed telemetry. The four sums shuffle as exact int64; the
    g1/g2 combination is ONE double expression (:func:`skew_kurt_sql`)
    shared verbatim with the oracle, NULL for constant buckets.

    Emits ``bucket_ts, n_points, s1, s2, s3, s4, skewness, kurtosis``.
    """
    x = F.least(F.col(value_col).cast("long"), F.lit(int(clamp)))
    agg = (
        signals.select(
            F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
            x.alias("v"),
        )
        .groupBy("bucket_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s1"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("s2"),
            F.sum(F.col("v") * F.col("v") * F.col("v"))
            .cast("long")
            .alias("s3"),
            F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v"))
            .cast("long")
            .alias("s4"),
        )
        .where(F.col("n") >= MIN_TURNS)
    )
    skew, kurt = skew_kurt_sql()
    return agg.select(
        "bucket_ts",
        F.col("n").alias("n_points"),
        "s1",
        "s2",
        "s3",
        "s4",
        F.expr(skew).alias("skewness"),
        F.expr(kurt).alias("kurtosis"),
    )


def latency_percentiles_by_bucket(
    signals: DataFrame,
    value_col: str = "inter_time_us",
    unit: str = "day",
) -> DataFrame:
    """Exact p50/p90/p95/p99 latency bands per time bucket — the ops
    dashboard percentile row, by nearest-rank (ceil) selection over
    the same total order as :func:`tukey_fences_by_bucket`.

    Rank of percentile p (1-based) is ceil(p*n) = (p_num*n + p_den - 1)
    DIV p_den — a real observed row, never interpolated, so every band
    is int64 and the DuckDB twin matches bit-for-bit. One rank window
    on the bucket key + one conditional aggregation; #buckets = #days.

    Emits one row per bucket: ``bucket_ts, n_points, p50, p90, p95,
    p99, max_<col>``.
    """
    base = signals.select(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
        F.col(value_col).cast("long").alias("v"),
        "conv_id",
        "turn_idx",
    )
    w = Window.partitionBy("bucket_ts").orderBy(
        F.col("v"), F.col("conv_id"), F.col("turn_idx")
    )
    ranked = base.select(
        "bucket_ts",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("bucket_ts"))
        .cast("long")
        .alias("n"),
    )

    def _at(num: int, den: int):
        return (
            F.max(
                F.when(
                    F.col("rk") == F.expr(f"({num} * n + {den - 1}) DIV {den}"),
                    F.col("v"),
                )
            ).cast("long")
        )

    return ranked.groupBy("bucket_ts").agg(
        F.max("n").alias("n_points"),
        _at(1, 2).alias("p50"),
        _at(9, 10).alias("p90"),
        _at(19, 20).alias("p95"),
        _at(99, 100).alias("p99"),
        F.max("v").cast("long").alias(f"max_{value_col}"),
    )


def latency_by_depth(signals: DataFrame, bucket_width: int = 10) -> DataFrame:
    """Latency as a function of conversation DEPTH: bucket turns by
    turn_idx // bucket_width across the whole corpus and report exact
    per-bucket latency statistics — the "fatigue curve" question (do
    replies slow down as conversations go long?) that time-bucketed
    rollups can't see because they mix depths.

    Everything exact: the mean is a single shared float over int64
    sum/count, the median is the house nearest-rank selection under
    the (value, conv_id, turn_idx) total order. One exchange keyed on
    the depth bucket; output cardinality = max depth / bucket_width
    (tiny at any corpus size).

    Emits ``depth_bucket, n_turns, sum_latency_us, p50_latency_us,
    max_latency_us, mean_latency_us``.
    """
    from pyspark.sql import Window

    base = signals.select(
        (F.col("turn_idx").cast("long") / F.lit(bucket_width))
        .cast("long")
        .alias("depth_bucket"),
        F.col("inter_time_us").cast("long").alias("v"),
        "conv_id",
        "turn_idx",
    )
    w_rk = Window.partitionBy("depth_bucket").orderBy(
        "v", "conv_id", "turn_idx"
    )
    w_tot = Window.partitionBy("depth_bucket")
    ranked = base.select(
        "depth_bucket",
        "v",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_tot).alias("n"),
    )
    agg = ranked.groupBy("depth_bucket").agg(
        F.max("n").cast("long").alias("n_turns"),
        F.sum("v").cast("long").alias("sum_latency_us"),
        F.max(
            F.when(F.col("rk") == F.floor((F.col("n") + 1) / 2), F.col("v"))
        )
        .cast("long")
        .alias("p50_latency_us"),
        F.max("v").cast("long").alias("max_latency_us"),
    )
    return agg.select(
        "depth_bucket",
        "n_turns",
        "sum_latency_us",
        "p50_latency_us",
        "max_latency_us",
        F.expr(
            "round(CAST(sum_latency_us AS DOUBLE)"
            " / CAST(n_turns AS DOUBLE), 6)"
        ).alias("mean_latency_us"),
    )


def weighted_median_daily(
    signals: DataFrame,
    value_col: str = "inter_time_us",
    weight_col: str = "text_len",
) -> DataFrame:
    """Weight-aware median per day: the smallest value whose
    cumulative weight reaches half the day's total — "the latency a
    typical TOKEN experienced", not a typical turn. When long replies
    are slow, the weighted median sits far above the plain p50, and
    that gap is the user-facing truth a turn-count median hides.

    The crossing row is selected exactly: order by (value, conv_id,
    turn_idx), then the unique row with
    ``2*(cumw - w) < W <= 2*cumw`` (strictly increasing cumulative
    weight makes it unique; zero-weight rows can never satisfy both
    sides). All int64, no division anywhere. One rank window per day
    plus one aggregation.

    Emits ``day_ts, n_turns, total_weight, wmedian`` for days with
    positive total weight.
    """
    from pyspark.sql import Window

    base = signals.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col(value_col).cast("long").alias("v"),
        F.col(weight_col).cast("long").alias("w"),
        "conv_id",
        "turn_idx",
    )
    w_cum = (
        Window.partitionBy("day")
        .orderBy("v", "conv_id", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("day")
    stepped = base.select(
        "day",
        "v",
        "w",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(w_tot).alias("totw"),
    )
    crossing = (
        (F.lit(2) * (F.col("cumw") - F.col("w")) < F.col("totw"))
        & (F.lit(2) * F.col("cumw") >= F.col("totw"))
    )
    agg = (
        stepped.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.max("totw").cast("long").alias("total_weight"),
            F.max(F.when(crossing, F.col("v"))).cast("long").alias("wmedian"),
        )
        .filter(F.col("total_weight") > 0)
    )
    return agg.select(
        F.col("day").alias("day_ts"), "n_turns", "total_weight", "wmedian"
    )


def trimmed_mean_daily(
    signals: DataFrame,
    value_col: str = "inter_time_us",
    trim_tenths: int = 1,
) -> DataFrame:
    """10%-trimmed mean per day (``trim_tenths``/10 from EACH side):
    the robust location estimate between the median (which ignores
    all magnitude) and the mean (which one 10^9-microsecond outlier
    owns). The Olympic-scoring estimator.

    The trim count is exact: lo = n * trim_tenths // 10 rows are
    dropped from each end of the (value, conv_id, turn_idx) total
    order, and the kept-row sum is int64. The mean itself is an exact
    INTEGER microsecond value (truncated toward zero, spelled out for
    both signs) — a float division here would sit near 1e10 us where
    round(x, 6) needs more than 2^53 of mantissa and the engines'
    rounding paths diverge in the last ulp (the seasonal_profile DIV
    lesson, made sign-safe per the round-4 advice).

    Emits ``day_ts, n_points, n_trimmed_each, n_kept, sum_kept,
    trimmed_mean_us``.
    """
    from pyspark.sql import Window

    base = signals.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col(value_col).cast("long").alias("v"),
        "conv_id",
        "turn_idx",
    )
    w_rk = Window.partitionBy("day").orderBy("v", "conv_id", "turn_idx")
    w_tot = Window.partitionBy("day")
    ranked = base.select(
        "day",
        "v",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_tot).alias("n"),
    )
    lo = F.expr(f"n * {trim_tenths} DIV 10")
    kept = (F.col("rk") > lo) & (F.col("rk") <= F.col("n") - lo)
    agg = ranked.groupBy("day").agg(
        F.max("n").cast("long").alias("n_points"),
        F.max(lo).cast("long").alias("n_trimmed_each"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("v")).otherwise(0))
        .cast("long")
        .alias("sum_kept"),
    )
    # Spark DIV already truncates toward zero for either sign; the
    # DuckDB twin spells the same semantics with CASE over floor //
    return agg.select(
        F.col("day").alias("day_ts"),
        "n_points",
        "n_trimmed_each",
        "n_kept",
        "sum_kept",
        F.expr("sum_kept DIV n_kept").cast("long").alias("trimmed_mean_us"),
    )


def mode_daily(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Exact mode per day: the most frequent value, ties broken by
    the smallest value — the third classical location estimate next
    to the mean and median, and the one that exposes quantized or
    templated data instantly (a mode holding 40% of a day's turns is
    boilerplate, not conversation).

    Two aggregations — (day, value) counts, then the deterministic
    (count DESC, value ASC) argmax per day — all int64 with the mode
    share as the one shared float.

    Emits ``day_ts, n_points, n_distinct, mode_value, mode_count,
    mode_share``.
    """
    from pyspark.sql import Window

    counts = (
        signals.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col(value_col).cast("long").alias("v"),
        )
        .groupBy("day", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("day").orderBy(F.col("c").desc(), F.col("v").asc())
    w_tot = Window.partitionBy("day")
    ranked = counts.select(
        "day",
        "v",
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w_tot).alias("n_points"),
        F.count("*").over(w_tot).alias("n_distinct"),
    )
    top = ranked.where(F.col("rn") == 1).select(
        F.col("day").alias("day_ts"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("v").alias("mode_value"),
        F.col("c").alias("mode_count"),
    )
    return top.select(
        "day_ts",
        "n_points",
        "n_distinct",
        "mode_value",
        "mode_count",
        F.expr(
            "round(CAST(mode_count AS DOUBLE) / CAST(n_points AS DOUBLE), 6)"
        ).alias("mode_share"),
    )
