"""Cohort / engagement analytics over the transcript corpus: cohort
retention grids, rolling active-entity counts, ordered funnels.

The product-analytics layer every event warehouse ends up exposing
("of the conversations that started in week 1, how many were still
active in week 3?", "what is the 7-day active count per day?", "how
many conversations progress view -> click -> purchase in order?").
House discipline throughout (see operators/stats.py): everything
shuffled or summed is an exact int64/date; floats appear only in final
single-expression projections (stickiness ratio, burstiness index),
rounded to 6 — so the DuckDB twins hash-match bit-for-bit.

No reference analog (the reference prepares per-sequence tensors and
never asks corpus-level engagement questions); natural extension of the
north_star's rollup family over the same canonical transcript shape
(reference src/aroma/datasets/multithumos.py:520-521 for the stable
ordering these ride on).

Scale shapes (10^12 turns / 1000 executors):

- ``cohort_retention``: one aggregation per conversation (first-day),
  one distinct over (conv, day) — both ride the canonical conv_id
  exchange — a co-partitioned join on conv_id, then ONE map-side
  combinable aggregation whose output is |days|^2 / 2 rows (a 3-year
  corpus is ~600k rows). The corpus is touched once.
- ``rolling_active_counts``: the exact distinct-entities-in-trailing-
  window count. Dedup to (conv, day) first — the explode multiplies
  the DEDUPED row count by window_days (bounded, e.g. 7), never the
  raw turn count — then one count-distinct per emitted day. The
  classic sketch alternative (HLL per day, union over the window) is
  already available via ``sketches.hll``; this operator is the exact
  path and the oracle for it.
- ``funnel_steps``: k chained min-aggregations, every one keyed on
  conv_id; each step filters its own scan of the step-k turns and
  joins the (one row per conversation) reached-frame back on conv_id
  — AQE broadcasts it while it is small (the PLANS.md audit shows 4
  broadcast joins for a 3-step funnel), falling back to a
  co-partitioned join at scale. The corpus is scanned once per step
  with the step predicate pushed to parquet (`EqualTo(event_type,
  view)` lands in PushedFilters); persist the windowed transcript
  frame instead when k is large. Strict in-order matching uses
  ``turn_idx``, which is total within a conversation and consistent
  with (ts, event_id) by construction — no timestamp tie ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(transcripts: DataFrame) -> DataFrame:
    """(cohort_day, offset_day) -> number of cohort conversations active
    offset_day days after their first activity.

    Returns columns ``cohort_day`` (timestamp, day-truncated),
    ``offset_day`` (int, >= 0), ``n_convs`` (long). Row (c, 0) is the
    cohort size; retention rate is n_convs / cohort size — left to the
    caller so the table stays pure integers (exact re-aggregation, and
    the rate denominator is a self-join away).
    """
    day = F.date_trunc("day", F.col("ts"))
    first_day = transcripts.groupBy("conv_id").agg(
        F.min(day).alias("cohort_day")
    )
    activity = transcripts.select(
        "conv_id", day.alias("active_day")
    ).distinct()
    joined = activity.join(first_day, "conv_id")
    return joined.groupBy(
        "cohort_day",
        F.datediff(F.col("active_day"), F.col("cohort_day"))
        .cast("int")
        .alias("offset_day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_convs"))


def rolling_active_counts(
    transcripts: DataFrame, window_days: int = 7
) -> DataFrame:
    """Exact trailing-window active-conversation counts (the WAU/MAU
    family): for each day d, the number of distinct conversations with
    any activity in [d - window_days + 1, d].

    Implementation: dedup to (conv_id, active_day), then each activity
    day CONTRIBUTES to the ``window_days`` window-end days it falls
    inside (one bounded ``sequence`` explode — fan-out is window_days
    x the deduped row count, independent of turn volume), then one
    exact count-distinct per window-end day. Window-end days beyond
    the corpus maximum are emitted too (they are real trailing windows
    that happen to end after the last event); callers slice as needed
    and the DuckDB twin reproduces them identically.

    Returns ``window_end_day`` (timestamp), ``n_active`` (long).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.date_trunc("day", F.col("ts"))
    activity = transcripts.select(
        "conv_id", day.alias("active_day")
    ).distinct()
    ends = activity.select(
        "conv_id",
        F.explode(
            F.sequence(
                F.col("active_day"),
                F.col("active_day")
                + F.expr(f"INTERVAL {int(window_days) - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("window_end_day"),
    )
    return ends.groupBy("window_end_day").agg(
        F.countDistinct("conv_id").cast("long").alias("n_active")
    )


def funnel_steps(transcripts: DataFrame, steps: list[str]) -> DataFrame:
    """Strict ordered funnel over the ``role`` column: a conversation
    reaches step k when it contains the step-k role STRICTLY AFTER the
    turn that satisfied step k-1 (first-match semantics, the standard
    product-funnel definition). Matching uses ``turn_idx`` — the stable
    (ts, event_id) total order — so simultaneous-timestamp ties are
    deterministic.

    Returns one row per step that at least one conversation reached:
    ``step`` (int, 1-based), ``role`` (string), ``n_convs`` (long).
    Counts are non-increasing in ``step`` by construction. Fully lazy
    (one tiny k-row aggregation over :func:`funnel_matches` — no driver
    counts); the role label joins in from a broadcast k-row literal.
    """
    matches = funnel_matches(transcripts, steps)
    labels = transcripts.sparkSession.createDataFrame(
        [(i + 1, r) for i, r in enumerate(steps)], "step int, role string"
    )
    counts = matches.groupBy("step").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    return counts.join(F.broadcast(labels), "step").select(
        "step", "role", "n_convs"
    )


def funnel_matches(transcripts: DataFrame, steps: list[str]) -> DataFrame:
    """Per-conversation funnel match table: one row per (conversation,
    reached step) with the matching turn_idx, suitable for joining back
    against the corpus or aggregating arbitrarily
    (:func:`funnel_steps` is its k-row summary).

    Returns ``conv_id``, ``step`` (int, 1-based), ``match_idx`` (int,
    the turn index that satisfied the step).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (
        transcripts.where(F.col("role") == steps[0])
        .groupBy("conv_id")
        .agg(F.min("turn_idx").alias("match_idx"))
        .select("conv_id", F.lit(1).alias("step"), "match_idx")
    )
    out = reached
    for i, role in enumerate(steps[1:], start=2):
        reached = (
            transcripts.where(F.col("role") == role)
            .join(reached.select("conv_id", "match_idx"), "conv_id")
            .where(F.col("turn_idx") > F.col("match_idx"))
            .groupBy("conv_id")
            .agg(F.min("turn_idx").alias("match_idx"))
            .select("conv_id", F.lit(i).alias("step"), "match_idx")
        )
        out = out.unionByName(reached)
    return out


def stickiness(
    transcripts: DataFrame, short_days: int = 1, long_days: int = 7
) -> DataFrame:
    """DAU/WAU-style stickiness ratio per day: active entities in the
    trailing ``short_days`` window over active entities in the trailing
    ``long_days`` window — the classic engagement-intensity series
    (ratio 1.0 = every weekly-active conversation was active today).

    Composes two :func:`rolling_active_counts` frames with one
    co-keyed join on the day column (both sides are |days|-row tables —
    negligible at any corpus scale; the corpus itself is touched twice
    through the shared dedup, once per window explode). The ratio is
    ONE double division rounded to 6 places over exact int64 counts, so
    the DuckDB twin matches bit-for-bit. Days inside the long window's
    trailing reach but past the short one's contribute a NULL-free row
    only where both windows have a count (inner join; a day with
    long-window actives but zero short-window actives cannot exist
    since short ⊆ long when aligned on the same window-end day).
    """
    if not (1 <= short_days < long_days):
        raise ValueError(f"need 1 <= short {short_days} < long {long_days}")
    s = rolling_active_counts(transcripts, short_days).withColumnRenamed(
        "n_active", "n_short"
    )
    lw = rolling_active_counts(transcripts, long_days).withColumnRenamed(
        "n_active", "n_long"
    )
    return s.join(lw, "window_end_day").select(
        "window_end_day",
        "n_short",
        "n_long",
        F.round(
            F.col("n_short").cast("double") / F.col("n_long").cast("double"),
            6,
        ).alias("stickiness"),
    )


def burstiness(transcripts: DataFrame, min_gaps: int = 3) -> DataFrame:
    """Goh–Barabási burstiness index per conversation over inter-turn
    gaps: B = (σ − μ) / (σ + μ) ∈ [-1, 1] — B→1 bursty, B≈0 Poisson,
    B→-1 periodic. The single-number answer to "is this conversation's
    arrival process bursty or regular?", the shape question the
    inter-time signal family (reference
    src/aroma/preprocessing/intertimes.py:44-80) exists to expose.

    House exactness discipline: gaps integer-divide to whole seconds
    (the signal_corr overflow rationale), n / Σx / Σx² shuffle as exact
    int64 partials, and μ, σ, B evaluate in ONE fixed double expression
    rounded to 6 — bit-identical on both engines. Conversations with
    fewer than ``min_gaps`` gaps or zero-variance gaps emit NULL B
    (undefined σ+μ=0 only when all gaps are 0 and μ=0 — also NULL).
    One window pass + one aggregation on the canonical conv_id exchange.
    """
    gap_s = F.expr(
        "CAST(unix_micros(ts) - unix_micros(lag(ts) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx)) AS BIGINT) DIV 1000000"
    )
    agg = (
        transcripts.select("conv_id", gap_s.alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("g").cast("long").alias("s1"),
            F.sum(F.col("g") * F.col("g")).cast("long").alias("s2"),
        )
        .where(F.col("n_gaps") >= min_gaps)
    )
    nd = F.col("n_gaps").cast("double")
    mu = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mu * mu
    sigma = F.sqrt(var)
    b = F.when(
        (var > 0) | (mu > 0), F.round((sigma - mu) / (sigma + mu), 6)
    )
    return agg.select("conv_id", "n_gaps", b.alias("burstiness"))


def lifespan_histogram(transcripts: DataFrame) -> DataFrame:
    """Power-of-two histogram of conversation lifespans (max ts − min
    ts, µs) — "how long do conversations live?" as a bounded mergeable
    sketch, the entity-level sibling of the per-turn latency histogram
    (`tiers.latency_histogram`, same exact integer→binary-length bin
    rule, same sum-to-merge algebra).

    One aggregation per conversation on the canonical exchange, then a
    ≤64-row aggregation on the bin — at 10^12 turns the output is 64
    integers no matter what.
    """
    span = transcripts.groupBy("conv_id").agg(
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("lifespan_us")
    )
    v = F.col("lifespan_us")
    bin_col = (
        F.when(v <= 0, F.lit(0))
        .otherwise(F.length(F.conv(v.cast("string"), 10, 2)))
        .cast("int")
    )
    return span.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )


def active_day_streaks(transcripts: DataFrame) -> DataFrame:
    """Longest consecutive-day activity streak per conversation — the
    classic gaps-and-islands engagement metric ("how many days in a
    row was this entity active, at best?").

    Distinct active days are ranked per conversation; subtracting the
    rank (in days) from each day maps every consecutive run onto one
    shared anchor date, so one aggregation per (conv_id, anchor)
    yields streak lengths and a second per conv_id picks the max.
    Everything is exact DATE/int64 arithmetic — no floats anywhere.

    Scale shape: dedup to (conv_id, day) rides the canonical conv_id
    exchange; the rank window and both aggregations stay keyed on
    conv_id (prefix keys), so after the dedup shuffle nothing
    re-exchanges. Linear in distinct (conv, day) pairs.

    Emits ``conv_id, n_active_days, n_streaks, max_streak_days``.
    """
    from pyspark.sql import Window

    days = transcripts.select(
        "conv_id", F.to_date(F.col("ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("conv_id").orderBy("d")
    anchored = days.select(
        "conv_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = anchored.groupBy("conv_id", "anchor").agg(
        F.count("*").cast("long").alias("streak_days")
    )
    return streaks.groupBy("conv_id").agg(
        F.sum("streak_days").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
        F.max("streak_days").cast("long").alias("max_streak_days"),
    )


def conv_length_survival(transcripts: DataFrame) -> DataFrame:
    """Survival analysis of conversation length: for every observed
    length k, how many conversations reach k turns (at risk), how
    many end exactly there (deaths), and the discrete hazard
    deaths/at_risk — the retention curve read the way reliability
    engineering reads failure data ("the risk of a conversation dying
    at turn 3 is the product signal", not the length histogram).

    From the per-conversation length histogram (len -> n_convs), the
    at-risk count is a suffix sum: ordering lengths DESCENDING makes
    it a running cumulative — one tiny window over the distinct-length
    table (bounded by the longest conversation, the gini_turns
    precedent). All int64; hazard is the one shared float.

    Emits ``conv_len, n_deaths, n_at_risk, hazard, survival`` where
    survival = n_at_risk / total (fraction reaching this length).
    """
    from pyspark.sql import Window

    lengths = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("conv_len")
    )
    hist = lengths.groupBy("conv_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_deaths")
    )
    w_sfx = Window.orderBy(F.col("conv_len").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded global windows: frame is the |distinct conversation
    # lengths|-row histogram, not the conversation table
    w_tot = Window.partitionBy()
    stepped = hist.select(
        "conv_len",
        "n_deaths",
        F.sum("n_deaths").over(w_sfx).cast("long").alias("n_at_risk"),
        F.sum("n_deaths").over(w_tot).cast("long").alias("n_total"),
    )
    return stepped.select(
        "conv_len",
        "n_deaths",
        "n_at_risk",
        F.expr(
            "round(CAST(n_deaths AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 6)"
        ).alias("hazard"),
        F.expr(
            "round(CAST(n_at_risk AS DOUBLE) / CAST(n_total AS DOUBLE), 6)"
        ).alias("survival"),
    )


def tool_adoption_daily(transcripts: DataFrame) -> DataFrame:
    """Cumulative tool adoption: by each day, what fraction of the
    conversations started so far has made at least one tool call?
    The feature-adoption S-curve product teams track, computed from
    first-touch events rather than daily re-scans.

    Each conversation contributes (first day, started+1) and — if it
    ever calls a tool — (first tool day, adopted+1); one aggregation
    per day and one running cumulative over the calendar-bounded day
    table gives both counters. All int64; the adoption rate is the
    one shared float.

    Emits ``day_ts, n_started_cum, n_adopted_cum, adoption_rate`` for
    every day on which a first-start or first-adoption occurred.
    """
    from pyspark.sql import Window

    firsts = transcripts.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day"),
        F.date_trunc(
            "day",
            F.min(
                F.when(
                    F.col("tool").isNotNull() & (F.col("tool") != ""),
                    F.col("ts"),
                )
            ),
        ).alias("first_tool_day"),
    )
    started = firsts.select(
        F.col("first_day").alias("day"),
        F.lit(1).alias("ds"),
        F.lit(0).alias("da"),
    )
    adopted = firsts.where(F.col("first_tool_day").isNotNull()).select(
        F.col("first_tool_day").alias("day"),
        F.lit(0).alias("ds"),
        F.lit(1).alias("da"),
    )
    daily = (
        started.unionByName(adopted)
        .groupBy("day")
        .agg(
            F.sum("ds").cast("long").alias("n_started"),
            F.sum("da").cast("long").alias("n_adopted"),
        )
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.sum("n_started").over(w_cum).cast("long").alias("n_started_cum"),
        F.sum("n_adopted").over(w_cum).cast("long").alias("n_adopted_cum"),
    )
    return cum.select(
        F.col("day").alias("day_ts"),
        "n_started_cum",
        "n_adopted_cum",
        F.expr(
            "CASE WHEN n_started_cum > 0 THEN"
            " round(CAST(n_adopted_cum AS DOUBLE)"
            " / CAST(n_started_cum AS DOUBLE), 6) END"
        ).alias("adoption_rate"),
    )


def timed_conversion(
    transcripts: DataFrame,
    step_a: str = "view",
    step_b: str = "purchase",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Time-bounded conversion: of the conversations that performed
    ``step_a``, how many performed ``step_b`` AFTER it — and how many
    within ``window_us``? The funnel question with the deadline
    attached (funnel_steps counts eventual order; SLAs and attribution
    windows care about WITHIN AN HOUR).

    Two conditional-min aggregations on the conv_id exchange: first
    the earliest step_a per conversation, then (after a same-key join
    back) the earliest step_b at-or-after it. Delays are exact int64
    microseconds; the two rates are shared floats. ONE summary row.

    Emits ``n_convs, n_with_a, n_with_b_after, n_within_window,
    conversion_rate, windowed_rate, min_delay_us, max_delay_us``.
    """
    from pyspark.sql import functions as F  # noqa: F811

    first_a = transcripts.groupBy("conv_id").agg(
        F.min(F.when(F.col("role") == step_a, F.unix_micros(F.col("ts"))))
        .alias("a_us"),
    )
    joined = transcripts.select(
        "conv_id", "role", F.unix_micros(F.col("ts")).alias("ts_us")
    ).join(first_a, "conv_id")
    per_conv = joined.groupBy("conv_id").agg(
        F.max("a_us").alias("a_us"),
        F.min(
            F.when(
                (F.col("role") == step_b)
                & F.col("a_us").isNotNull()
                & (F.col("ts_us") >= F.col("a_us")),
                F.col("ts_us"),
            )
        ).alias("b_us"),
    )
    delays = per_conv.select(
        "conv_id",
        "a_us",
        "b_us",
        (F.col("b_us") - F.col("a_us")).alias("delay_us"),
    )
    agg = delays.agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.count("a_us").cast("long").alias("n_with_a"),
        F.count("b_us").cast("long").alias("n_with_b_after"),
        F.sum(
            F.when(F.col("delay_us") <= F.lit(window_us), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_within_window"),
        F.min("delay_us").cast("long").alias("min_delay_us"),
        F.max("delay_us").cast("long").alias("max_delay_us"),
    )
    return agg.select(
        "n_convs",
        "n_with_a",
        "n_with_b_after",
        "n_within_window",
        F.expr(
            "CASE WHEN n_with_a > 0 THEN round(CAST(n_with_b_after"
            " AS DOUBLE) / CAST(n_with_a AS DOUBLE), 6) END"
        ).alias("conversion_rate"),
        F.expr(
            "CASE WHEN n_with_a > 0 THEN round(CAST(n_within_window"
            " AS DOUBLE) / CAST(n_with_a AS DOUBLE), 6) END"
        ).alias("windowed_rate"),
        "min_delay_us",
        "max_delay_us",
    )


def growth_accounting(transcripts: DataFrame) -> DataFrame:
    """Daily growth accounting over conversations: every active
    (conv, day) is exactly one of NEW (first-ever active day),
    RETAINED (also active the previous calendar day) or RESURRECTED
    (seen before, but skipped at least one day) — the standard
    DAU-decomposition every product warehouse reports. ``n_churn_next``
    counts today's actives that do NOT return tomorrow (tomorrow's
    churn, attributed to the day it is measurable from), so
    ``n_active(d+1) = n_new(d+1) + n_retained(d+1) + n_resurrected(d+1)``
    and ``n_retained(d+1) = n_active(d) - n_churn_next(d)`` hold as
    exact int64 identities.

    Scale shape: dedup to (conv, day) first — the lag/lead window then
    runs over at most |convs| x |days| rows, not raw turns. Three
    exchanges (PLANS.md audit): the map-side-combinable distinct on
    (conv, day) — which shrinks 10^12 turns to ~|convs| x |days| rows
    BEFORE any wide key — then the conv_id window hash, then the final
    per-day aggregation with |days| output rows. Counts exact int64;
    the retained share is one shared float over exact counts.

    Emits ``day_ts, n_active, n_new, n_retained, n_resurrected,
    n_churn_next, retained_share``.
    """
    from pyspark.sql import Window

    days = transcripts.select(
        "conv_id", F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).distinct()
    w = Window.partitionBy("conv_id").orderBy("day_ts")
    lagd = F.lag("day_ts").over(w)
    leadd = F.lead("day_ts").over(w)
    prev_day = F.col("day_ts") - F.expr("INTERVAL 1 DAY")
    next_day = F.col("day_ts") + F.expr("INTERVAL 1 DAY")
    marked = days.select(
        "day_ts",
        lagd.isNull().alias("is_new"),
        (lagd.isNotNull() & (lagd == prev_day)).alias("is_retained"),
        (lagd.isNotNull() & (lagd < prev_day)).alias("is_resurrected"),
        (leadd.isNull() | (leadd > next_day)).alias("churns_next"),
    )
    agg = marked.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("is_retained"), 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("is_resurrected"), 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
        F.sum(F.when(F.col("churns_next"), 1).otherwise(0))
        .cast("long")
        .alias("n_churn_next"),
    )
    return agg.select(
        "day_ts",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_churn_next",
        F.expr(
            "round(CAST(n_retained AS DOUBLE)"
            " / CAST(n_active AS DOUBLE), 6)"
        ).alias("retained_share"),
    )


def bounce_rate_daily(transcripts: DataFrame) -> DataFrame:
    """Bounce rate per start-day cohort: of the conversations whose
    FIRST turn lands on day d, how many never get a second turn? The
    single-interaction share — the first metric any engagement
    dashboard shows next to DAU.

    Scale shape: ONE aggregation per conversation (count + min ts)
    riding the canonical conv_id exchange, then one map-side
    combinable per-day rollup with |days| output rows. Counts exact
    int64; the share is one shared float.

    Emits ``day_ts, n_started, n_bounced, bounce_share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.date_trunc("day", F.min("ts")).alias("day_ts"),
    )
    agg = per_conv.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_started"),
        F.sum(F.when(F.col("n_turns") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounced"),
    )
    return agg.select(
        "day_ts",
        "n_started",
        "n_bounced",
        F.expr(
            "round(CAST(n_bounced AS DOUBLE)"
            " / CAST(n_started AS DOUBLE), 6)"
        ).alias("bounce_share"),
    )


def time_to_first_tool_daily(transcripts: DataFrame) -> DataFrame:
    """Time-to-first-tool per start-day cohort: for conversations
    that ever invoke a tool, the exact µs from their first turn to
    their first tool turn — the activation-latency companion to
    :func:`tool_adoption_daily` (which counts adopters but never
    says how LONG activation took).

    ONE aggregation per conversation (min ts, conditional min tool
    ts — both ride the canonical conv_id exchange), then a map-side
    combinable per-day rollup. Exact int64 µs; the mean is an
    integer quotient (1e11-µs magnitudes — the seasonal_profile
    discipline; ttft >= 0 by construction so truncation IS floor);
    the adoption share is one shared float.

    Emits ``day_ts, n_started, n_with_tool, sum_ttft_us, min_ttft_us,
    max_ttft_us, mean_ttft_us, tool_share``.
    """
    tool_ts = F.when(
        F.col("tool").isNotNull() & (F.col("tool") != ""), F.col("ts")
    )
    per_conv = transcripts.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day_ts"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.min(tool_ts)).alias("first_tool_us"),
    ).select(
        "day_ts",
        (F.col("first_tool_us") - F.col("first_us")).alias("ttft_us"),
    )
    agg = per_conv.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_started"),
        F.count("ttft_us").cast("long").alias("n_with_tool"),
        F.sum("ttft_us").cast("long").alias("sum_ttft_us"),
        F.min("ttft_us").cast("long").alias("min_ttft_us"),
        F.max("ttft_us").cast("long").alias("max_ttft_us"),
    )
    return agg.select(
        "day_ts",
        "n_started",
        "n_with_tool",
        "sum_ttft_us",
        "min_ttft_us",
        "max_ttft_us",
        F.expr(
            "CASE WHEN n_with_tool > 0 THEN"
            " CAST(sum_ttft_us div n_with_tool AS BIGINT) END"
        ).alias("mean_ttft_us"),
        F.expr(
            "round(CAST(n_with_tool AS DOUBLE)"
            " / CAST(n_started AS DOUBLE), 6)"
        ).alias("tool_share"),
    )


def error_recovery_daily(
    transcripts: DataFrame, error_role: str = "error"
) -> DataFrame:
    """Error-recovery profile per day: after an ``error`` turn, does
    the conversation continue, and how fast? Error turns that are the
    conversation's LAST turn count as terminal; the rest recover
    after an exact µs gap — the ops-dashboard row that separates
    "errors happen" from "errors kill sessions".

    ONE lead window on the canonical (conv_id, turn_idx) order (the
    same conv_id exchange every per-conversation operator rides),
    error rows filtered AFTER the window (the lead must see every
    turn), then a map-side combinable per-day rollup. Exact int64 µs;
    integer-quotient mean; one shared float share.

    Emits ``day_ts, n_errors, n_recovered, n_terminal,
    sum_recovery_us, mean_recovery_us, recovery_share``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    marked = transcripts.select(
        "role",
        "ts",
        (F.lead(F.unix_micros(F.col("ts"))).over(w)
         - F.unix_micros(F.col("ts"))).alias("next_gap_us"),
    ).where(F.col("role") == error_role)
    agg = marked.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_errors"),
        F.count("next_gap_us").cast("long").alias("n_recovered"),
        F.sum("next_gap_us").cast("long").alias("sum_recovery_us"),
    )
    return agg.select(
        "day_ts",
        "n_errors",
        "n_recovered",
        (F.col("n_errors") - F.col("n_recovered"))
        .cast("long")
        .alias("n_terminal"),
        "sum_recovery_us",
        F.expr(
            "CASE WHEN n_recovered > 0 THEN"
            " CAST(sum_recovery_us div n_recovered AS BIGINT) END"
        ).alias("mean_recovery_us"),
        F.expr(
            "round(CAST(n_recovered AS DOUBLE)"
            " / CAST(n_errors AS DOUBLE), 6)"
        ).alias("recovery_share"),
    )


def mau_monthly(transcripts: DataFrame) -> DataFrame:
    """Monthly active conversations with month-over-month growth —
    the grain above active_7d's rolling window: exact distinct
    actives per calendar month, growth NULL on calendar chain breaks
    (the dod_growth discipline at monthly grain).

    Dedup to (conv, month) map-side (10^12 turns to |convs| x
    |months| rows before any wide operation), ONE count per month,
    then the lag window over |months| rows. Counts exact int64; the
    growth is one shared float.

    Emits ``month_ts, n_active, prev_n_active, mom_growth``.
    """
    from pyspark.sql import Window

    monthly = (
        transcripts.select(
            "conv_id", F.date_trunc("month", F.col("ts")).alias("month_ts")
        )
        .distinct()
        .groupBy("month_ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    w = Window.orderBy("month_ts")
    out = monthly.select(
        "month_ts",
        "n_active",
        F.when(
            F.lag("month_ts").over(w)
            == F.col("month_ts") - F.expr("INTERVAL 1 MONTH"),
            F.lag("n_active").over(w),
        )
        .cast("long")
        .alias("prev_n_active"),
    )
    return out.select(
        "month_ts",
        "n_active",
        "prev_n_active",
        F.expr(
            "CASE WHEN prev_n_active > 0 THEN"
            " round(CAST(n_active - prev_n_active AS DOUBLE)"
            " / CAST(prev_n_active AS DOUBLE), 6) END"
        ).alias("mom_growth"),
    )


def conv_span_profile(transcripts: DataFrame) -> DataFrame:
    """How many conversations outlive their start day? Per start-day
    cohort: the multi-day share and the longest span in whole
    calendar days — the long-running-session monitor next to
    :func:`bounce_rate_daily`'s single-turn share.

    ONE aggregation per conversation (min/max ts on the conv_id
    exchange), then a map-side combinable per-day rollup. Day spans
    exact int64 (datediff of the day-truncated endpoints); the share
    is one shared float.

    Emits ``day_ts, n_started, n_multi_day, max_span_days,
    sum_span_days, multi_day_share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day_ts"),
        F.datediff(
            F.date_trunc("day", F.max("ts")),
            F.date_trunc("day", F.min("ts")),
        )
        .cast("long")
        .alias("span_days"),
    )
    agg = per_conv.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_started"),
        F.sum(F.when(F.col("span_days") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_multi_day"),
        F.max("span_days").cast("long").alias("max_span_days"),
        F.sum("span_days").cast("long").alias("sum_span_days"),
    )
    return agg.select(
        "day_ts",
        "n_started",
        "n_multi_day",
        "max_span_days",
        "sum_span_days",
        F.expr(
            "round(CAST(n_multi_day AS DOUBLE)"
            " / CAST(n_started AS DOUBLE), 6)"
        ).alias("multi_day_share"),
    )


def signup_purchase_lag_daily(transcripts: DataFrame) -> DataFrame:
    """Signup-to-first-purchase lag per signup-day cohort: for
    conversations that sign up and LATER purchase, the exact µs from
    first signup turn to the first purchase turn at or after it —
    the activation funnel's wall-clock cost (the monetary sibling of
    :func:`time_to_first_tool_daily`).

    ONE aggregation per conversation — min signup ts, then the
    conditional min purchase ts bounded below by it, both riding the
    conv_id exchange (the bound is enforced with a two-pass
    conditional aggregate, no self-join) — then a map-side
    combinable per-day rollup. Exact int64 µs; integer-quotient
    mean; one shared float conversion share.

    Emits ``day_ts, n_signups, n_converted, sum_lag_us, min_lag_us,
    max_lag_us, mean_lag_us, conversion_share``.
    """
    su = F.when(F.col("role") == "signup", F.col("ts"))
    first_signup = transcripts.groupBy("conv_id").agg(
        F.min(su).alias("signup_ts")
    )
    j = transcripts.join(first_signup, "conv_id").where(
        F.col("signup_ts").isNotNull()
    )
    pu = F.when(
        (F.col("role") == "purchase") & (F.col("ts") >= F.col("signup_ts")),
        F.col("ts"),
    )
    per_conv = j.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("signup_ts")).alias("day_ts"),
        (
            F.unix_micros(F.min(pu)) - F.unix_micros(F.min("signup_ts"))
        ).alias("lag_us"),
    )
    agg = per_conv.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.count("lag_us").cast("long").alias("n_converted"),
        F.sum("lag_us").cast("long").alias("sum_lag_us"),
        F.min("lag_us").cast("long").alias("min_lag_us"),
        F.max("lag_us").cast("long").alias("max_lag_us"),
    )
    return agg.select(
        "day_ts",
        "n_signups",
        "n_converted",
        "sum_lag_us",
        "min_lag_us",
        "max_lag_us",
        F.expr(
            "CASE WHEN n_converted > 0 THEN"
            " CAST(sum_lag_us div n_converted AS BIGINT) END"
        ).alias("mean_lag_us"),
        F.expr(
            "round(CAST(n_converted AS DOUBLE)"
            " / CAST(n_signups AS DOUBLE), 6)"
        ).alias("conversion_share"),
    )


def cohort_retention_weekly(transcripts: DataFrame) -> DataFrame:
    """The weekly cohort-retention grid: (cohort week, offset weeks)
    -> active conversations — :func:`cohort_retention` at the grain
    retention curves are actually read at (daily grids are too noisy
    past the first week). Offset = whole weeks between the activity
    week and the cohort week (exact integer day-diff // 7 on
    week-truncated stamps).

    Same scale shape as the daily grid: per-conversation first-week
    min, (conv, week) distinct, a co-partitioned conv_id join, ONE
    map-side combinable aggregate of |weeks|^2/2 rows.

    Emits ``cohort_week, offset_week, n_convs``.
    """
    week = F.date_trunc("week", F.col("ts"))
    first_week = transcripts.groupBy("conv_id").agg(
        F.min(week).alias("cohort_week")
    )
    activity = transcripts.select(
        "conv_id", week.alias("active_week")
    ).distinct()
    joined = activity.join(first_week, "conv_id")
    return joined.groupBy(
        "cohort_week",
        (
            F.datediff(F.col("active_week"), F.col("cohort_week"))
            / F.lit(7)
        )
        .cast("int")
        .alias("offset_week"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_convs"))


def error_convs_weekly(transcripts: DataFrame) -> DataFrame:
    """Reliability trend: per week, the share of ACTIVE conversations
    that hit at least one error — the user-facing failure rate at
    the grain the on-call review reads.

    Dedup to (conv, week, had-error) via one map-side combinable
    aggregate (max flag per (conv, week)), then a |weeks|-row
    rollup. Exact counts; the share is one shared float.

    Emits ``week_ts, n_convs, n_with_error, error_share``.
    """
    per = transcripts.groupBy(
        "conv_id", F.date_trunc("week", F.col("ts")).alias("week_ts")
    ).agg(
        F.max(F.when(F.col("role") == "error", 1).otherwise(0))
        .cast("long")
        .alias("had_error")
    )
    agg = per.groupBy("week_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("had_error").cast("long").alias("n_with_error"),
    )
    return agg.select(
        "week_ts",
        "n_convs",
        "n_with_error",
        F.expr(
            "round(CAST(n_with_error AS DOUBLE)"
            " / CAST(n_convs AS DOUBLE), 6)"
        ).alias("error_share"),
    )


def audience_overlap_weekly(transcripts: DataFrame) -> DataFrame:
    """Day-vs-week-ago audience overlap: for each day, the exact
    Jaccard similarity between the set of conversations active that
    day and the set active 7 days earlier — how much of the audience
    is the SAME users cycling weekly vs churning through new ones.
    The set-intersection companion to the rolling-active counts
    (active_7d sizes the union; this measures the overlap).

    The intersection needs no set materialization: activity dedups
    to (conv, day) once, the week-ago copy shifts its day key +7,
    and the co-partitioned (conv, day) self-join counts matches —
    three aggregates riding one exchange family, |days| output rows.
    A day with no week-ago audience emits NULL jaccard (0/0), the
    same convention both engines reach by SQL null division.

    Emits ``day, n_today, n_week_ago, n_both, jaccard,
    return_share`` (share of the week-ago audience that came back).
    """
    day = F.date_trunc("day", F.col("ts"))
    act = transcripts.select(
        "conv_id", day.alias("day")
    ).distinct()
    shifted = act.select(
        "conv_id", (F.col("day") + F.expr("INTERVAL 7 DAYS")).alias("day")
    )
    both = (
        act.join(shifted, ["conv_id", "day"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    today = act.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_today")
    )
    week_ago = shifted.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_week_ago")
    )
    joined = (
        today.join(F.broadcast(week_ago), "day", "left")
        .join(F.broadcast(both), "day", "left")
        .select(
            "day",
            "n_today",
            F.coalesce(F.col("n_week_ago"), F.lit(0))
            .cast("long")
            .alias("n_week_ago"),
            F.coalesce(F.col("n_both"), F.lit(0))
            .cast("long")
            .alias("n_both"),
        )
    )
    return joined.select(
        "day",
        "n_today",
        "n_week_ago",
        "n_both",
        F.expr(
            "CASE WHEN n_today + n_week_ago - n_both > 0 THEN"
            " round(CAST(n_both AS DOUBLE)"
            " / CAST(n_today + n_week_ago - n_both AS DOUBLE), 6) END"
        ).alias("jaccard"),
        F.expr(
            "CASE WHEN n_week_ago > 0 THEN"
            " round(CAST(n_both AS DOUBLE)"
            " / CAST(n_week_ago AS DOUBLE), 6) END"
        ).alias("return_share"),
    )
