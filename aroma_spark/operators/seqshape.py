"""Sequence-shape analytics per conversation: rank correlation, role
streaks, drawdown-from-peak, local extrema, outage gaps, and the
calendar activity heatmap.

The "what does this series LOOK like" family that rounds out the
moment-based stats (operators/stats.py) and the smoothing/changepoint
detectors (operators/smoothing.py, operators/anomaly.py): monotone
association robust to outliers (Spearman), run structure (streaks),
worst excursion below the running peak (drawdown — the SRE "how far did
throughput fall from its high-water mark" question), oscillation
density (local extrema), SLA-breach gaps (outages), and the
day-of-week x hour-of-day load matrix every capacity dashboard draws.

House bit-determinism discipline (see operators/stats.py module
docstring): everything shuffled or summed is an exact int64; floats
appear only in ONE fixed final expression shape shared with the DuckDB
twin. Spearman needs fractional average ranks for ties, so it sums
DOUBLED ranks (2*rank + ties - 1, an exact int64) — Pearson r is
invariant under the affine map rank -> 2*rank, and the doubled form
keeps every sufficient statistic integral.

Physical shape at 100 TB: every per-conversation operator here is one
window pass and/or one aggregation on the canonical conv_id exchange —
the same partitioning every other per-conversation operator rides; the
heatmap aggregates onto a fixed 7x24-key grid (map-side combine, 168
output rows, no skew possible).

No reference analog (the reference computes no sequence statistics);
natural extensions of the north_star's derived-signal family over the
fixed signal schema of operators/signals.py (reference
src/aroma/preprocessing/intertimes.py:44-80 for the inter-time signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aroma_spark.operators.stats import MIN_PAIRS, _corr_expr

# epoch day 0 (1970-01-01) was a Thursday; with Monday=0 that is dow 3.
# Computing dow/hod from integer epoch arithmetic (not calendar
# functions) keeps the oracle engine-neutral: Spark's dayofweek() is
# 1=Sunday while DuckDB's dow is 0=Sunday — an off-by-one trap the
# integer form cannot have. Valid for ts >= 1970 (synth corpus is).
_EPOCH_DOW_OFFSET = 3
_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000


def spearman_corr(
    signals: DataFrame,
    x_col: str = "text_len",
    y_col: str = "inter_time_us",
) -> DataFrame:
    """Per-conversation Spearman rank correlation between two integer
    signals — the outlier-robust twin of :func:`stats.signal_corr`
    (one pathological 10-hour gap dominates Pearson; ranks cap its
    leverage at n).

    Ties get the conventional AVERAGE rank. To keep the sufficient
    statistics exact int64 (house discipline), the operator sums
    DOUBLED average ranks:

        r2 = 2 * rank_min + ties - 1     (= 2 * average_rank)

    where ``rank_min`` is SQL RANK() in value order within the
    conversation and ``ties`` the size of the value's tie group.
    Pearson r is invariant under rank -> 2*rank, so the result IS
    Spearman's rho; the combination expression is the shared
    :func:`stats._corr_expr`, bit-identical across engines. Overflow
    bound: r2 <= 2n, so Sxy <= 4n^3 < 2^63 holds to n ~ 10^6 turns per
    conversation — far above any real transcript.

    Conversations with fewer than MIN_PAIRS turns are dropped; rho is
    NULL when either signal is constant (all one tie group).

    Shape: two rank windows + one tie-count window on the conv_id
    exchange, then one map-side-combinable aggregation — no shuffle
    beyond the canonical one.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    ranked = signals.select(
        "conv_id", x.alias("xv"), y.alias("yv")
    ).select(
        "conv_id",
        (
            F.rank().over(Window.partitionBy("conv_id").orderBy("xv")) * 2
            + F.count(F.lit(1)).over(Window.partitionBy("conv_id", "xv"))
            - 1
        ).cast("long").alias("rx"),
        (
            F.rank().over(Window.partitionBy("conv_id").orderBy("yv")) * 2
            + F.count(F.lit(1)).over(Window.partitionBy("conv_id", "yv"))
            - 1
        ).cast("long").alias("ry"),
    )
    agg = (
        ranked.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("rx").cast("long").alias("sx"),
            F.sum("ry").cast("long").alias("sy"),
            F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
            F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
            F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        )
        .where(F.col("n_pairs") >= MIN_PAIRS)
    )
    return agg.select(
        "conv_id",
        "n_pairs",
        _corr_expr(
            F.col("n_pairs"), F.col("sx"), F.col("sy"),
            F.col("sxy"), F.col("sxx"), F.col("syy"),
        ).alias("spearman"),
    )


def longest_role_streak(transcripts: DataFrame) -> DataFrame:
    """Per-conversation longest run of consecutive same-role turns —
    classic gaps-and-islands ("did the assistant monologue for 12
    turns?"). Returns (conv_id, streak_role, streak_len, streak_start,
    n_islands); ties on length break to the EARLIEST streak (then the
    start index is unique within a conversation, so the winner is
    fully deterministic).

    Islands: within a conversation ordered by turn_idx, a run of equal
    roles has constant ``turn_idx - row_number_within(conv, role)``.
    Shape: two row_number windows + one aggregation + one top-1 window,
    all on the conv_id exchange — one shuffle total.
    """
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_role = Window.partitionBy("conv_id", "role").orderBy("turn_idx")
    islands = transcripts.select(
        "conv_id",
        "role",
        "turn_idx",
        (F.col("turn_idx") - F.row_number().over(w_role)).alias("island"),
    )
    runs = islands.groupBy("conv_id", "role", "island").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len"),
        F.min("turn_idx").cast("int").alias("streak_start"),
    )
    w_top = Window.partitionBy("conv_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    return (
        runs.select(
            "conv_id",
            "role",
            "streak_len",
            "streak_start",
            F.row_number().over(w_top).alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("conv_id"))
            .cast("long")
            .alias("n_islands"),
        )
        .where(F.col("rk") == 1)
        .select(
            "conv_id",
            F.col("role").alias("streak_role"),
            "streak_len",
            "streak_start",
            "n_islands",
        )
    )


def drawdown_stats(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Per-conversation maximum drawdown of an integer signal from its
    running peak in stable turn order — "how far below its
    high-water mark did reply length fall" (the finance max-drawdown,
    applied to any monitored series). All-int64 exact.

    Returns (conv_id, n_turns, peak, max_drawdown) where
    ``max_drawdown = max(running_peak - value) >= 0`` (0 for
    monotonically non-decreasing series and single-turn conversations).

    Shape: one running-max window + one aggregation on the conv_id
    exchange.
    """
    v = F.col(value_col).cast("long")
    w_run = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = signals.select(
        "conv_id",
        v.alias("v"),
        (F.max(v).over(w_run) - v).alias("dd"),
    )
    return dd.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max("v").cast("long").alias("peak"),
        F.max("dd").cast("long").alias("max_drawdown"),
    )


def local_extrema(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Per-conversation count of STRICT local maxima and minima of an
    integer signal in stable turn order (v > both neighbors / v < both
    neighbors; endpoints and plateau members are neither) — the
    oscillation-density measure that separates a ringing series from a
    drifting one at equal variance. All-int64 exact.

    Returns (conv_id, n_turns, n_peaks, n_troughs).

    Shape: one lag/lead window + one aggregation on the conv_id
    exchange.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    v = F.col(value_col).cast("long")
    trip = signals.select(
        "conv_id",
        v.alias("v"),
        F.lag(v, 1).over(w).alias("pv"),
        F.lead(v, 1).over(w).alias("nv"),
    )
    is_peak = (
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") > F.col("pv"))
        & (F.col("v") > F.col("nv"))
    )
    is_trough = (
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") < F.col("pv"))
        & (F.col("v") < F.col("nv"))
    )
    return trip.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(is_peak.cast("long")).cast("long").alias("n_peaks"),
        F.sum(is_trough.cast("long")).cast("long").alias("n_troughs"),
    )


def gap_outages(
    signals: DataFrame, threshold_us: int = 3_600_000_000
) -> DataFrame:
    """Per-conversation SLA-breach gaps: how many inter-turn gaps
    exceeded ``threshold_us`` and the worst one — the heartbeat-monitor
    question ("which conversations stalled for over an hour, and how
    badly"). All-int64 exact; conversations with zero breaches are
    NOT emitted (at 100 TB almost every conversation is clean — the
    filter is what keeps the result proportional to the incidents, not
    the corpus).

    Returns (conv_id, n_turns, n_outages, max_gap_us, sum_outage_us)
    where ``sum_outage_us`` totals only the breaching gaps.

    Shape: one aggregation on the conv_id exchange over the existing
    inter_time_us signal (first turn's 0 can never breach a positive
    threshold).
    """
    if threshold_us <= 0:
        raise ValueError(f"threshold_us must be > 0, got {threshold_us}")
    g = F.col("inter_time_us").cast("long")
    breach = g > F.lit(threshold_us)
    return (
        signals.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(breach.cast("long")).cast("long").alias("n_outages"),
            F.max(g).cast("long").alias("max_gap_us"),
            F.sum(F.when(breach, g).otherwise(F.lit(0)))
            .cast("long")
            .alias("sum_outage_us"),
        )
        .where(F.col("n_outages") > 0)
    )


def breach_episodes(
    signals: DataFrame, threshold_us: int = 3_600_000_000
) -> DataFrame:
    """Per-conversation breach EPISODES: consecutive turns whose
    inter-turn gap exceeds ``threshold_us``, collapsed into runs — the
    incident-shaped view of :func:`gap_outages` ("one 40-minute
    outage" instead of "eight breaching gaps"). All-int64 exact; only
    conversations with at least one episode are emitted, so output
    scales with incidents, not corpus.

    Returns (conv_id, n_episodes, max_episode_len, total_breach_turns,
    sum_breach_us) where an episode's length counts its breaching
    turns and ``n_episodes <= n_outages`` always.

    Shape: gaps-and-islands restricted to the (rare) breaching rows —
    one row_number window + two aggregations, all on the conv_id
    exchange. The filter runs FIRST, so the windows see only incident
    rows.
    """
    if threshold_us <= 0:
        raise ValueError(f"threshold_us must be > 0, got {threshold_us}")
    g = F.col("inter_time_us").cast("long")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    breaches = signals.where(g > F.lit(threshold_us)).select(
        "conv_id",
        "turn_idx",
        g.alias("gap_us"),
        (F.col("turn_idx") - F.row_number().over(w)).alias("island"),
    )
    episodes = breaches.groupBy("conv_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("ep_len"),
        F.sum("gap_us").cast("long").alias("ep_us"),
    )
    return episodes.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_episodes"),
        F.max("ep_len").cast("long").alias("max_episode_len"),
        F.sum("ep_len").cast("long").alias("total_breach_turns"),
        F.sum("ep_us").cast("long").alias("sum_breach_us"),
    )


def record_turns(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Per-conversation count of RECORD turns — turns whose value
    strictly exceeds every earlier value in stable turn order (the
    first turn is a record by convention). The classic
    record-statistics measure: an i.i.d. series sets ~ln(n) records;
    a trending one sets far more. All-int64 exact.

    Returns (conv_id, n_turns, n_records, last_record_turn).

    Shape: one running-max window (offset one row back) + one
    aggregation on the conv_id exchange.
    """
    v = F.col(value_col).cast("long")
    w_prev = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = signals.select(
        "conv_id",
        "turn_idx",
        (F.max(v).over(w_prev).isNull() | (v > F.max(v).over(w_prev)))
        .cast("long")
        .alias("is_record"),
    )
    return flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("is_record").cast("long").alias("n_records"),
        F.max(
            F.when(F.col("is_record") == 1, F.col("turn_idx"))
        ).cast("int").alias("last_record_turn"),
    )


def longest_monotone_run(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Per-conversation longest STRICTLY INCREASING run of an integer
    signal in stable turn order, measured in TURNS (a run of k
    consecutive increases spans k+1 turns; every conversation has a
    run of at least 1). The trend-persistence twin of
    :func:`local_extrema`. All-int64 exact.

    Returns (conv_id, n_turns, longest_inc_run).

    Shape: one lag window to flag increases, gaps-and-islands over the
    increase rows (their row_number vs the conversation row_number),
    then a per-conversation aggregate LEFT-JOINED back to the
    conversation totals — all joins and windows on the one conv_id
    exchange.
    """
    v = F.col(value_col).cast("long")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    base = signals.select(
        "conv_id",
        "turn_idx",
        v.alias("v"),
        F.row_number().over(w).alias("rn"),
        F.lag(v, 1).over(w).alias("pv"),
    )
    incs = base.where(F.col("pv").isNotNull() & (F.col("v") > F.col("pv")))
    islands = incs.select(
        "conv_id",
        (F.col("rn") - F.row_number().over(w)).alias("island"),
    )
    runs = (
        islands.groupBy("conv_id", "island")
        .agg(F.count(F.lit(1)).cast("long").alias("n_incs"))
        .groupBy("conv_id")
        .agg(F.max("n_incs").alias("max_incs"))
    )
    totals = base.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    return totals.join(runs, "conv_id", "left").select(
        "conv_id",
        "n_turns",
        (F.coalesce(F.col("max_incs"), F.lit(0)) + F.lit(1))
        .cast("long")
        .alias("longest_inc_run"),
    )


def activity_heatmap(transcripts: DataFrame) -> DataFrame:
    """Day-of-week x hour-of-day (UTC) load matrix: turn count and
    distinct-conversation count per (dow, hod) cell — the 7x24 heatmap
    every capacity dashboard draws. ``dow`` is 0=Monday..6=Sunday,
    derived from integer epoch arithmetic (module constant note: the
    calendar functions disagree across engines; ``(epoch_day + 3) % 7``
    cannot).

    Returns (dow, hod, n_turns, n_convs). Shape: one aggregation onto
    a FIXED 168-key grid — map-side combine collapses every partition
    to <= 168 partial rows, so the shuffle is O(partitions), not
    O(rows), and skew is structurally impossible. The count-distinct
    adds the standard two-phase expansion on (dow, hod, conv_id);
    at 100 TB prefer the HLL sketch variant (operators/sketches.py)
    if +-1% on n_convs is acceptable.
    """
    # exact int64 DIV (not double `/` + cast: a correctly-rounded double
    # quotient can truncate to the wrong day at values near an integer)
    dow = F.expr(
        f"CAST((unix_micros(ts) DIV {_US_PER_DAY}"
        f" + {_EPOCH_DOW_OFFSET}) % 7 AS INT)"
    )
    hod = F.expr(f"CAST((unix_micros(ts) DIV {_US_PER_HOUR}) % 24 AS INT)")
    return (
        transcripts.select(
            dow.alias("dow"),
            hod.alias("hod"),
            "conv_id",
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
    )


def turn_overlap(transcripts: DataFrame) -> DataFrame:
    """Token-set Jaccard overlap between each turn and its predecessor
    — the agent-loop / self-repetition detector: a run of turns whose
    distinct-token sets barely change is the classic signature of an
    agent stuck retrying the same action, and the per-pair overlap is
    the per-turn evidence an alerting rule aggregates.

    Tokenization is the corpus-standard whitespace split on
    lower(trim(text)) shared with functions/text.py; each turn
    contributes its DISTINCT token set, adjacency is turn_idx - 1 (the
    normalized transcript frame has dense per-conversation turn
    indices — sources/transcripts.py W2). |A∩B| comes from an
    equi-join on (conv_id, term) between a turn and its successor —
    set sizes and the intersection are exact int64, union by
    inclusion-exclusion, and Jaccard is ONE rounded division (NULL
    when both sets are empty).

    Physical shape at 100 TB: tokens explode on the conv_id exchange;
    the intersection is a (conv_id, term) self-equi-join — candidate
    pairs only ever meet inside one conversation at adjacent turns,
    never across conversations. No list UDFs, no per-row Python.

    Emits one row per turn with a predecessor: ``conv_id, turn_idx,
    n_terms, n_prev_terms, n_common, jaccard``.
    """
    c = F.coalesce(F.col("text"), F.lit(""))
    toks = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.explode(F.split(F.lower(F.trim(c)), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    sizes = toks.groupBy("conv_id", "turn_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_set")
    )
    common = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("a.turn_idx") == F.col("b.turn_idx") - 1)
            & (F.col("a.term") == F.col("b.term")),
        )
        .groupBy(F.col("b.conv_id").alias("conv_id"), F.col("b.turn_idx").alias("turn_idx"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    spine = transcripts.select("conv_id", "turn_idx").where(
        F.col("turn_idx") >= 1
    )
    cur = sizes.select(
        "conv_id", "turn_idx", F.col("n_set").alias("n_terms")
    )
    prev = sizes.select(
        "conv_id",
        (F.col("turn_idx") + 1).alias("turn_idx"),
        F.col("n_set").alias("n_prev_terms"),
    )
    out = (
        spine.join(cur, ["conv_id", "turn_idx"], "left")
        .join(prev, ["conv_id", "turn_idx"], "left")
        .join(common, ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.coalesce("n_prev_terms", F.lit(0))
            .cast("long")
            .alias("n_prev_terms"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        )
    )
    union = (
        F.col("n_terms") + F.col("n_prev_terms") - F.col("n_common")
    )
    return out.select(
        "conv_id",
        "turn_idx",
        "n_terms",
        "n_prev_terms",
        "n_common",
        F.when(
            union > 0,
            F.round(F.col("n_common").cast("double") / union.cast("double"), 6),
        ).alias("jaccard"),
    )


def underwater_streaks(
    signals: DataFrame,
    value_col: str = "text_len",
    min_turns: int = 2,
) -> DataFrame:
    """Drawdown DURATION per conversation: how long does the signal
    stay below its running maximum? The time-axis companion to the
    magnitude drawdown (:func:`drawdown`): a deep one-turn dip and a
    shallow twenty-turn slump have the same max-drawdown but opposite
    duration profiles.

    A turn is "underwater" when its value is strictly below the
    running max of all PRIOR turns' values (the first turn never is).
    Consecutive underwater turns form islands via the is-start flag
    cumulative (the gaps-and-islands pattern of
    cohorts.active_day_streaks, here over turn order). All exact
    int64, two window passes on the canonical conv_id exchange, one
    aggregation pair.

    Emits ``conv_id, n_turns, n_underwater, n_drawdowns,
    max_drawdown_len`` for conversations with >= ``min_turns`` turns.
    """
    w_seq = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_prior = w_seq.rowsBetween(Window.unboundedPreceding, -1)
    v = F.col(value_col).cast("long")
    marked = signals.select(
        "conv_id",
        "turn_idx",
        (v < F.max(v).over(w_prior)).alias("under"),
    )
    flagged = marked.select(
        "conv_id",
        "turn_idx",
        "under",
        (
            F.col("under")
            & ~F.coalesce(F.lag("under").over(w_seq), F.lit(False))
        ).alias("is_start"),
    )
    islanded = flagged.select(
        "conv_id",
        "under",
        F.sum(F.when(F.col("is_start"), 1).otherwise(0))
        .over(w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    per_island = (
        islanded.where(F.col("under"))
        .groupBy("conv_id", "island")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
    )
    totals = signals.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    agg = per_island.groupBy("conv_id").agg(
        F.sum("len").cast("long").alias("n_underwater"),
        F.count(F.lit(1)).cast("long").alias("n_drawdowns"),
        F.max("len").cast("long").alias("max_drawdown_len"),
    )
    out = (
        totals.where(F.col("n_turns") >= min_turns)
        .join(agg, "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            F.coalesce(F.col("n_underwater"), F.lit(0))
            .cast("long")
            .alias("n_underwater"),
            F.coalesce(F.col("n_drawdowns"), F.lit(0))
            .cast("long")
            .alias("n_drawdowns"),
            F.coalesce(F.col("max_drawdown_len"), F.lit(0))
            .cast("long")
            .alias("max_drawdown_len"),
        )
    )
    return out
