"""Sessionization: split conversations into sessions at inactivity gaps.

The classic asynchronous-series derived structure (and the batch twin of
streaming ``session_window``): a session break occurs where the
inter-turn gap exceeds the threshold; session ids are a running sum of
break flags per conversation — one window pass over the conv_id
exchange the signal pipeline already created, no extra shuffle.

Generalizes the reference's treatment of irregular inter-arrival times
(inter-times, src/aroma/preprocessing/intertimes.py:83-104) into a
segmentation operator; no session concept exists in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_ids(
    transcripts: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Append ``session_idx`` (0-based per conversation).

    A turn starts a new session when its gap from the previous turn
    exceeds ``gap`` (strictly greater; first turn starts session 0).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    ts_us = F.unix_micros(F.col("ts"))
    gap_micros = F.lit(_interval_to_us(gap))
    brk = (
        F.when(ts_us - F.lag(ts_us, 1).over(w) > gap_micros, 1)
        .otherwise(0)
        .cast("long")
    )
    return transcripts.select(
        "*", F.sum(brk).over(wrun).cast("long").alias("session_idx")
    )


_INTERVAL_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def _interval_to_us(gap: str) -> int:
    qty, unit = gap.split()
    if unit not in _INTERVAL_US:
        raise ValueError(
            f"unsupported interval unit {unit!r}; supported: "
            f"{sorted(set(_INTERVAL_US))}"
        )
    return int(qty) * _INTERVAL_US[unit]


def session_stats(transcripts: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-session aggregates: bounds, turn count, duration, tool calls."""
    s = with_session_ids(transcripts, gap)
    return s.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("long")
        .alias("duration_us"),
        F.sum(
            F.when((F.col("tool").isNotNull()) & (F.col("tool") != ""), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_tool_calls"),
    )


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """Role-to-role transition matrix — the Markov view of conversation
    structure ("what follows a tool call?", "how often does the user
    speak twice in a row?") that powers turn-taking QA on a transcript
    corpus and anomaly cuts ("conversations where assistant never
    follows user").

    One lag window over the canonical (conv_id, turn_idx) order — the
    exchange every per-conversation operator shares — then ONE
    aggregation on the (prev_role, role) pair: n_transitions (total
    edges) and n_convs (distinct conversations exhibiting the edge).
    Output cardinality is |roles|^2 — tiny at any corpus scale, so the
    final exchange is negligible; the distinct-count is exact
    (per-pair conv sets are bounded by the corpus conv count, and
    Spark's two-phase distinct aggregation handles the skew).

    All outputs exact integers; first turns (no predecessor) contribute
    no edge. Reference analog: none (the reference never inspects
    role adjacency); natural extension of the vocab/role family
    (src/aroma/preprocessing/vocab.py builds role vocabularies — this
    is the bigram view of the same column).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    edges = transcripts.select(
        "conv_id", prev.alias("prev_role"), F.col("role")
    ).where(F.col("prev_role").isNotNull())
    return edges.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
    )


def transition_latency(transcripts: DataFrame) -> DataFrame:
    """Turn-taking latency statistics per role transition — the timing
    companion to :func:`role_transitions` ("how long does the assistant
    take to follow a user turn vs a tool result?"). For every adjacent
    (prev_role -> role) edge in stable turn order, the gap
    epoch_us(ts) - epoch_us(prev_ts) aggregates to exact int64
    n / sum / min / max per edge; means and quantiles derive downstream
    (``exact_median_by_bucket`` / ``histogram_quantiles`` for the
    distributional view).

    Same physical shape as role_transitions: one lag window on the
    canonical conv_id exchange, ONE |roles|^2-row aggregation with
    map-side combine absorbing the hot user->assistant key. Gaps can be
    negative when the warehouse holds out-of-order timestamps under the
    deterministic (ts, event_id) turn order tie-break — min_latency_us
    reports that honestly rather than clamping.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    edges = transcripts.select(
        F.lag("role").over(w).alias("prev_role"),
        F.col("role"),
        gap.alias("gap_us"),
    ).where(F.col("prev_role").isNotNull())
    return edges.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum("gap_us").cast("long").alias("sum_latency_us"),
        F.min("gap_us").cast("long").alias("min_latency_us"),
        F.max("gap_us").cast("long").alias("max_latency_us"),
    )


def conversation_kpis(
    transcripts: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per-conversation KPI summary — the entity-level table a dashboard
    or cohort query joins against: turn volume, session count (at the
    ``gap`` inactivity rule), time bounds/duration, tool usage, text
    volume, role mix.

    One window pass (the session ids, riding the canonical conv_id
    exchange) + ONE aggregation on the same key — no extra shuffle; at
    100 TB the output is one row per conversation, the natural unit of
    retention for this table. All outputs exact integers/timestamps.
    """
    s = with_session_ids(transcripts, gap)
    return s.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        (F.max("session_idx") + 1).cast("long").alias("n_sessions"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("long")
        .alias("duration_us"),
        F.sum(
            F.when(
                (F.col("tool").isNotNull()) & (F.col("tool") != ""), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_tool_calls"),
        F.sum(F.coalesce(F.length("text"), F.lit(0)))
        .cast("long")
        .alias("sum_text_len"),
        F.countDistinct("role").cast("long").alias("n_roles"),
    )


def tool_usage(signals: DataFrame) -> DataFrame:
    """Per-tool usage rollup over the signal frame: call volume,
    distinct conversations touching the tool, text volume of the
    invoking turns, and the exact int64 latency sum of those turns —
    the "which tools carry the load, and are they slow" table an
    agent-transcript dashboard leads with.

    Only turns with a non-empty ``tool`` are counted (the signal
    frame's ``tool_call`` definition, operators/signals.py). All
    sums exact int64; no float appears at all.

    Shape at 100 TB: ONE hash aggregation keyed by tool name — tool
    cardinality is tiny and fixed, so map-side combine collapses every
    partition to a handful of partial rows; the count-distinct adds
    the standard two-phase expansion on (tool, conv_id).
    """
    used = signals.where(
        F.col("tool").isNotNull() & (F.col("tool") != "")
    )
    return used.groupBy("tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.sum(F.col("text_len").cast("long")).cast("long")
        .alias("sum_text_len"),
        F.sum(F.col("inter_time_us").cast("long")).cast("long")
        .alias("sum_latency_us"),
    )


def hhi_sql() -> str:
    """The ONE float expression for the Herfindahl-Hirschman
    concentration index over exact int64 columns sum_sq (sum of
    squared per-role volumes) and total (their sum): HHI =
    sum_sq / total^2, in (1/n_roles, 1]. NULL when total is zero."""
    return (
        "CASE WHEN total > 0 THEN round(CAST(sum_sq AS DOUBLE)"
        " / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6) END"
    )


def role_concentration(signals: DataFrame) -> DataFrame:
    """Who dominates each conversation? The Herfindahl-Hirschman index
    of per-role text volume: HHI = sum over roles of (share)^2 — 1.0
    is a monologue, 1/n_roles is perfectly balanced. The
    conversation-level concentration measure next to the corpus-level
    Gini (distribution.gini_turns).

    The rational identity HHI = (sum of squared role volumes) /
    (total volume)^2 keeps everything int64 until ONE shared float
    expression (:func:`hhi_sql`): per-role sums ride the canonical
    conv_id exchange, the squares are exact (safe while a
    conversation's per-role text volume stays < ~3e9 chars), and the
    second aggregation is keyed on the same conv_id — no new shuffle.

    Emits ``conv_id, n_roles, total_text_len, top_role_text_len,
    hhi`` for conversations with any text.
    """
    per_role = signals.groupBy("conv_id", "role").agg(
        F.sum("text_len").cast("long").alias("v")
    )
    agg = (
        per_role.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_roles"),
            F.sum("v").cast("long").alias("total"),
            F.max("v").cast("long").alias("top_role_text_len"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("sum_sq"),
        )
        .filter(F.col("total") > 0)
    )
    return agg.select(
        "conv_id",
        "n_roles",
        F.col("total").alias("total_text_len"),
        "top_role_text_len",
        F.expr(hhi_sql()).alias("hhi"),
    )


def session_gap_sweep(
    transcripts: DataFrame,
    gaps_seconds: tuple[int, ...] = (900, 1800, 3600),
) -> DataFrame:
    """Sensitivity of sessionization to the idle-gap threshold, in ONE
    corpus pass: how many sessions does each candidate gap produce,
    and how big are they on average? The tuning table you consult
    BEFORE fixing the 30-minute default — if 15m and 60m give nearly
    the same session count, the corpus has a clear bimodal gap
    distribution and the choice is safe.

    The identity n_sessions(G) = n_convs + #{inter-arrival gaps > G}
    turns the sweep into conditional counts over ONE lag pass — no
    per-gap re-sessionization, no extra shuffles; adding a gap
    candidate adds one counter. All counts exact int64; mean session
    length is the one shared float per row.

    Emits one row per candidate gap: ``gap_seconds, n_convs, n_turns,
    n_sessions, avg_turns_per_session``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts_us = F.unix_micros(F.col("ts"))
    dt = (ts_us - F.lag(ts_us, 1).over(w)).alias("dt_us")
    base = transcripts.select("conv_id", dt)
    agg = base.agg(
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        *[
            F.sum(
                F.when(F.col("dt_us") > g * 1_000_000, 1).otherwise(0)
            )
            .cast("long")
            .alias(f"b{g}")
            for g in gaps_seconds
        ],
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).cast("long").alias("gap_seconds"),
                        F.col("n_convs"),
                        F.col("n_turns"),
                        (F.col("n_convs") + F.col(f"b{g}"))
                        .cast("long")
                        .alias("n_sessions"),
                    )
                    for g in gaps_seconds
                ]
            )
        ).alias("p")
    ).select("p.gap_seconds", "p.n_convs", "p.n_turns", "p.n_sessions")
    return rows.select(
        "gap_seconds",
        "n_convs",
        "n_turns",
        "n_sessions",
        F.expr(
            "round(CAST(n_turns AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)"
        ).alias("avg_turns_per_session"),
    )


def alternation_rate(transcripts: DataFrame, min_turns: int = 2) -> DataFrame:
    """Role alternation rate per conversation: what fraction of
    adjacent turn pairs changes speaker? 1.0 is strict ping-pong
    dialogue; near 0 is a monologue or an agent talking to itself —
    the per-conversation scalar whose corpus-wide matrix is
    :func:`role_transitions`.

    One lag window on the canonical (conv_id, turn_idx) order, one
    aggregation; counts exact int64, the rate one shared float.

    Emits ``conv_id, n_turns, n_pairs, n_switches, alternation`` for
    conversations with >= ``min_turns`` turns.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    marked = transcripts.select(
        "conv_id",
        prev.isNotNull().alias("has_prev"),
        (prev.isNotNull() & (prev != F.col("role"))).alias("switched"),
    )
    agg = (
        marked.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(F.when(F.col("has_prev"), 1).otherwise(0))
            .cast("long")
            .alias("n_pairs"),
            F.sum(F.when(F.col("switched"), 1).otherwise(0))
            .cast("long")
            .alias("n_switches"),
        )
        .filter(F.col("n_turns") >= min_turns)
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_pairs",
        "n_switches",
        F.expr(
            "round(CAST(n_switches AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)"
        ).alias("alternation"),
    )


def idle_share_daily(
    signals: DataFrame, idle_threshold_us: int = 60_000_000
) -> DataFrame:
    """Idle-time share per start day: how much of the conversations'
    wall-clock is spent in gaps longer than ``idle_threshold_us``?
    The "is the agent waiting or working" report, rolled up over the
    conversations that STARTED each day.

    Per conversation the span is the sum of its inter-turn gaps
    (first turn's inter_time_us is 0 by the signals contract, so the
    sum IS last-ts minus first-ts) and the idle part is the sum of
    gaps past the threshold — both exact int64 µs riding the
    canonical conv_id exchange; the daily rollup is map-side
    combinable; the share is one shared float guarded for zero-span
    days.

    Emits ``day_ts, n_convs, sum_span_us, sum_idle_us, n_idle_gaps,
    idle_share``.
    """
    per_conv = signals.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day_ts"),
        F.sum("inter_time_us").cast("long").alias("span_us"),
        F.sum(
            F.when(
                F.col("inter_time_us") > F.lit(int(idle_threshold_us)),
                F.col("inter_time_us"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("idle_us"),
        F.sum(
            F.when(
                F.col("inter_time_us") > F.lit(int(idle_threshold_us)), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_idle_gaps"),
    )
    agg = per_conv.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("span_us").cast("long").alias("sum_span_us"),
        F.sum("idle_us").cast("long").alias("sum_idle_us"),
        F.sum("n_idle_gaps").cast("long").alias("n_idle_gaps"),
    )
    return agg.select(
        "day_ts",
        "n_convs",
        "sum_span_us",
        "sum_idle_us",
        "n_idle_gaps",
        F.expr(
            "CASE WHEN sum_span_us > 0 THEN round(CAST(sum_idle_us"
            " AS DOUBLE) / CAST(sum_span_us AS DOUBLE), 6) END"
        ).alias("idle_share"),
    )


def role_cooccurrence(transcripts: DataFrame) -> DataFrame:
    """Which event roles appear TOGETHER in a conversation? The
    corpus co-occurrence matrix over distinct per-conversation role
    sets, with the exact Jaccard affinity of every unordered role
    pair — the "users who click also purchase?" structure report.

    Scale shape: dedup to (conv, role) first (map-side combinable —
    10^12 turns collapse to at most |convs| x |roles| rows), then a
    SELF-JOIN ON conv_id of that deduped slice with the role_a <
    role_b triangle filter — fan-out bounded at |roles|^2/2 per
    conversation, never turn-squared. The pair aggregate is map-side
    combinable into |roles|^2/2 rows; per-role conversation counts
    join in as a broadcast |roles|-row dimension. Counts exact
    int64; Jaccard is one shared float.

    Emits ``role_a, role_b, n_both, n_a, n_b, jaccard``.
    """
    cr = transcripts.select("conv_id", "role").distinct()
    a = cr.select("conv_id", F.col("role").alias("role_a"))
    b = cr.select(F.col("conv_id").alias("conv_id_b"),
                  F.col("role").alias("role_b"))
    pairs = a.join(
        b,
        (a["conv_id"] == b["conv_id_b"])
        & (F.col("role_a") < F.col("role_b")),
    ).groupBy("role_a", "role_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    per_role = cr.groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    ra = per_role.select(
        F.col("role").alias("ra"), F.col("n_convs").alias("n_a")
    )
    rb = per_role.select(
        F.col("role").alias("rb"), F.col("n_convs").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(ra), F.col("role_a") == F.col("ra"))
        .join(F.broadcast(rb), F.col("role_b") == F.col("rb"))
    )
    return out.select(
        "role_a",
        "role_b",
        "n_both",
        "n_a",
        "n_b",
        F.expr(
            "round(CAST(n_both AS DOUBLE)"
            " / CAST(n_a + n_b - n_both AS DOUBLE), 6)"
        ).alias("jaccard"),
    )


def trigram_transitions(transcripts: DataFrame) -> DataFrame:
    """Two-step role paths: counts of every (role[t-2], role[t-1],
    role[t]) trigram in the canonical turn order, with the
    conditional continuation share P(cur | prev2, prev1) — the
    second-order structure that :func:`role_transitions` (first
    order) cannot see (e.g. view->click->purchase vs
    click->view->purchase).

    ONE lag window on the canonical (conv_id, turn_idx) order — both
    lags ride the same window spec, so Catalyst evaluates them in a
    single Window node on one conv_id exchange — then a map-side
    combinable aggregate into at most |roles|^3 rows; the pair total
    joins back as a broadcast |roles|^2 dimension. Counts exact
    int64; the share is one shared float.

    Emits ``prev2, prev1, cur, n, pair_n, cond_share``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tri = transcripts.select(
        F.lag("role", 2).over(w).alias("prev2"),
        F.lag("role", 1).over(w).alias("prev1"),
        F.col("role").alias("cur"),
    ).where(F.col("prev2").isNotNull())
    counts = tri.groupBy("prev2", "prev1", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    pair_tot = counts.groupBy(
        F.col("prev2").alias("p2"), F.col("prev1").alias("p1")
    ).agg(F.sum("n").cast("long").alias("pair_n"))
    out = counts.join(
        F.broadcast(pair_tot),
        (F.col("prev2") == F.col("p2")) & (F.col("prev1") == F.col("p1")),
    )
    return out.select(
        "prev2",
        "prev1",
        "cur",
        "n",
        "pair_n",
        F.expr(
            "round(CAST(n AS DOUBLE) / CAST(pair_n AS DOUBLE), 6)"
        ).alias("cond_share"),
    )


def boundary_roles(transcripts: DataFrame) -> DataFrame:
    """How do conversations open and close? Counts of every (first
    role, last role) pair under the canonical turn order, with the
    share of all conversations — the session outcome matrix (opened
    with a view, ended with a purchase vs. ended with an error).

    ONE aggregation per conversation riding the canonical conv_id
    exchange — first/last are min/max struct tricks over (turn_idx,
    role), exact because turn_idx is a total order within the
    conversation — then a map-side combinable |roles|^2 rollup with
    the corpus total broadcast in. Counts exact int64; the share is
    one shared float.

    Emits ``first_role, last_role, n_convs, total_convs, share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.min(F.struct("turn_idx", "role"))["role"].alias("first_role"),
        F.max(F.struct("turn_idx", "role"))["role"].alias("last_role"),
    )
    counts = per_conv.groupBy("first_role", "last_role").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    # corpus total as a global window over the |roles|^2-row
    # aggregate — ONE pass; a crossJoin against counts.agg() would
    # re-execute the whole per-conversation subtree
    counts = counts.withColumn(
        "total_convs",
        F.sum("n_convs").over(Window.partitionBy()).cast("long"),
    )
    return counts.select(
        "first_role",
        "last_role",
        "n_convs",
        "total_convs",
        F.expr(
            "round(CAST(n_convs AS DOUBLE)"
            " / CAST(total_convs AS DOUBLE), 6)"
        ).alias("share"),
    )


def depth_tool_rate(transcripts: DataFrame) -> DataFrame:
    """Do longer conversations lean harder on tools? Tool-call rate
    per conversation-length bucket (power-of-two depth buckets via
    integer bit-length, the histogram discipline) — the
    capability-vs-verbosity curve.

    ONE aggregation per conversation (turn count + tool count on the
    conv_id exchange), map-side bucketing, then a ~30-row rollup.
    Counts exact int64; the per-turn tool rate is one shared float.

    Emits ``bucket, lo_turns, n_convs, sum_turns, sum_tool_calls,
    tool_rate``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != ""), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_tools"),
    )
    bucketed = per_conv.select(
        (F.length(F.conv(F.col("n_turns"), 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        "n_turns",
        "n_tools",
    )
    agg = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("n_turns").cast("long").alias("sum_turns"),
        F.sum("n_tools").cast("long").alias("sum_tool_calls"),
    )
    return agg.select(
        "bucket",
        F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)").alias("lo_turns"),
        "n_convs",
        "sum_turns",
        "sum_tool_calls",
        F.expr(
            "round(CAST(sum_tool_calls AS DOUBLE)"
            " / CAST(sum_turns AS DOUBLE), 6)"
        ).alias("tool_rate"),
    )


def tool_latency_contrast(signals: DataFrame) -> DataFrame:
    """Are tool turns slower to arrive than plain turns? Daily
    contrast of inter-turn latency for tool-bearing vs plain turns —
    the "does tool use cost wall-clock" report.

    Rides the signals frame's precomputed ``tool_call`` 0/1 column
    (the tool string itself never shuffles). ONE map-side
    combinable aggregate per (day, is_tool) folded into a |days|-row
    pivot via conditional sums. Latencies exact int64 µs;
    integer-quotient means (1e11 magnitudes); the ratio of means is
    one shared float over four exact ints, guarded for empty sides.

    Emits ``day_ts, n_tool, n_plain, sum_tool_us, sum_plain_us,
    mean_tool_us, mean_plain_us, tool_plain_ratio``.
    """
    is_tool = F.col("tool_call") == 1
    agg = signals.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(
        F.sum(F.when(is_tool, 1).otherwise(0)).cast("long").alias("n_tool"),
        F.sum(F.when(~is_tool, 1).otherwise(0))
        .cast("long")
        .alias("n_plain"),
        F.sum(F.when(is_tool, F.col("inter_time_us")).otherwise(0))
        .cast("long")
        .alias("sum_tool_us"),
        F.sum(F.when(~is_tool, F.col("inter_time_us")).otherwise(0))
        .cast("long")
        .alias("sum_plain_us"),
    )
    return agg.select(
        "day_ts",
        "n_tool",
        "n_plain",
        "sum_tool_us",
        "sum_plain_us",
        F.expr(
            "CASE WHEN n_tool > 0 THEN"
            " CAST(sum_tool_us div n_tool AS BIGINT) END"
        ).alias("mean_tool_us"),
        F.expr(
            "CASE WHEN n_plain > 0 THEN"
            " CAST(sum_plain_us div n_plain AS BIGINT) END"
        ).alias("mean_plain_us"),
        F.expr(
            "CASE WHEN n_tool > 0 AND n_plain > 0 AND sum_plain_us > 0"
            " THEN round((CAST(sum_tool_us AS DOUBLE)"
            " * CAST(n_plain AS DOUBLE))"
            " / (CAST(sum_plain_us AS DOUBLE)"
            " * CAST(n_tool AS DOUBLE)), 6) END"
        ).alias("tool_plain_ratio"),
    )


def tool_diversity(transcripts: DataFrame) -> DataFrame:
    """Tool-repertoire histogram: how many DISTINCT tools does a
    conversation touch? The capability-breadth distribution (0 =
    pure dialogue, k = the whole toolbox), with the corpus share.

    One exact count-distinct per conversation on the conv_id
    exchange (empty/null tools excluded), then a tiny histogram
    with its share from a global window. Counts exact int64.

    Emits ``n_distinct_tools, n_convs, share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.countDistinct(
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != ""),
                F.col("tool"),
            )
        )
        .cast("long")
        .alias("n_distinct_tools")
    )
    hist = per_conv.groupBy("n_distinct_tools").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    # bounded global window: frame is the |distinct tool-counts|-row
    # histogram (<= max tools per conversation, a few dozen), not the corpus
    hist = hist.withColumn(
        "total_convs",
        F.sum("n_convs").over(Window.partitionBy()).cast("long"),
    )
    return hist.select(
        "n_distinct_tools",
        "n_convs",
        F.expr(
            "round(CAST(n_convs AS DOUBLE)"
            " / CAST(total_convs AS DOUBLE), 6)"
        ).alias("share"),
    )


def first_role_mix_daily(transcripts: DataFrame) -> DataFrame:
    """How do each day's NEW conversations open? Counts of the first
    role per start-day with the within-day share — the acquisition
    entry-point mix over time (the daily drill-down of
    :func:`boundary_roles`' corpus matrix).

    ONE min-struct aggregation per conversation on the conv_id
    exchange, a map-side combinable (day, role) rollup, the day
    total as a window sum over that small result. Counts exact
    int64; the share is one shared float.

    Emits ``day_ts, first_role, n_convs, day_convs, share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day_ts"),
        F.min(F.struct("turn_idx", "role"))["role"].alias("first_role"),
    )
    counts = per_conv.groupBy("day_ts", "first_role").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    counts = counts.withColumn(
        "day_convs",
        F.sum("n_convs")
        .over(Window.partitionBy("day_ts"))
        .cast("long"),
    )
    return counts.select(
        "day_ts",
        "first_role",
        "n_convs",
        "day_convs",
        F.expr(
            "round(CAST(n_convs AS DOUBLE) / CAST(day_convs AS DOUBLE), 6)"
        ).alias("share"),
    )


def purchase_by_depth(transcripts: DataFrame) -> DataFrame:
    """Conversion by conversation depth: of the conversations in each
    power-of-two turn-count bucket, how many contain a purchase?
    Answers "do longer sessions convert better?" — the commerce
    sibling of :func:`depth_tool_rate`.

    ONE per-conversation aggregate (count + purchase flag) on the
    conv_id exchange, integer bit-length bucketing, a ~30-row
    rollup. Counts exact int64; the conversion share is one shared
    float.

    Emits ``bucket, lo_turns, n_convs, n_with_purchase,
    purchase_share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max(F.when(F.col("role") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("has_purchase"),
    )
    bucketed = per_conv.select(
        (F.length(F.conv(F.col("n_turns"), 10, 2)) - F.lit(1))
        .cast("int")
        .alias("bucket"),
        "has_purchase",
    )
    agg = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("has_purchase").cast("long").alias("n_with_purchase"),
    )
    return agg.select(
        "bucket",
        F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)").alias("lo_turns"),
        "n_convs",
        "n_with_purchase",
        F.expr(
            "round(CAST(n_with_purchase AS DOUBLE)"
            " / CAST(n_convs AS DOUBLE), 6)"
        ).alias("purchase_share"),
    )


def error_rate_by_hour(transcripts: DataFrame) -> DataFrame:
    """Error pressure by hour of day: the share of turns that are
    ``error`` events per hour-of-day across the corpus — does the
    error rate follow load (a capacity symptom) or not (a code
    symptom)?

    ONE map-side combinable aggregation into 24 rows; the share is
    one shared float over exact counts.

    Emits ``hod, n_turns, n_errors, error_share``.
    """
    agg = transcripts.groupBy(
        F.hour("ts").cast("int").alias("hod")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    return agg.select(
        "hod",
        "n_turns",
        "n_errors",
        F.expr(
            "round(CAST(n_errors AS DOUBLE) / CAST(n_turns AS DOUBLE), 6)"
        ).alias("error_share"),
    )


def role_mix_drift_weekly(transcripts: DataFrame) -> DataFrame:
    """Weekly role-mix drift: each (week, role)'s share of the
    week's turns next to the same role's share the PREVIOUS calendar
    week (gap weeks break the chain, the dod_growth discipline) —
    the distribution-shift tripwire for the event mix.

    ONE map-side combinable (week, role) aggregate; week totals and
    the lag both run over that small result (a |weeks| x |roles|
    frame). Counts exact int64; share and drift are shared floats
    over exact counts — the drift re-derives both shares inside one
    expression rather than subtracting two pre-rounded floats.

    Emits ``week_ts, role, n_turns, week_turns, share, drift``.
    """
    cell = transcripts.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week_ts"), "role"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
    cell = cell.withColumn(
        "week_turns",
        F.sum("n_turns")
        .over(Window.partitionBy("week_ts"))
        .cast("long"),
    )
    w = Window.partitionBy("role").orderBy("week_ts")
    chain = F.lag("week_ts").over(w) == F.col("week_ts") - F.expr(
        "INTERVAL 7 DAYS"
    )
    cell = cell.select(
        "week_ts",
        "role",
        "n_turns",
        "week_turns",
        F.when(chain, F.lag("n_turns").over(w))
        .cast("long")
        .alias("prev_n"),
        F.when(chain, F.lag("week_turns").over(w))
        .cast("long")
        .alias("prev_week_turns"),
    )
    return cell.select(
        "week_ts",
        "role",
        "n_turns",
        "week_turns",
        "prev_n",
        "prev_week_turns",
        F.expr(
            "round(CAST(n_turns AS DOUBLE) / CAST(week_turns AS DOUBLE), 6)"
        ).alias("share"),
        F.expr(
            "CASE WHEN prev_week_turns > 0 THEN"
            " round(CAST(n_turns AS DOUBLE) / CAST(week_turns AS DOUBLE)"
            " - CAST(prev_n AS DOUBLE) / CAST(prev_week_turns AS DOUBLE),"
            " 6) END"
        ).alias("drift"),
    )


def weekend_mix(signals: DataFrame) -> DataFrame:
    """Weekend vs weekday activity contrast in one two-row report:
    turn counts, text volume and latency sums with each side's share
    of turns — the coarse calendar split above peak_hour_dow's
    argmax.

    ONE map-side combinable aggregate into 2 rows; the share is a
    global window over them. ``is_weekend`` uses Spark's dayofweek
    (1=Sunday, 7=Saturday). Exact int64 sums; integer-quotient mean
    latency.

    Emits ``is_weekend, n_turns, sum_text_len, sum_latency_us,
    mean_latency_us, turn_share``.
    """
    agg = signals.groupBy(
        F.dayofweek("ts").isin(1, 7).alias("is_weekend")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("text_len").cast("long").alias("sum_text_len"),
        F.sum("inter_time_us").cast("long").alias("sum_latency_us"),
    )
    # bounded global window: frame is the 2-row weekend/weekday aggregate
    agg = agg.withColumn(
        "total_turns",
        F.sum("n_turns").over(Window.partitionBy()).cast("long"),
    )
    return agg.select(
        "is_weekend",
        "n_turns",
        "sum_text_len",
        "sum_latency_us",
        F.expr(
            "CASE WHEN sum_latency_us >= 0 THEN"
            " CAST(sum_latency_us div n_turns AS BIGINT)"
            " ELSE CAST((sum_latency_us div n_turns)"
            " - (CASE WHEN sum_latency_us % n_turns <> 0 THEN 1"
            " ELSE 0 END) AS BIGINT) END"
        ).alias("mean_latency_us"),
        F.expr(
            "round(CAST(n_turns AS DOUBLE) / CAST(total_turns AS DOUBLE), 6)"
        ).alias("turn_share"),
    )


def last_role_mix_daily(transcripts: DataFrame) -> DataFrame:
    """How do each day's ENDING conversations close? Counts of the
    last role per END-day (the day of the conversation's final turn)
    with the within-day share — the outcome mix over time, the
    closing sibling of :func:`first_role_mix_daily`.

    ONE max-struct aggregation per conversation on the conv_id
    exchange, a map-side combinable (day, role) rollup, the day
    total as a window sum over the small result. Counts exact int64.

    Emits ``day_ts, last_role, n_convs, day_convs, share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.date_trunc("day", F.max("ts")).alias("day_ts"),
        F.max(F.struct("turn_idx", "role"))["role"].alias("last_role"),
    )
    counts = per_conv.groupBy("day_ts", "last_role").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    counts = counts.withColumn(
        "day_convs",
        F.sum("n_convs")
        .over(Window.partitionBy("day_ts"))
        .cast("long"),
    )
    return counts.select(
        "day_ts",
        "last_role",
        "n_convs",
        "day_convs",
        F.expr(
            "round(CAST(n_convs AS DOUBLE) / CAST(day_convs AS DOUBLE), 6)"
        ).alias("share"),
    )


def gap_dominance_daily(signals: DataFrame) -> DataFrame:
    """Is conversation wall-clock one big stall or steady progress?
    Per start-day cohort: each conversation's LARGEST single gap
    summed against its total span — dominance near 1.0 means the
    span is one dominant pause (an abandoned-and-resumed session);
    near 1/n means uniform pacing.

    ONE per-conversation aggregate (max + sum of inter_time_us on
    the conv_id exchange), then a map-side combinable per-day
    rollup; the corpus-level dominance ratio is one shared float
    over two exact sums, guarded for zero-span days.

    Emits ``day_ts, n_convs, sum_max_gap_us, sum_span_us,
    dominance``.
    """
    per_conv = signals.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day_ts"),
        F.max("inter_time_us").cast("long").alias("max_gap_us"),
        F.sum("inter_time_us").cast("long").alias("span_us"),
    )
    agg = per_conv.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("max_gap_us").cast("long").alias("sum_max_gap_us"),
        F.sum("span_us").cast("long").alias("sum_span_us"),
    )
    return agg.select(
        "day_ts",
        "n_convs",
        "sum_max_gap_us",
        "sum_span_us",
        F.expr(
            "CASE WHEN sum_span_us > 0 THEN round(CAST(sum_max_gap_us"
            " AS DOUBLE) / CAST(sum_span_us AS DOUBLE), 6) END"
        ).alias("dominance"),
    )


def conv_phase_profile(signals: DataFrame) -> DataFrame:
    """Within-conversation pacing: each turn assigned to an
    early/mid/late phase third by its relative position
    (``(turn_idx * 3) div n_turns``, clamped to 2), then latency and
    tool usage aggregated per phase — do conversations start fast
    and stall late, and does tool use migrate?

    The per-conversation length rides a window count on the one
    conv_id exchange; the phase is pure integer arithmetic (no float
    position); the final aggregate is 3 rows. Exact int64 sums;
    integer-quotient mean latency (gaps nonnegative under canonical
    ordering); the tool rate is one shared float.

    Emits ``phase, n_turns, sum_latency_us, mean_latency_us,
    sum_tool_calls, tool_rate``.
    """
    w = Window.partitionBy("conv_id")
    n = F.count(F.lit(1)).over(w).cast("long")
    # integer division keeps the phase exact in both engines; the
    # clamp covers turn_idx == n_turns - 1 landing exactly on 3n/3
    phased = signals.select(
        n.alias("n_turns_conv"),
        F.col("turn_idx").cast("long").alias("ti"),
        "inter_time_us",
        "tool_call",
    ).select(
        F.least(
            F.expr("(ti * 3) div n_turns_conv").cast("int"), F.lit(2)
        ).alias("phase"),
        "inter_time_us",
        "tool_call",
    )
    agg = phased.groupBy("phase").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("inter_time_us").cast("long").alias("sum_latency_us"),
        F.sum("tool_call").cast("long").alias("sum_tool_calls"),
    )
    return agg.select(
        "phase",
        "n_turns",
        "sum_latency_us",
        F.expr("CAST(sum_latency_us div n_turns AS BIGINT)").alias(
            "mean_latency_us"
        ),
        "sum_tool_calls",
        F.expr(
            "round(CAST(sum_tool_calls AS DOUBLE)"
            " / CAST(n_turns AS DOUBLE), 6)"
        ).alias("tool_rate"),
    )


def conversion_by_entry(transcripts: DataFrame) -> DataFrame:
    """Conversion rate by conversation ENTRY role: of the
    conversations that open with role X, how many eventually
    purchase? The acquisition-channel quality read on top of
    :func:`first_role_mix_daily`'s volume mix.

    ONE per-conversation aggregate (min-struct first role + purchase
    flag) on the conv_id exchange, then a |roles|-row rollup. Exact
    counts; the share is one shared float.

    Emits ``first_role, n_convs, n_purchase, purchase_share``.
    """
    per_conv = transcripts.groupBy("conv_id").agg(
        F.min(F.struct("turn_idx", "role"))["role"].alias("first_role"),
        F.max(F.when(F.col("role") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("has_purchase"),
    )
    agg = per_conv.groupBy("first_role").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("has_purchase").cast("long").alias("n_purchase"),
    )
    return agg.select(
        "first_role",
        "n_convs",
        "n_purchase",
        F.expr(
            "round(CAST(n_purchase AS DOUBLE) / CAST(n_convs AS DOUBLE), 6)"
        ).alias("purchase_share"),
    )


def tool_purchase_lift(transcripts: DataFrame) -> DataFrame:
    """Does tool use travel with purchasing? The 2x2 (used a tool,
    purchased) contingency table at CONVERSATION-DAY grain — "on
    days an agent touched a tool, did it also buy?" — with the
    independence lift per cell. Conversation grain would be vacuous
    on long-lived conversations (every one eventually does both);
    the active-day grain is where the association actually varies.

    ONE per-(conv, day) aggregate (two max flags, map-side
    combinable), a 4-row cell count, marginals as window sums over
    those 4 rows. Counts exact int64; the lift is one shared float
    over four exact ints.

    Emits ``used_tool, purchased, n_conv_days, tool_total,
    buy_total, corpus_total, lift``.
    """
    per_conv = transcripts.groupBy(
        "conv_id", F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(
        F.max(
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != ""), 1
            ).otherwise(0)
        ).alias("used_tool_i"),
        F.max(
            F.when(F.col("role") == "purchase", 1).otherwise(0)
        ).alias("purchased_i"),
    )
    cell = per_conv.groupBy(
        (F.col("used_tool_i") == 1).alias("used_tool"),
        (F.col("purchased_i") == 1).alias("purchased"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_conv_days"))
    cell = cell.select(
        "used_tool",
        "purchased",
        "n_conv_days",
        F.sum("n_conv_days")
        .over(Window.partitionBy("used_tool"))
        .cast("long")
        .alias("tool_total"),
        F.sum("n_conv_days")
        .over(Window.partitionBy("purchased"))
        .cast("long")
        .alias("buy_total"),
        # bounded global window: frame is the 2x2 (used_tool, purchased)
        # contingency aggregate, four rows at any corpus size
        F.sum("n_conv_days")
        .over(Window.partitionBy())
        .cast("long")
        .alias("corpus_total"),
    )
    return cell.select(
        "used_tool",
        "purchased",
        "n_conv_days",
        "tool_total",
        "buy_total",
        "corpus_total",
        F.expr(
            "round(CAST(n_conv_days AS DOUBLE)"
            " * CAST(corpus_total AS DOUBLE)"
            " / (CAST(tool_total AS DOUBLE)"
            " * CAST(buy_total AS DOUBLE)), 6)"
        ).alias("lift"),
    )


def weekend_start_conversion(transcripts: DataFrame) -> DataFrame:
    """Weekend vs weekday behavior at CONVERSATION-DAY grain: on
    days a conversation is active, does a weekend day run deeper or
    convert better than a weekday? (Conversation grain would be
    vacuous on month-spanning conversations — every one starts on
    the corpus's first day.) ``weekend`` follows Spark's dayofweek
    (1=Sunday, 7=Saturday).

    ONE map-side combinable per-(conv, day) aggregate, then a 2-row
    rollup. Exact counts; shares are shared floats.

    Emits ``weekend, n_conv_days, sum_turns, n_purchase_days,
    mean_turns, purchase_share``.
    """
    per_day = transcripts.groupBy(
        "conv_id", F.date_trunc("day", F.col("ts")).alias("day_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max(F.when(F.col("role") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("has_purchase"),
    )
    agg = per_day.groupBy(
        F.dayofweek("day_ts").isin(1, 7).alias("weekend")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conv_days"),
        F.sum("n_turns").cast("long").alias("sum_turns"),
        F.sum("has_purchase").cast("long").alias("n_purchase_days"),
    )
    return agg.select(
        "weekend",
        "n_conv_days",
        "sum_turns",
        "n_purchase_days",
        F.expr(
            "round(CAST(sum_turns AS DOUBLE)"
            " / CAST(n_conv_days AS DOUBLE), 6)"
        ).alias("mean_turns"),
        F.expr(
            "round(CAST(n_purchase_days AS DOUBLE)"
            " / CAST(n_conv_days AS DOUBLE), 6)"
        ).alias("purchase_share"),
    )


def first_response_daily(signals: DataFrame) -> DataFrame:
    """Initial-response latency per start day: the FIRST inter-turn
    gap of each conversation (turn 1's inter_time_us — how long the
    second turn took to arrive), profiled per day. The front-door
    latency users actually feel, distinct from the all-gaps daily
    means.

    The turn-1 filter prunes before the aggregation (single-turn
    conversations contribute nothing, correctly); ONE map-side
    combinable per-day rollup. Exact int64 µs; integer-quotient
    mean.

    Emits ``day_ts, n_convs, sum_first_us, min_first_us,
    max_first_us, mean_first_us``.
    """
    first_gaps = signals.where(F.col("turn_idx") == 1).select(
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.col("inter_time_us").cast("long").alias("g"),
    )
    agg = first_gaps.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("g").cast("long").alias("sum_first_us"),
        F.min("g").cast("long").alias("min_first_us"),
        F.max("g").cast("long").alias("max_first_us"),
    )
    return agg.select(
        "day_ts",
        "n_convs",
        "sum_first_us",
        "min_first_us",
        "max_first_us",
        F.expr("CAST(sum_first_us div n_convs AS BIGINT)").alias(
            "mean_first_us"
        ),
    )


def tool_aftermath(signals: DataFrame) -> DataFrame:
    """Does a tool call change what happens NEXT? Per turn class
    (tool vs plain), the distribution of the FOLLOWING inter-turn
    gap — the forward-looking companion of tool_latency's "gap INTO
    the tool turn" view (a tool that returns instantly but stalls
    the conversation afterwards only shows up here).

    One lead window in stable (conv_id, turn_idx) order (last turn
    of each conversation contributes nothing), ONE 2-row contrast
    aggregate, integer-quotient means (non-negative µs), and the
    ratio as the one display float.

    Emits ``tool_call, n_turns, sum_next_us, min_next_us,
    max_next_us, mean_next_us``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = signals.select(
        F.col("tool_call").cast("long").alias("tool_call"),
        F.lead(F.col("inter_time_us").cast("long"))
        .over(w)
        .alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    agg = nxt.groupBy("tool_call").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("next_us").cast("long").alias("sum_next_us"),
        F.min("next_us").cast("long").alias("min_next_us"),
        F.max("next_us").cast("long").alias("max_next_us"),
    )
    return agg.select(
        "tool_call",
        "n_turns",
        "sum_next_us",
        "min_next_us",
        "max_next_us",
        F.expr("CAST(sum_next_us div n_turns AS BIGINT)").alias(
            "mean_next_us"
        ),
    )


def error_abandonment(
    transcripts: DataFrame, within_turns: int = 2
) -> DataFrame:
    """Conversation DEATH after errors: of the conversations that hit
    an error, how many just end within ``within_turns`` turns of the
    FIRST error — grouped by the first-error day so the trend is
    visible. The mortality companion of error_recovery_1d, which
    profiles the conversations that kept going.

    One conv_id aggregate computes first-error index, last index and
    the first-error day together (conditional min/max — no window,
    no join); a |days|-row rollup follows. All int64 + one share
    float.

    Emits ``day_ts, n_error_convs, n_abandoned, abandon_share``.
    """
    per = (
        transcripts.groupBy("conv_id")
        .agg(
            F.min(
                F.when(F.col("role") == "error", F.col("turn_idx"))
            ).alias("first_err_idx"),
            F.min(
                F.when(
                    F.col("role") == "error",
                    F.date_trunc("day", F.col("ts")),
                )
            ).alias("day_ts"),
            F.max("turn_idx").alias("last_idx"),
        )
        .where(F.col("first_err_idx").isNotNull())
    )
    agg = per.groupBy("day_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_error_convs"),
        F.sum(
            F.when(
                F.col("last_idx") - F.col("first_err_idx")
                <= F.lit(int(within_turns)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_abandoned"),
    )
    return agg.select(
        "day_ts",
        "n_error_convs",
        "n_abandoned",
        F.expr(
            "round(CAST(n_abandoned AS DOUBLE)"
            " / CAST(n_error_convs AS DOUBLE), 6)"
        ).alias("abandon_share"),
    )


def tool_position_profile(signals: DataFrame) -> DataFrame:
    """WHERE in a conversation do tool calls happen? Turns bucket
    into relative-position deciles (``(10 * turn_idx) div n_turns``,
    exact integer — turn 0 is decile 0, the last turn decile 9) and
    each decile reports its tool-call rate — front-loaded tool use
    (lookup-then-chat) and back-loaded use (chat-then-act) separate
    immediately, which the corpus-wide tool rate averages away.

    One conv_id aggregate for n_turns (broadcast back riding the
    same exchange), one 10-row rollup. All int64 + one rate float.

    Emits ``decile, n_turns, n_tool, tool_rate``.
    """
    from pyspark.sql import Window

    n = signals.select(
        "conv_id",
        "turn_idx",
        F.col("tool_call").cast("long").alias("tool_call"),
        F.count(F.lit(1))
        .over(Window.partitionBy("conv_id"))
        .cast("long")
        .alias("n_turns_conv"),
    )
    agg = n.groupBy(
        F.expr("CAST((10 * turn_idx) div n_turns_conv AS INT)").alias(
            "decile"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("tool_call").cast("long").alias("n_tool"),
    )
    return agg.select(
        "decile",
        "n_turns",
        "n_tool",
        F.expr(
            "round(CAST(n_tool AS DOUBLE)"
            " / CAST(n_turns AS DOUBLE), 6)"
        ).alias("tool_rate"),
    )
