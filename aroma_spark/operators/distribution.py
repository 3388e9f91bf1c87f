"""Corpus-level distribution shape: Lorenz/Pareto turn-share deciles,
the Gini concentration coefficient, and the Benford first-digit
profile.

The "how is load distributed ACROSS conversations" family — the
capacity-planning complement to the per-conversation sequence shapes
(operators/seqshape.py): is 90% of the corpus ten conversations
(hot-key skew the salted rollups must absorb), and do the derived
signals look organic (Benford) or synthetic/truncated?

House bit-determinism discipline (see operators/stats.py): every
shuffled or summed quantity is an exact int64; floats appear only in
ONE fixed final expression shape shared with the DuckDB twin.

Scale design — the key move: deciles and Gini are RANK statistics
over per-conversation turn counts, but ranking 10^9 conversations
with a global row_number would funnel them through one partition.
Instead both operators aggregate the counts into their DISTINCT-VALUE
histogram (count c -> k_c conversations) first: within a tie block
every conversation has the same c, so any rank-range sum over the
block is c * (arithmetic series over ranks) — independent of which
conversation got which rank. The histogram is tiny (distinct turn
counts, bounded by the longest conversation, ~10^3-10^4 values at any
corpus size), so the one ordered window that assigns block rank
offsets runs over thousands of rows, not billions. Exactness bound:
the Gini moment S2 = sum(rank*count) <= c_max * n^2 / 2 stays inside
int64 to ~10^8 conversations at c_max ~ 10^3; beyond that switch the
two moments to decimal(38,0).

No reference analog (the reference computes no corpus statistics);
extends the north_star's skew-handling story (hot-conversation
detection is what decides when the salted rollup path is worth it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# one global ordered window over the DISTINCT-count histogram (tiny by
# construction — see module docstring) assigns each tie block its
# first rank; Window.orderBy without partitionBy is intentional here.
_N_DECILES = 10


def _count_blocks(transcripts: DataFrame, ascending: bool) -> DataFrame:
    """(c, k, s, n_convs, total_turns): per distinct turn-count value c,
    the number of conversations k with that count, the first rank s of
    the tie block in the requested order, and the corpus totals."""
    counts = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hist = counts.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    order = F.col("c").asc() if ascending else F.col("c").desc()
    w = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # bounded global windows: frame is the distinct-value count
    # histogram (the scale-safe decile decomposition), never the corpus
    w_all = Window.partitionBy()
    return hist.select(
        "c",
        "k",
        (F.coalesce(F.sum("k").over(w), F.lit(0)) + 1).alias("s"),
        F.sum("k").over(w_all).cast("long").alias("n_convs"),
        F.sum(F.col("c") * F.col("k")).over(w_all).cast("long")
        .alias("total_turns"),
    )


def turn_share_deciles(transcripts: DataFrame) -> DataFrame:
    """Lorenz/Pareto table: conversations ranked by turn count
    DESCENDING and cut into 10 rank deciles (decile 0 = the busiest
    tenth); per decile the conversation count, turn total, and share
    of all turns. "Does the top decile carry half the corpus" is the
    question that decides whether the salted rollup path pays for
    itself.

    Decile of rank r (1-based) is ``(r-1)*10 div n`` — pure integer
    arithmetic, no NTILE (engines disagree on nothing here, and the
    remainder spreading of NTILE differs from this fixed rule). A tie
    block occupying ranks [s, s+k-1] is intersected with each decile's
    rank interval analytically (see module docstring), so no
    per-conversation ranking ever happens: decile d covers ranks
    [ (d*n + 9) div 10 + 1, ((d+1)*n - 1) div 10 + 1 ].

    Returns (decile, n_convs, sum_turns, turn_share) — at most 10
    rows; ``turn_share`` is the ONE float division, identical in the
    DuckDB twin.

    Shape: conv_id exchange for the counts, a tiny histogram
    aggregation, an explode over <= 10 deciles per block, and a
    10-key final aggregation.
    """
    blocks = _count_blocks(transcripts, ascending=False)
    # integer DIV throughout (never float `/` + cast: products reach
    # 10*n_convs, past double's 2^53 exact-integer range at corpus
    # scale) — all operands non-negative, so DIV == floor division
    spanned = blocks.select(
        "c",
        "k",
        "s",
        F.expr("s + k - 1").alias("e"),  # last rank of the tie block
        "n_convs",
        "total_turns",
        F.explode(
            F.sequence(
                F.expr(f"CAST((s - 1) * {_N_DECILES} DIV n_convs AS INT)"),
                F.expr(
                    f"CAST((s + k - 2) * {_N_DECILES} DIV n_convs AS INT)"
                ),
            )
        ).alias("decile"),
    )
    # rank interval of decile d: r in [r_lo, r_hi] (1-based, inclusive)
    r_lo = F.expr(
        f"(CAST(decile AS BIGINT) * n_convs + {_N_DECILES - 1})"
        f" DIV {_N_DECILES} + 1"
    )
    r_hi = F.expr(
        f"((CAST(decile AS BIGINT) + 1) * n_convs - 1)"
        f" DIV {_N_DECILES} + 1"
    )
    overlap = (
        F.least(F.col("e"), r_hi) - F.greatest(F.col("s"), r_lo) + 1
    )
    per_block = spanned.select(
        "decile",
        overlap.cast("long").alias("n_in_decile"),
        (overlap * F.col("c")).cast("long").alias("turns_in_decile"),
        "total_turns",
    ).where(F.col("n_in_decile") > 0)
    return (
        per_block.groupBy("decile")
        .agg(
            F.sum("n_in_decile").cast("long").alias("n_convs"),
            F.sum("turns_in_decile").cast("long").alias("sum_turns"),
            F.max("total_turns").alias("total_turns"),
        )
        .select(
            "decile",
            "n_convs",
            "sum_turns",
            (
                F.col("sum_turns").cast("double")
                / F.col("total_turns").cast("double")
            ).alias("turn_share"),
        )
    )


def gini_turns(transcripts: DataFrame) -> DataFrame:
    """Gini coefficient of turns-per-conversation — the single-number
    concentration summary behind :func:`turn_share_deciles` (0 =
    every conversation equally long, -> 1 = one conversation is the
    corpus).

    Uses the rank form G = (2*S2 - (n+1)*S1) / (n*S1) with counts
    ranked ASCENDING, where S1 = sum(c) and S2 = sum(rank*c). Within
    a tie block at ranks [s, s+k-1], S2's contribution is
    c * (k*s + k*(k-1)/2) — exact int64, order-free (see module
    docstring for the block decomposition and the overflow bound).

    Returns ONE row (n_convs, total_turns, gini); the Gini expression
    is the single float combination, identical in the DuckDB twin.
    """
    blocks = _count_blocks(transcripts, ascending=True)
    # k*(k-1) is always even, so integer DIV 2 is exact (float `/`
    # would round past 2^53 at corpus-scale tie blocks)
    contrib = F.expr("c * (k * s + (k * (k - 1)) DIV 2)")
    agg = blocks.select(
        "n_convs",
        "total_turns",
        contrib.cast("long").alias("s2_part"),
    ).groupBy("n_convs", "total_turns").agg(
        F.sum("s2_part").cast("long").alias("s2")
    )
    gini = (
        (
            F.lit(2) * F.col("s2")
            - (F.col("n_convs") + 1) * F.col("total_turns")
        ).cast("double")
        / (F.col("n_convs") * F.col("total_turns")).cast("double")
    )
    return agg.select(
        "n_convs", "total_turns", gini.alias("gini")
    )


def benford_first_digit(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """First-significant-digit profile of a positive integer signal —
    the Benford's-law screen ("organic magnitudes lean on digit 1 at
    ~30%; truncation, caps, or synthetic filler flatten the curve").

    The digit comes from the decimal string head, not float log10
    (bit-identical across engines by construction; rows with value
    <= 0 carry no leading significant digit and are excluded).

    Returns (digit, n_values, share) — at most 9 rows; ``share`` is
    the ONE float division over exact counts.

    Shape: one 9-key aggregation with map-side combine (skew
    impossible), then a window over the 9-row result for the total.
    """
    v = F.col(value_col).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    agg = (
        signals.where(v > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_values"))
    )
    # bounded global window: frame is the 9-row leading-digit histogram
    total = F.sum("n_values").over(Window.partitionBy())
    return agg.select(
        "digit",
        "n_values",
        (F.col("n_values").cast("double") / total.cast("double")).alias(
            "share"
        ),
    )


def gmd_sql() -> str:
    """The ONE float expression for the Gini mean difference over
    exact int64 columns gmd_num (= sum over i<j of |x_i - x_j|) and
    n_points: GMD = gmd_num / (n*(n-1)/2) — cross-multiplied so the
    only division is the final one. Requires n_points >= 2 (the
    operator filters)."""
    return (
        "round(2.0 * CAST(gmd_num AS DOUBLE)"
        " / (CAST(n_points AS DOUBLE) * (CAST(n_points AS DOUBLE) - 1.0)),"
        " 6)"
    )


def gmd_by_bucket(
    signals: DataFrame, value_col: str = "text_len", unit: str = "day"
) -> DataFrame:
    """Gini mean difference of ``value_col`` per time bucket — the
    mean absolute difference between every pair of observations, the
    robust dispersion measure that (unlike variance) doesn't square
    outliers and (unlike MAD) uses every pair.

    The O(n^2) pair sum collapses to one sorted pass via the identity
        sum_{i<j} |x_i - x_j|  =  sum_i (2i - n - 1) * x_(i)
    over the ascending order statistics x_(1..n): exact int64
    (``gmd_num``), one rank window per bucket, no self-join. The
    final normalization is one shared float (:func:`gmd_sql`).

    int64 headroom: |gmd_num| <= n^2 * max|x| (safe for day buckets
    to ~3e6 rows at text_len ~1e6; beyond that pre-aggregate to the
    distinct-value histogram as gini_turns does).

    Emits ``bucket_ts, n_points, gmd_num, gmd`` for buckets with
    >= 2 points.
    """
    base = signals.select(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
        F.col(value_col).cast("long").alias("v"),
    )
    w_rk = Window.partitionBy("bucket_ts").orderBy("v")
    w_tot = Window.partitionBy("bucket_ts")
    ranked = base.select(
        "bucket_ts",
        (
            (F.lit(2) * F.row_number().over(w_rk) - F.count("*").over(w_tot) - F.lit(1))
            * F.col("v")
        ).alias("w_term"),
    )
    out = (
        ranked.groupBy("bucket_ts")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.sum("w_term").cast("long").alias("gmd_num"),
        )
        .filter(F.col("n_points") >= 2)
    )
    return out.select(
        "bucket_ts", "n_points", "gmd_num", F.expr(gmd_sql()).alias("gmd")
    )


QUARTILE_QS = ((25, "p25"), (50, "p50"), (75, "p75"), (95, "p95"))


def doc_len_quartiles_by_lang(documents: DataFrame) -> DataFrame:
    """Exact length quartiles (+p95) of the document corpus per
    language — the profile a curation pipeline checks before setting
    per-language length cutoffs. Type-1 (inverse-CDF) quantiles at
    rank ``max(1, ceil(q/100 * n))`` under the deterministic
    (n_chars, doc_id) total order, so every engine picks the SAME
    document at every quantile — no interpolation, no float.

    Scale shape: ONE hash exchange on lang for the rank window, then
    a |langs|-row conditional aggregate. Exact percentiles genuinely
    need the per-lang sort — that is the cost of "exact"; the sketch
    alternative (t-digest / histogram) lives in
    ``hist_quantiles_1d``. Per-lang skew is bounded because langs
    are few and the window sort spills gracefully; at 100 TB you
    would pre-filter to the lang slice being tuned.

    Emits ``lang, n_docs, p25_chars, p50_chars, p75_chars,
    p95_chars``.
    """
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = documents.select(
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang"))
        .cast("long")
        .alias("n_docs"),
    )
    aggs = [F.max("n_docs").cast("long").alias("n_docs")]
    for q, name in QUARTILE_QS:
        target = F.greatest(
            F.lit(1), F.ceil(F.col("n_docs") * F.lit(q) / F.lit(100))
        )
        aggs.append(
            F.min(F.when(F.col("rk") == target, F.col("n_chars")))
            .cast("long")
            .alias(f"{name}_chars")
        )
    return ranked.groupBy("lang").agg(*aggs)


def median_text_len_by_role(signals: DataFrame) -> DataFrame:
    """Exact median text length per role (type-1 rank under the
    deterministic (text_len, conv_id, turn_idx) order) with the role
    counts — are tool-call turns structurally shorter than views?

    One hash exchange on role for the rank window, |roles| output
    rows. All int64.

    Emits ``role, n_turns, median_text_len``.
    """
    w = Window.partitionBy("role").orderBy(
        "text_len", "conv_id", "turn_idx"
    )
    ranked = signals.select(
        "role",
        F.col("text_len").cast("long").alias("text_len"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("role"))
        .cast("long")
        .alias("n_turns"),
    )
    return ranked.where(
        F.col("rk") == F.expr("(n_turns + 1) div 2")
    ).select(
        "role",
        "n_turns",
        F.col("text_len").alias("median_text_len"),
    )


def median_latency_by_role(signals: DataFrame) -> DataFrame:
    """Exact median inter-turn latency per role (type-1 rank under
    the deterministic (inter_time_us, conv_id, turn_idx) order) —
    which event type is the slow one, robust to the heavy tail that
    wrecks the mean.

    One hash exchange on role for the rank window, |roles| output
    rows. All int64.

    Emits ``role, n_turns, median_latency_us``.
    """
    w = Window.partitionBy("role").orderBy(
        "inter_time_us", "conv_id", "turn_idx"
    )
    ranked = signals.select(
        "role",
        F.col("inter_time_us").cast("long").alias("inter_time_us"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("role"))
        .cast("long")
        .alias("n_turns"),
    )
    return ranked.where(
        F.col("rk") == F.expr("(n_turns + 1) div 2")
    ).select(
        "role",
        "n_turns",
        F.col("inter_time_us").alias("median_latency_us"),
    )
