"""Ordinal (rank/order-pattern) analytics per conversation: exact
Kendall tau-b concordance between two derived signals, and
permutation entropy (Bandt & Pompe 2002) of order-3 patterns.

Complements the linear-correlation family (stats.signal_corr Pearson,
seqshape Spearman): Kendall counts concordant/discordant PAIRS —
robust to any monotone transform and the natural companion to the
rank-based Spearman — and permutation entropy measures how
unpredictable the local up/down shape of a series is (regular
oscillation → low entropy, noise → ln 6), a standard complexity
measure for irregular telemetry.

House bit-determinism discipline (operators/stats.py): everything
that shuffles is an exact int64 count — concordant / discordant /
tie-pair counts for tau, the six order-pattern counts for entropy —
and the only floats are ONE fixed expression evaluated identically by
both engines (shared verbatim via :func:`tau_b_sql` /
:func:`perm_entropy_sql`, the skew_kurt_sql pattern of
operators/robust.py).

Physical shape at 100 TB:
- Kendall pairs come from a conv_id-keyed self-join: the quadratic is
  confined INSIDE each conversation (pairs = n*(n-1)/2 per conv; with
  conversational data n is bounded in the thousands, so <=~10^7 pair
  rows per hot conv — AQE skew-join splittable since the join key is
  conv_id). No cross-conversation pair ever materializes.
- Permutation patterns are two lead() calls on the canonical conv_id
  exchange every per-conversation operator shares, then ONE count
  aggregation — no joins, no blowup.

No reference analog (the reference computes no rank statistics);
natural extensions of the north_star's derived-signal family over the
fixed signal schema of operators/signals.py (reference
src/aroma/preprocessing/intertimes.py:44-80 for the inter-time
signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# a defined concordance / pattern distribution needs a few points
MIN_TURNS = 4


def tau_b_sql() -> str:
    """The ONE tau-b expression over exact int64 columns n_pairs,
    concordant, discordant, ties_x, ties_y, ties_xy — shared verbatim
    between Spark and the DuckDB twin (identical parse tree ->
    identical IEEE-754 doubles). NULL when either margin is fully
    tied (denominator zero)."""
    nx = "(n_pairs - ties_x - ties_xy)"  # pairs not tied in x
    ny = "(n_pairs - ties_y - ties_xy)"  # pairs not tied in y
    return (
        f"CASE WHEN {nx} > 0 AND {ny} > 0 THEN"
        " round(CAST(concordant - discordant AS DOUBLE)"
        f" / sqrt(CAST({nx} AS DOUBLE) * CAST({ny} AS DOUBLE)), 6) END"
    )


def kendall_tau(
    signals: DataFrame,
    x_col: str = "text_len",
    y_col: str = "inter_time_us",
) -> DataFrame:
    """Exact Kendall tau-b between two integer signals per
    conversation, from explicit pair counts.

    Every turn pair (i < j) inside a conversation is classified by the
    sign pair (sign(x_j - x_i), sign(y_j - y_i)) into concordant,
    discordant, tied-in-x-only, tied-in-y-only, or tied-in-both — five
    exact int64 counts summing to n*(n-1)/2. tau-b applies the
    standard tie correction in ONE shared float expression
    (:func:`tau_b_sql`).

    Emits one row per conversation with >= MIN_TURNS turns:
    ``conv_id, n_turns, n_pairs, concordant, discordant, ties_x,
    ties_y, ties_xy, tau_b``.
    """
    base = signals.select(
        "conv_id",
        "turn_idx",
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    n = base.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    a, b = base.alias("a"), base.alias("b")
    dx = F.signum(F.col("b.x") - F.col("a.x"))
    dy = F.signum(F.col("b.y") - F.col("a.y"))
    pairs = (
        a.join(
            b,
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("a.turn_idx") < F.col("b.turn_idx")),
        )
        .select(
            F.col("a.conv_id").alias("conv_id"),
            dx.alias("dx"),
            dy.alias("dy"),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when((F.col("dx") * F.col("dy")) > 0, 1).otherwise(0))
            .cast("long")
            .alias("concordant"),
            F.sum(F.when((F.col("dx") * F.col("dy")) < 0, 1).otherwise(0))
            .cast("long")
            .alias("discordant"),
            F.sum(
                F.when((F.col("dx") == 0) & (F.col("dy") != 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("ties_x"),
            F.sum(
                F.when((F.col("dy") == 0) & (F.col("dx") != 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("ties_y"),
            F.sum(
                F.when((F.col("dx") == 0) & (F.col("dy") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("ties_xy"),
        )
    )
    return (
        pairs.join(F.broadcast(n.where(F.col("n_turns") >= MIN_TURNS)), "conv_id")
        .select(
            "conv_id",
            "n_turns",
            "n_pairs",
            "concordant",
            "discordant",
            "ties_x",
            "ties_y",
            "ties_xy",
            F.expr(tau_b_sql()).alias("tau_b"),
        )
    )


# stable-argsort order-3 pattern id: with b01 = (x0 <= x1),
# b02 = (x0 <= x2), b12 = (x1 <= x2) (ties broken by position, the
# Bandt-Pompe convention), id = 4*b01 + 2*b02 + b12. Transitivity
# makes ids 2 (010) and 5 (101) impossible; the six occurring ids are
# 0,1,3,4,6,7.
PATTERN_IDS = (0, 1, 3, 4, 6, 7)


def perm_entropy_sql() -> tuple[str, str]:
    """(entropy_sql, norm_entropy_sql) over exact int64 columns
    n_triples, c0, c1, c3, c4, c6, c7 — the shared expression strings
    both engines evaluate. Terms are summed in the fixed written
    order, so the double result is bit-identical across engines."""
    terms = []
    for i in PATTERN_IDS:
        p = f"(CAST(c{i} AS DOUBLE) / CAST(n_triples AS DOUBLE))"
        terms.append(f"CASE WHEN c{i} > 0 THEN -({p}) * ln({p}) ELSE 0.0 END")
    h = "(" + " + ".join(terms) + ")"
    return f"round({h}, 6)", f"round({h} / ln(6.0), 6)"


def perm_entropy(
    signals: DataFrame, value_col: str = "text_len"
) -> DataFrame:
    """Order-3 permutation entropy of an integer signal per
    conversation (Bandt & Pompe, PRL 2002), ties broken by position.

    Each consecutive triple (x_t, x_{t+1}, x_{t+2}) is classified into
    one of six order patterns by three <= comparisons (pure Catalyst —
    two lead() calls on the shared conv_id exchange); the six pattern
    counts are exact int64 and the Shannon entropy over them is ONE
    fixed-order float expression (:func:`perm_entropy_sql`), with
    ``norm_entropy`` = H / ln 6 in [0, 1].

    Emits one row per conversation with >= MIN_TURNS turns:
    ``conv_id, n_triples, c0, c1, c3, c4, c6, c7, entropy,
    norm_entropy``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x0 = F.col("x0")
    x1 = F.lead("x0", 1).over(w)
    x2 = F.lead("x0", 2).over(w)
    n_w = Window.partitionBy("conv_id")
    triples = (
        signals.select(
            "conv_id",
            "turn_idx",
            F.col(value_col).cast("long").alias("x0"),
        )
        .select(
            "conv_id",
            F.count(F.lit(1)).over(n_w).cast("long").alias("n_turns"),
            x0.alias("x0"),
            x1.alias("x1"),
            x2.alias("x2"),
        )
        .where(F.col("x2").isNotNull() & (F.col("n_turns") >= MIN_TURNS))
        .select(
            "conv_id",
            (
                F.when(F.col("x0") <= F.col("x1"), 4).otherwise(0)
                + F.when(F.col("x0") <= F.col("x2"), 2).otherwise(0)
                + F.when(F.col("x1") <= F.col("x2"), 1).otherwise(0)
            ).alias("pid"),
        )
    )
    agg = triples.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        *[
            F.sum(F.when(F.col("pid") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
            for i in PATTERN_IDS
        ],
    )
    h, hn = perm_entropy_sql()
    return agg.select(
        "conv_id",
        "n_triples",
        *[f"c{i}" for i in PATTERN_IDS],
        F.expr(h).alias("entropy"),
        F.expr(hn).alias("norm_entropy"),
    )
