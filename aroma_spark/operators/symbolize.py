"""Time-series symbolization: PAA segments and SAX words per conversation.

PAA (Piecewise Aggregate Approximation) and SAX (Symbolic Aggregate
approXimation, Lin/Keogh/Lonardi/Chiu, DMKD 2003 — public literature)
compress each conversation's signal into ``w`` segment means and then a
``w``-letter word over a small alphabet, the classic building block for
whole-series similarity search, motif discovery and indexable series
sketches. At 100 TB the SAX word is the point: a 10^12-turn corpus
reduces to one short string per conversation that joins/groups like any
other key (e.g. group-by sax_word to find conversations with the same
shape), so downstream similarity never touches raw turns.

Determinism discipline (same as operators/stats.py): segment assignment
and all sums are exact integer arithmetic; the z-normalization is ONE
fixed double expression evaluated from int64 sufficient statistics,

    z_j = (n*s_j - S*c_j) / (c_j * sqrt(n*SSQ - S*S))

(the numerator is the exact-int form of n*(m_j - mu) with m_j = s_j/c_j
multiplied through by c_j; the radicand is the exact-int population
variance scaled by n^2), so both engines compare the same doubles
against the same Gaussian breakpoints and emit the same letters.
Breakpoints are the N(0,1) quartiles for a 4-letter alphabet —
equiprobable bins per the SAX paper.

Segmentation: row i (0-based in stable turn order) of an n-row
conversation maps to segment floor(i*w/n) — every segment non-empty
when n >= w (the per-row variant of PAA; the fractional-overlap variant
in the original paper needs n divisible by w, this one does not).
Conversations with n < w are dropped (a word shorter than w letters is
not comparable).

Physical shape: one window pass for the row index plus two aggregations
(segment, conversation) — all on the canonical conv_id exchange, sums
combine map-side. No Python, no explode, no join.

Overflow bounds (int64): n*s_j and S*c_j need n^2 * max|v| < 2^63 —
text_len <= 2^20 gives headroom to n ~ 6*10^10 turns per conversation;
n*SSQ needs n^2 * max|v|^2 < 2^63, n ~ 3*10^6 at text_len 10^4.
Pre-scale wider signals (see signal_corr's seconds scaling) before
symbolizing them.

No reference analog (the reference has no similarity layer); companion
of the padded-export parity family (reference
src/aroma/preprocessing/intertimes.py:63-80) in the engine's
derived-representation group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# N(0,1) quartile breakpoints -> 4 equiprobable letters a..d
GAUSS_Q = 0.6744897501960817


def paa_segments(
    signals: DataFrame, value_col: str = "text_len", w: int = 8
) -> DataFrame:
    """Per (conv_id, segment): integer count/sum partials and the segment
    mean (one rounded float). Conversations with fewer than ``w`` turns
    are dropped."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    v = F.col(value_col).cast("long")
    order = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv = Window.partitionBy("conv_id")
    idx = (F.row_number().over(order) - 1).cast("long")
    n = F.count(F.lit(1)).over(conv).cast("long")
    rows = signals.select(
        "conv_id",
        v.alias("v"),
        n.alias("n"),
        # exact integer segment id numerator: floor(i*w/n) comes next;
        # i*w stays far under 2^63 (w is small)
        (idx * F.lit(w)).alias("iw"),
    ).where(F.col("n") >= w)
    rows = rows.select(
        "conv_id",
        "v",
        "n",
        F.expr("iw DIV n").cast("int").alias("seg"),
    )
    return (
        rows.groupBy("conv_id", "seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("v").cast("long").alias("s"),
        )
        .select(
            "conv_id",
            "seg",
            "c",
            "s",
            F.round(F.col("s").cast("double") / F.col("c").cast("double"), 6)
            .alias("paa_mean"),
        )
    )


def sax_words(
    signals: DataFrame, value_col: str = "text_len", w: int = 8
) -> DataFrame:
    """Per conversation: the ``w``-letter SAX word (alphabet a..d over
    the N(0,1) quartile breakpoints) plus the integer sufficient
    statistics it was derived from.

    Constant conversations (zero variance, radicand D = 0 — an exact
    int64 test) symbolize as all-'c': z is treated as 0, which falls in
    the third equiprobable bin [0, +q).
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    v = F.col(value_col).cast("long")
    order = Window.partitionBy("conv_id").orderBy("turn_idx")
    conv = Window.partitionBy("conv_id")
    idx = (F.row_number().over(order) - 1).cast("long")
    rows = (
        signals.select(
            "conv_id",
            v.alias("v"),
            F.count(F.lit(1)).over(conv).cast("long").alias("n"),
            F.sum(v).over(conv).cast("long").alias("s_all"),
            F.sum(v * v).over(conv).cast("long").alias("ssq_all"),
            (idx * F.lit(w)).alias("iw"),
        )
        .where(F.col("n") >= w)
        .select(
            "conv_id",
            "v",
            "n",
            "s_all",
            "ssq_all",
            F.expr("iw DIV n").cast("int").alias("seg"),
        )
    )
    segs = rows.groupBy(
        "conv_id", "seg", "n", "s_all", "ssq_all"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("v").cast("long").alias("s"),
    )
    d = F.col("n") * F.col("ssq_all") - F.col("s_all") * F.col("s_all")
    num = (F.col("n") * F.col("s") - F.col("s_all") * F.col("c")).cast(
        "double"
    )
    den = F.col("c").cast("double") * F.sqrt(d.cast("double"))
    z = F.when(d > 0, num / den).otherwise(F.lit(0.0))
    letter = (
        F.when(z < F.lit(-GAUSS_Q), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(GAUSS_Q), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    lettered = segs.select(
        "conv_id", "seg", "n", letter.alias("letter")
    )
    return (
        lettered.groupBy("conv_id", "n")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("seg", "letter")))
                .getField("letter")
            ).alias("sax_word")
        )
        .select("conv_id", F.col("n").alias("n_turns"), "sax_word")
    )
