"""Count-min sketch: mergeable frequency sketches per retention tier.

The frequency companion of :func:`~aroma_spark.operators.tiers.
histogram_quantiles`'s quantile sketch: once the raw tier has aged out,
"how often did key K appear in bucket B" must come from a sketch that
(a) is bounded regardless of key cardinality and (b) merges into
coarser tiers by plain integer addition. The count-min sketch (Cormode
& Muthukrishnan, J. Algorithms 2005 — public literature) is exactly
that: a depth x width grid of counters; each key increments one
counter per row (a different salted hash each row); the estimate is the
MIN over the key's cells and can only OVER-estimate (collisions add,
never subtract) — the conservative direction for heavy-hitter alerting.

Determinism discipline: the row hashes are the engine's portable
md5-to-int idiom (same as splits.py / packing.py — first 8 hex digits
of md5('cm{d}:' || key) as a u32, mod width), so the DuckDB twin
computes byte-identical cells; everything is integer, no floats at all.

Physical shape at 100 TB: building the sketch is ONE aggregation on
(bucket, depth, pos) after a depth-way explode — the keyspace is
bounded by buckets x depth x width (e.g. 24h x 4 x 1024 = 98k cells
per day) no matter how many distinct keys the corpus holds, and the
aggregation combines map-side to that bound. Merging tiers is a sum —
the same algebra as the main lattice. Estimation joins the (small)
probe-key set against the sketch on exact cell coordinates.

No reference analog (the reference has no approximate structures); the
scale path for per-key frequencies after retention, complementing the
exact `top_convs_per_bucket` heavy hitters that need the raw tier.

This module also carries the cardinality companion: HyperLogLog
(Flajolet/Fusy/Gandouet/Meunier, AofA 2007 — public literature).
"How many DISTINCT conversations were active in bucket B" needs an
exact count-distinct while the raw tier lives; after retention it must
come from a sketch that is bounded (m registers per bucket, here 256)
and merges into coarser tiers by a plain MAX — :func:`hll_sketch` /
:func:`hll_merge` / :func:`hll_estimate`.

HLL determinism discipline: registers are pure integers (u32 from the
same md5 idiom; index = top 8 bits, rho = leading-zero rank of the low
24 bits), and the harmonic-mean denominator is summed as int64 —
sum(2^(25-rho)) — so the shuffle carries no floats at all. The final
estimate is ONE fixed double expression (a shared literal constant
divided by the exact integer sum, with the standard linear-counting
branch below 2.5*m), so Spark and DuckDB emit identical doubles. The
32-bit hash caps the per-bucket range at ~10^8 distincts (documented
trade; a 64-bit variant swaps the substring width, nothing else).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 256

# HLL geometry: p = 8 index bits -> m = 256 registers; the remaining
# 24 hash bits feed rho in [1, 25] (25 = all-zero tail). Shared by the
# DuckDB twin via these module constants (repr-exact literals).
HLL_M = 256
HLL_W_BITS = 24
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^25: the one float constant of the estimator — the
# int64 register sum divides it in a single double operation
HLL_CONST = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W_BITS + 1))
# linear-counting threshold (2.5 * m, the standard small-range bound)
HLL_LC_THRESHOLD = 2.5 * HLL_M


def _cell_pos(key: F.Column, d: int, width: int) -> F.Column:
    """Row-``d`` cell position: u32 from md5('cm{d}:' || key) mod width —
    the portable cross-engine hash idiom (splits.py:24)."""
    h = F.md5(F.concat(F.lit(f"cm{d}:"), key.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    ).cast("int")


def cm_sketch(
    df: DataFrame,
    unit: str = "hour",
    key_col: str = "conv_id",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the per-bucket count-min grid: one row per non-empty cell
    (bucket_ts, depth, pos, cnt). One explode (x depth) + one map-side-
    combined aggregation bounded by buckets x depth x width cells."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    key = F.col(key_col)
    cells = df.select(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("depth"),
                        _cell_pos(key, d, width).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return cells.groupBy(
        "bucket_ts", F.col("cell.depth").alias("depth"), F.col("cell.pos").alias("pos")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cm_merge(sketch: DataFrame, unit: str) -> DataFrame:
    """Merge a finer-tier sketch into coarser buckets — integer sums,
    the identical algebra as the main lattice's reaggregate."""
    return sketch.groupBy(
        F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"),
        "depth",
        "pos",
    ).agg(F.sum("cnt").cast("long").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "conv_id",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Estimate each (bucket_ts, key)'s frequency: MIN over the key's
    ``depth`` cells; a missing cell means zero occurrences. ``keys``
    must carry (bucket_ts, key_col) — typically the distinct active
    keys of the probe window, small next to the corpus."""
    key = F.col(key_col)
    probes = keys.select(
        "bucket_ts",
        key.alias("__key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("depth"),
                        _cell_pos(key, d, width).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(
        "bucket_ts",
        "__key",
        F.col("cell.depth").alias("depth"),
        F.col("cell.pos").alias("pos"),
    )
    joined = probes.join(sketch, ["bucket_ts", "depth", "pos"], "left")
    return (
        joined.groupBy("bucket_ts", "__key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_est")
        )
        .withColumnRenamed("__key", key_col)
        .select("bucket_ts", key_col, "cm_est")
    )


def hll_sketch(
    df: DataFrame, unit: str = "hour", key_col: str = "conv_id"
) -> DataFrame:
    """Build the per-bucket HLL register table: one row per non-empty
    register (bucket_ts, idx, r) with r = max rho seen. ONE map-side-
    combined aggregation bounded by buckets x 256 rows regardless of key
    cardinality."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.pmod(h, F.lit(1 << HLL_W_BITS))
    # rho = leading-zero rank of the 24-bit tail + 1; bin() emits no
    # leading zeros, so bit_length(w) = length(bin(w)) for w > 0
    rho = (
        F.when(w == 0, F.lit(HLL_W_BITS + 1))
        .otherwise(F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    rows = df.select(
        F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
        (h / F.lit(1 << HLL_W_BITS)).cast("long").alias("idx"),
        rho.alias("rho"),
    )
    return rows.groupBy("bucket_ts", "idx").agg(
        F.max("rho").cast("int").alias("r")
    )


def hll_merge(sketch: DataFrame, unit: str) -> DataFrame:
    """Merge a finer-tier register table into coarser buckets — register
    MAX, the HLL union (lossless: union-then-estimate == estimate of the
    union, the property that makes the sketch a retention tier)."""
    return sketch.groupBy(
        F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"), "idx"
    ).agg(F.max("r").cast("int").alias("r"))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """Distinct-count estimate per bucket from the register table.

    The harmonic-mean denominator is EXACT int64: each present register
    contributes 2^(25 - r), each of the (256 - present) absent ones
    2^25 — a sum of powers of two whose exponent span (33 bits) fits a
    double losslessly, so no float ever enters a shuffle. The estimate
    is HLL_CONST / sum as one double division, with the standard
    linear-counting branch (256 * ln(256/zeros)) when the raw estimate
    falls under 2.5*m and empty registers remain; round(6) absorbs the
    across-engine last-ulp of ln.
    """
    agg = sketch.groupBy("bucket_ts").agg(
        F.count(F.lit(1)).cast("long").alias("present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - r)")
        )
        .cast("long")
        .alias("s_present"),
    )
    zeros = (F.lit(HLL_M).cast("long") - F.col("present")).alias("zeros")
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("present")) * F.lit(1 << (HLL_W_BITS + 1))
    ).cast("double")
    raw = F.lit(HLL_CONST) / s_total
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M))
        / (F.lit(HLL_M) - F.col("present")).cast("double")
    )
    est = F.when(
        (raw <= F.lit(HLL_LC_THRESHOLD)) & (F.col("present") < HLL_M), lc
    ).otherwise(raw)
    return agg.select(
        "bucket_ts",
        F.col("present").alias("n_registers"),
        F.round(est, 6).alias("hll_est"),
    )


def hll_overlap(
    df: DataFrame,
    unit: str = "day",
    key_col: str = "conv_id",
    lag_days: int = 7,
) -> DataFrame:
    """Sketch-space audience overlap: the day-vs-``lag_days``-ago
    distinct-key intersection estimated by HLL inclusion-exclusion —
    ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` — where the union comes
    free from the register MAX merge (the same lossless property the
    retention tiers rely on). This is THE pattern for set overlap at
    100 TB once the raw tier has aged out: the exact self-join
    (cohorts.audience_overlap_weekly) needs raw keys; this needs 256
    registers per bucket, forever. The exact intersection rides
    along from the raw tier (while it lives) as ``n_both_true``, so
    every row carries its own error audit — same discipline as
    hll_distinct's n_true column.

    Estimates are the module's fixed double expressions over exact
    int64 register sums, so both engines emit identical doubles; the
    inclusion-exclusion is one more shared-float subtraction of
    already-rounded terms. Negative estimates are possible at tiny
    cardinalities (standard for inclusion-exclusion on sketches) and
    are emitted as-is — the audit column is the point.

    Emits ``bucket_ts, est_today, est_lag, est_union, overlap_est,
    n_both_true`` for buckets where both sides exist.
    """
    # materialize the (tiny: buckets x 256) register table ONCE —
    # without this, the three estimate branches and the union re-run
    # the full corpus aggregation through lineage, turning a
    # sketch-space query into three raw scans at 100 TB (clusters.py
    # precedent for lineage truncation inside an operator)
    sk = hll_sketch(df, unit, key_col).localCheckpoint()
    shifted = sk.select(
        (F.col("bucket_ts") + F.expr(f"INTERVAL {int(lag_days)} DAYS"))
        .alias("bucket_ts"),
        "idx",
        "r",
    )
    union = (
        sk.unionByName(shifted)
        .groupBy("bucket_ts", "idx")
        .agg(F.max("r").cast("int").alias("r"))
    )
    est_a = hll_estimate(sk).select(
        "bucket_ts", F.col("hll_est").alias("est_today")
    )
    est_b = hll_estimate(shifted).select(
        "bucket_ts", F.col("hll_est").alias("est_lag")
    )
    est_u = hll_estimate(union).select(
        "bucket_ts", F.col("hll_est").alias("est_union")
    )
    day = F.date_trunc(unit, F.col("ts"))
    act = df.select(F.col(key_col).alias("k"), day.alias("bucket_ts"))
    act = act.distinct()
    true_both = (
        act.join(
            act.select(
                "k",
                (
                    F.col("bucket_ts")
                    + F.expr(f"INTERVAL {int(lag_days)} DAYS")
                ).alias("bucket_ts"),
            ),
            ["k", "bucket_ts"],
        )
        .groupBy("bucket_ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both_true"))
    )
    joined = (
        est_a.join(F.broadcast(est_b), "bucket_ts")
        .join(F.broadcast(est_u), "bucket_ts")
        .join(F.broadcast(true_both), "bucket_ts", "left")
    )
    return joined.select(
        "bucket_ts",
        "est_today",
        "est_lag",
        "est_union",
        F.round(
            F.col("est_today") + F.col("est_lag") - F.col("est_union"), 6
        ).alias("overlap_est"),
        F.coalesce(F.col("n_both_true"), F.lit(0))
        .cast("long")
        .alias("n_both_true"),
    )
