"""As-of and interval (range) joins — the temporal joins a time-series
rollup engine needs that Spark lacks as primitives.

The reference has no general joins (SURVEY.md §2.3); its nearest analog
is per-sequence time ordering + lag-diff (reference:
src/aroma/preprocessing/intertimes.py:83-104). LOCF gap-fill is already
an as-of join of a regular grid against the irregular series
(operators/gapfill.py); this module exposes the general form.

Scale design (100 TB):

- ``asof_join`` is NOT a join at all: both sides are unioned with a
  side marker and resolved by ONE window pass over ``(by, ts)`` —
  a single hash exchange + sort, no build side, no range cross
  product. This is the classic union-marker as-of (same dataflow as
  a sort-merge as-of in kdb/pandas ``merge_asof``), and it reuses the
  engine's canonical conv_id partitioning.
- ``interval_join`` is a *banded* range join: intervals explode to the
  fixed-width time bands they cover, events map to their single band,
  and candidates only meet inside an equi-join on ``(by, band)`` —
  never an unbounded theta join. Band width trades explode factor
  against candidate-filter selectivity; each (event, interval) pair
  meets at most once (an event has exactly one band), so no dedup
  pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_R = "__asof_is_r"
_P = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str] = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: each left row gets the right row with the
    greatest ``right_ts`` <= ``left_ts`` (direction='backward'; ties at
    equal ts match), the smallest ``right_ts`` >= ``left_ts``
    ('forward'), or whichever of the two is closer in absolute µs
    ('nearest'; equidistant resolves backward, the pandas
    ``merge_asof`` convention), within the same ``by`` keys.
    Unmatched left rows keep NULL values (left-outer semantics, like
    DuckDB ``ASOF LEFT JOIN``).

    ``right`` must be unique per ``(by, right_ts)`` — true of every
    rollup tier (one row per (conv_id, bucket_ts)); a duplicate would
    make the matched row order-dependent.

    ``tolerance_us``: optional max distance in microseconds; matches
    farther than this resolve to NULL (pandas ``merge_asof`` semantics).

    One shuffle total: union -> window over (by, ts). The payload rides
    as a struct so a NULL *value* inside a matched right row is
    preserved (LOCF on bare columns would skip it).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*by_cols, right_ts)
        ]
    for c in (matched_ts_col, *value_cols):
        if c in left.columns:
            raise ValueError(f"column {c!r} already exists on the left side")

    r = right.select(
        *by_cols,
        F.col(right_ts).alias(_T),
        F.struct(
            F.col(right_ts).alias(matched_ts_col),
            *[F.col(c) for c in value_cols],
        ).alias(_P),
        F.lit(1).alias(_R),
    )
    l = left.withColumn(_T, F.col(left_ts)).withColumn(_R, F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal ts => <= matches
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(_T).asc(), F.col(_R).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(_P, ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(_T).asc(), F.col(_R).asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first(_P, ignorenulls=True).over(w)
    elif direction == "nearest":
        # both candidate sides ride the SAME union and the same
        # (by, ts) sort — two frames over one exchange, then the
        # closer side wins (ties -> backward, pandas merge_asof)
        wb = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(_T).asc(), F.col(_R).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(_T).asc(), F.col(_R).asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        back = F.last(_P, ignorenulls=True).over(wb)
        fwd = F.first(_P, ignorenulls=True).over(wf)
        t_us = F.unix_micros(F.col(_T))
        gap_b = t_us - F.unix_micros(back[matched_ts_col])
        gap_f = F.unix_micros(fwd[matched_ts_col]) - t_us
        matched = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(gap_b <= gap_f, back)
            .otherwise(fwd)
        )
    else:
        raise ValueError(f"unknown direction: {direction!r}")

    out = u.withColumn(_P, matched).where(F.col(_R) == 0)
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col(_P)[matched_ts_col])
        )
        out = out.withColumn(
            _P, F.when(gap <= F.lit(tolerance_us), F.col(_P))
        )
    return out.select(
        *left.columns,
        F.col(_P)[matched_ts_col].alias(matched_ts_col),
        *[F.col(_P)[c].alias(c) for c in value_cols],
    )


_BAND_SECONDS = (("minute", 60), ("hour", 3600), ("day", 86400))


def _pick_band(
    intervals: DataFrame, start_col: str, end_col: str, max_fanout: int = 32
) -> str:
    """Smallest date_trunc unit whose p95 interval span covers at most
    ``max_fanout`` bands; 'day' as the wide fallback. One approximate-
    quantile job over the (small) interval side — never the event side."""
    spans = intervals.select(
        (
            (F.unix_micros(F.col(end_col)) - F.unix_micros(F.col(start_col)))
            / 1e6
        ).alias("__span_s")
    )
    q = spans.approxQuantile("__span_s", [0.95], 0.01)
    if not q:
        return "hour"
    p95 = q[0]
    for unit, sec in _BAND_SECONDS:
        if p95 / sec <= max_fanout:
            return unit
    return "day"


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    by: str | list[str] = "conv_id",
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    band: str = "hour",
    max_bands_per_interval: int = 1024,
) -> DataFrame:
    """Inner join of point events against intervals containing them
    (``start_col <= ts <= end_col``, both ends inclusive), banded so
    candidates only meet inside an equi-join.

    ``band`` is a ``date_trunc`` unit ('minute'/'hour'/'day'): each
    interval explodes to the bands it covers; each event lands in
    exactly one band, so every qualifying (event, interval) pair is
    produced exactly once with no distinct() pass. Pick the band near
    the median interval length — too narrow multiplies the interval
    side, too wide weakens candidate pruning. ``band='auto'`` picks the
    smallest unit whose p95 interval span covers <= 32 bands (one small
    quantile job over the interval side only).

    ``max_bands_per_interval`` guards the explode: a months-long
    interval at ``band='hour'`` would silently fan out thousands of
    rows — any interval over the cap fails the job with a clear error
    instead (raise the cap or widen the band deliberately).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    ivl_cols = [c for c in intervals.columns if c not in by_cols]
    clash = set(ivl_cols) & set(events.columns)
    if clash:
        raise ValueError(f"interval columns collide with events: {sorted(clash)}")

    if band == "auto":
        band = _pick_band(intervals, start_col, end_col)

    seq = F.sequence(
        F.date_trunc(band, F.col(start_col)),
        F.date_trunc(band, F.col(end_col)),
        F.expr(f"interval 1 {band}"),
    )
    guarded = F.expr(
        f"if(size(__bands) <= {int(max_bands_per_interval)}, __bands, "
        f"raise_error(concat('interval_join: interval spans ', "
        f"cast(size(__bands) as string), ' {band} bands, over "
        f"max_bands_per_interval={int(max_bands_per_interval)}; widen the "
        f"band or raise the cap')))"
    )
    ivl = (
        intervals.withColumn("__bands", seq)
        .withColumn("__band", F.explode(guarded))
        .drop("__bands")
    )
    ev = events.withColumn("__band", F.date_trunc(band, F.col(ts_col)))
    return (
        ev.join(ivl, [*by_cols, "__band"])
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__band")
    )


def asof_match_rates(
    left: DataFrame,
    right: DataFrame,
    by: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "closed_ts",
    tolerances_us: tuple = (
        300_000_000,
        900_000_000,
        3_600_000_000,
        7_200_000_000,
    ),
) -> DataFrame:
    """Tolerance-sweep audit for the as-of join: what share of left
    rows would find a match at each candidate tolerance — the tuning
    curve that sizes a production as-of tolerance (or a streaming
    watermark) BEFORE committing to one, instead of re-running the
    join once per guess.

    One backward as-of join with no tolerance computes each row's
    actual staleness gap; every candidate tolerance is then a
    conditional sum over that single result — k tolerances for the
    price of one join. Gaps are exact integer µs.

    Emits ``tolerance_us, n_left, n_matched, match_rate`` (one row
    per candidate, n_left identical across rows by construction).
    """
    j = asof_join(
        left,
        right,
        by=by,
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=[],
    )
    gaps = j.select(
        (
            F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col("matched_ts"))
        ).alias("gap_us")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_left")] + [
        F.sum(
            F.when(F.col("gap_us") <= F.lit(int(t)), 1).otherwise(0)
        )
        .cast("long")
        .alias(f"m_{i}")
        for i, t in enumerate(tolerances_us)
    ]
    wide = gaps.agg(*aggs)
    stack = ", ".join(
        f"CAST({int(t)} AS BIGINT), m_{i}"
        for i, t in enumerate(tolerances_us)
    )
    tall = wide.select(
        "n_left",
        F.expr(
            f"stack({len(tolerances_us)}, {stack})"
            " AS (tolerance_us, n_matched)"
        ),
    )
    return tall.select(
        "tolerance_us",
        "n_left",
        F.col("n_matched").cast("long").alias("n_matched"),
        F.expr(
            "round(CAST(n_matched AS DOUBLE)"
            " / CAST(n_left AS DOUBLE), 6)"
        ).alias("match_rate"),
    )
