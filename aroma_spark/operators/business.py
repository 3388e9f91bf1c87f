"""Business-metric analytics over the raw event stream: exact
monetary rollups from the float ``value`` column and typed extraction
from the semi-structured JSON ``props`` column.

These exercise the two event-table columns the transcript view drops:
``value`` (a 2-decimal monetary amount stored as DOUBLE) and the
``props`` JSON payload. Both are the bread and butter of product
analytics — revenue per event type per day, and "pull field k out of
the JSON blob and aggregate it" — and both have cross-engine traps
this module defuses explicitly.

House bit-determinism discipline, with two new rules:
- Floats NEVER sum as floats. ``value`` quantizes to integer cents
  FIRST via ``floor(value * 100 + 0.5)`` — floor, not CAST, because
  Spark's double->bigint cast truncates while DuckDB's ROUNDS; floor
  is the one primitive both engines define identically. After that
  everything is the usual exact int64.
- JSON extraction goes through the STRING path on both engines
  (Spark ``get_json_object`` / DuckDB ``json_extract_string``) and
  casts to BIGINT explicitly — the typed-JSON fast paths disagree
  about quotes and nulls; the string path doesn't.

Scale shape: both operators are single map-side-combinable
aggregations over the raw scan with column pruning (only ts,
event_type, value/props read); output cardinality is days x types —
tiny anywhere.

No reference analog (the reference has no monetary or JSON columns);
these extend the rollup family to the raw business event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value -> integer cents; floor(x*100 + 0.5) == round-half-up for the
# non-negative amounts this column carries, and floor is bit-identical
# across engines where the raw casts are not
CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def value_rollup_daily(events: DataFrame) -> DataFrame:
    """Exact revenue rollup per (day, event_type) from integer cents.

    Emits ``day_ts, event_type, n_events, sum_cents, min_cents,
    max_cents, mean_cents`` — the mean is the one shared float
    (cents magnitudes sit far inside round(x,6)'s 2^53 headroom).
    """
    base = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.expr(CENTS).alias("cents"),
    )
    agg = base.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    return agg.select(
        F.col("day").alias("day_ts"),
        "event_type",
        "n_events",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr(
            "round(CAST(sum_cents AS DOUBLE) / CAST(n_events AS DOUBLE), 6)"
        ).alias("mean_cents"),
    )


def props_field_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """Typed aggregation of one integer field out of the ``props``
    JSON blob, per event type — the "is that JSON field actually
    populated, and what does it look like?" profiling query that
    precedes promoting a props field to a real column.

    Extraction uses the cross-engine-safe string path (module
    docstring); events whose props lack the field (or aren't valid
    JSON) count in ``n_events`` but not ``n_with_field``.

    Emits ``event_type, n_events, n_with_field, sum_field, min_field,
    max_field, mean_field``.
    """
    k = F.expr(
        f"CAST(get_json_object(props, '$.{field}') AS BIGINT)"
    ).alias("kv")
    base = events.select("event_type", k)
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("kv").cast("long").alias("n_with_field"),
        F.sum("kv").cast("long").alias("sum_field"),
        F.min("kv").cast("long").alias("min_field"),
        F.max("kv").cast("long").alias("max_field"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_with_field",
        "sum_field",
        "min_field",
        "max_field",
        F.expr(
            "CASE WHEN n_with_field > 0 THEN"
            " round(CAST(sum_field AS DOUBLE)"
            " / CAST(n_with_field AS DOUBLE), 6) END"
        ).alias("mean_field"),
    )
