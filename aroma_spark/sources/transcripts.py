"""Transcript sources.

The engine's canonical input is a table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json input_hint). Two loaders:

- :func:`load_transcripts` — read a parquet/Iceberg transcript table.
- :func:`transcripts_from_events` — deterministically derive the
  transcript shape from the driver's ``events`` stream table
  (event_id, ts, user_id, event_type, value, props): ``user_id`` is the
  conversation, turns are ordered by ``(ts, event_id)``. This keeps every
  engine query DuckDB-oracle-checkable on shared parquet.

Analog of the reference's source scans (reference:
src/aroma/datasets/breakfast.py:459-464 PathLister -> FileFilter ->
TxtAnnotationReader), re-expressed as a Catalyst scan + projection so
filter/column pushdown reach parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the canonical transcript table from ``events``.

    Mirrors (exactly — the DuckDB oracles depend on it) the SQL::

        SELECT CAST(user_id AS VARCHAR)              AS conv_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
               event_type                            AS role,
               props                                 AS text,
               CASE WHEN event_type IN ('click','purchase')
                    THEN event_type END              AS tool,
               ts
        FROM events

    The row_number is the stable-ordering rule (reference:
    src/aroma/datasets/multithumos.py:520-521 — sort by (start_time,
    action_index) with a deterministic tie-break; here (ts, event_id)).
    One shuffle on user_id; at 100 TB this is a single hash exchange that
    every downstream per-conversation operator reuses.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(
            F.col("event_type").isin("click", "purchase"), F.col("event_type")
        ).alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    # window partitioned by conv_id (not the raw user_id): Catalyst's
    # push-through-window rule then moves conv_id predicates below the
    # exchange, so downstream filters prune BEFORE the shuffle
    # (verified via .explain: StartsWith lands in the scan's DataFilters).
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return ev.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )


# SQL fragment kept in lockstep with transcripts_from_events(); the
# oracle entries CTE-prefix their queries with it.
TRANSCRIPTS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
       event_type AS role,
       props AS text,
       CASE WHEN event_type IN ('click','purchase') THEN event_type END AS tool,
       ts
FROM events
""".strip()


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized transcript table (parquet warehouse layout)."""
    df = spark.read.parquet(path)
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
