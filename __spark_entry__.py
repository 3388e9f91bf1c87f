"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship rollup pipeline on sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet views (tables: region nation customer
supplier part orders lineitem events documents embeddings).

The transcript-shaped input mandated by BASELINE.json input_hint is
derived deterministically from ``events`` (see
aroma_spark/sources/transcripts.py) so both engines compute from the
same bytes. All oracle-checked aggregates use integer microseconds —
no float accumulation — so Spark and DuckDB match bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aroma_spark.sources.transcripts import TRANSCRIPTS_SQL, transcripts_from_events
from aroma_spark.operators.signals import with_signals
from aroma_spark.operators.tiers import rollup_lattice, rollup_tier_salted
from aroma_spark.operators.gapfill import gapfill_grid
from aroma_spark.operators.codec_ops import codec_roundtrip
from aroma_spark.operators.normalize import dedup_exact
from aroma_spark.operators.vocab import (
    build_vocab,
    encode_tokens,
    filter_by_prefix,
    top_k_tokens,
)

# ---------------------------------------------------------------- helpers

SIG_SQL = f"""
WITH t AS ({TRANSCRIPTS_SQL}),
sig AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0) AS inter_time_us,
         CAST(COALESCE(length(text), 0) AS BIGINT) AS text_len,
         CAST(CASE WHEN tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END AS BIGINT) AS tool_call
  FROM t
)
""".strip()


def _signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_signals(transcripts_from_events(spark, sf_dir))


def _rollup_sql(unit: str) -> str:
    return f"""{SIG_SQL}
SELECT conv_id, date_trunc('{unit}', ts) AS bucket_ts,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(inter_time_us) AS BIGINT) AS sum_latency_us,
       CAST(min(inter_time_us) AS BIGINT) AS min_latency_us,
       CAST(max(inter_time_us) AS BIGINT) AS max_latency_us,
       CAST(sum(text_len) AS BIGINT) AS sum_text_len,
       CAST(sum(tool_call) AS BIGINT) AS sum_tool_calls,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM sig GROUP BY conv_id, date_trunc('{unit}', ts)"""


def _tier_query(tier_name: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        # tiers above 1m are re-aggregated from the tier below (the
        # lattice path); the oracle recomputes directly from raw rows —
        # a match proves the partial-composition is point-exact.
        return rollup_lattice(_signals(spark, sf_dir))[tier_name]

    return q


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: normalize -> signals -> 1m/1h/1d lattice; returns 1h tier."""
    sf_dir = "/root/testdata/sf0.001"
    tiers = rollup_lattice(_signals(spark, sf_dir))
    return tiers["1h"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- core transcript pipeline (SURVEY §2.2/2.5: P-series, W1/W2) ---
    q["signals"] = lambda spark, sf: _signals(spark, sf).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "inter_time_us", "text_len", "tool_call",
    )
    q["rollup_1m"] = _tier_query("1m")
    q["rollup_1h"] = _tier_query("1h")
    q["rollup_1d"] = _tier_query("1d")
    q["rollup_1m_salted"] = lambda spark, sf: rollup_tier_salted(
        _signals(spark, sf), "minute", n_salts=8
    )

    def gapfill_1h(spark: SparkSession, sf: str) -> DataFrame:
        tier = rollup_lattice(_signals(spark, sf))["1h"]
        tier = tier.withColumn(
            "mean_latency_us",
            F.col("sum_latency_us").cast("double") / F.col("n_points"),
        )
        return gapfill_grid(tier, "mean_latency_us", "1 hour", "hour").select(
            "conv_id", "bucket_ts", "value", "locf_value", "lerp_value", "is_filled"
        )

    q["gapfill_1h"] = gapfill_1h

    # codec identity through Gorilla + delta-of-delta blobs (§4.2.2)
    q["codec_roundtrip"] = lambda spark, sf: codec_roundtrip(_signals(spark, sf))

    # --- dedup / ordering (SURVEY §2.6: O1/O2) ---
    q["dedup_exact"] = lambda spark, sf: dedup_exact(
        transcripts_from_events(spark, sf)
    )

    # --- vocab (SURVEY §2.3/2.4/2.6: A1, O4, O6, J1) ---
    q["vocab_role"] = lambda spark, sf: build_vocab(
        transcripts_from_events(spark, sf), "role", order="count"
    )
    q["vocab_role_bytoken"] = lambda spark, sf: build_vocab(
        transcripts_from_events(spark, sf), "role", order="token"
    )
    q["top_roles"] = lambda spark, sf: top_k_tokens(
        build_vocab(transcripts_from_events(spark, sf), "role"), 3
    )

    def encode_roles(spark: SparkSession, sf: str) -> DataFrame:
        t = transcripts_from_events(spark, sf)
        vocab = build_vocab(t, "role", order="count")
        return encode_tokens(t, vocab, "role").select(
            "conv_id", "turn_idx", "role", "role_index"
        )

    q["encode_roles"] = encode_roles

    # --- filters (SURVEY §2.2: P2/P4) ---
    q["prefix_filter"] = lambda spark, sf: filter_by_prefix(
        transcripts_from_events(spark, sf), "conv_id", "1"
    )
    q["membership_filter"] = lambda spark, sf: transcripts_from_events(
        spark, sf
    ).where(F.col("role").isin("click", "error"))

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["signals"] = f"{SIG_SQL}\nSELECT * FROM sig"
    o["rollup_1m"] = _rollup_sql("minute")
    o["rollup_1h"] = _rollup_sql("hour")
    o["rollup_1d"] = _rollup_sql("day")
    o["rollup_1m_salted"] = _rollup_sql("minute")

    o["gapfill_1h"] = f"""{SIG_SQL},
tier AS (
  SELECT conv_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(inter_time_us) AS DOUBLE) / count(*) AS value
  FROM sig GROUP BY 1, 2
),
span AS (SELECT conv_id, min(bucket_ts) mn, max(bucket_ts) mx FROM tier GROUP BY 1),
grid AS (
  SELECT conv_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts
  FROM span
),
dense AS (
  SELECT g.conv_id, g.bucket_ts, s.value
  FROM grid g LEFT JOIN tier s ON g.conv_id = s.conv_id AND g.bucket_ts = s.bucket_ts
),
w AS (
  SELECT conv_id, bucket_ts, value,
    last_value(value IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN value IS NOT NULL THEN CAST(epoch_us(bucket_ts) AS DOUBLE) END IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    first_value(value IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN value IS NOT NULL THEN CAST(epoch_us(bucket_ts) AS DOUBLE) END IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM dense
)
SELECT conv_id, bucket_ts, value,
       prev_v AS locf_value,
       CASE WHEN value IS NOT NULL THEN value
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            WHEN next_t = prev_t THEN prev_v
            ELSE prev_v + (next_v - prev_v) * (CAST(epoch_us(bucket_ts) AS DOUBLE) - prev_t) / (next_t - prev_t)
       END AS lerp_value,
       (value IS NULL) AS is_filled
FROM w"""

    o["codec_roundtrip"] = f"""{SIG_SQL}
SELECT conv_id, CAST(ts AS DATE) AS day,
       CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, CAST(ts AS DATE) ORDER BY turn_idx) - 1 AS BIGINT) AS seq_idx,
       ts, inter_time_us
FROM sig"""

    o["dedup_exact"] = (
        f"WITH t AS ({TRANSCRIPTS_SQL})\nSELECT DISTINCT * FROM t"
    )

    vocab_core = f"""WITH t AS ({TRANSCRIPTS_SQL}),
c AS (SELECT role AS token, CAST(count(*) AS BIGINT) AS count FROM t WHERE role IS NOT NULL GROUP BY role)"""
    o["vocab_role"] = f"""{vocab_core}
SELECT token, count, CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token DESC) - 1 AS BIGINT) AS index FROM c"""
    o["vocab_role_bytoken"] = f"""{vocab_core}
SELECT token, count, CAST(ROW_NUMBER() OVER (ORDER BY token ASC) - 1 AS BIGINT) AS index FROM c"""
    o["top_roles"] = f"""{vocab_core},
v AS (SELECT token, count, CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token DESC) - 1 AS BIGINT) AS index FROM c)
SELECT * FROM v ORDER BY count DESC, token DESC LIMIT 3"""
    o["encode_roles"] = f"""{vocab_core},
v AS (SELECT token, count, CAST(ROW_NUMBER() OVER (ORDER BY count DESC, token DESC) - 1 AS BIGINT) AS index FROM c)
SELECT t.conv_id, t.turn_idx, t.role, CAST(COALESCE(v.index, -1) AS BIGINT) AS role_index
FROM t LEFT JOIN v ON t.role = v.token"""

    o["prefix_filter"] = (
        f"WITH t AS ({TRANSCRIPTS_SQL})\nSELECT * FROM t WHERE conv_id LIKE '1%'"
    )
    o["membership_filter"] = (
        f"WITH t AS ({TRANSCRIPTS_SQL})\nSELECT * FROM t WHERE role IN ('click','error')"
    )
    return o
