"""Spark plumbing for the Gorilla / delta-of-delta codecs.

Grouped-map Arrow UDFs (``applyInPandas``): one group = one
``(conv_id, day_bucket)`` chunk of the ordered series -> one encoded blob
row. Groups are the unit of parallelism — at 10^12 turns the encode is
embarrassingly parallel across (conv, day) chunks, and blob size stays
bounded by the day bucket regardless of conversation length (a hot
conversation never concentrates on one task beyond a single day's turns).

The UDF sorts its own group by ``turn_idx`` — grouped-map input order is
not guaranteed — so results are independent of upstream partitioning.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aroma_spark.functions.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)

ENCODED_SCHEMA = (
    "conv_id string, day date, n long, ts_blob binary, val_blob binary"
)
DECODED_SCHEMA = "conv_id string, day date, seq_idx long, ts_us long, value double"


def encode_series(signals: DataFrame, value_col: str = "inter_time_us") -> DataFrame:
    """(conv_id, turn_idx, ts, <value_col>) -> one blob row per (conv, day)."""

    def _enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        ts_us = pdf["__ts_us"].to_numpy("int64")
        vals = pdf["__val"].to_numpy("float64")
        return pd.DataFrame(
            {
                "conv_id": [key[0]],
                "day": [key[1]],
                "n": [len(pdf)],
                "ts_blob": [encode_dod(ts_us)],
                "val_blob": [encode_gorilla(vals)],
            }
        )

    prepped = signals.select(
        "conv_id",
        F.to_date("ts").alias("day"),
        "turn_idx",
        F.unix_micros("ts").alias("__ts_us"),
        F.col(value_col).cast("double").alias("__val"),
    )
    return prepped.groupBy("conv_id", "day").applyInPandas(_enc, ENCODED_SCHEMA)


def decode_series(encoded: DataFrame) -> DataFrame:
    """Blob rows -> exploded (conv_id, day, seq_idx, ts_us, value) rows."""

    def _dec(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for row in pdf.itertuples(index=False):
                ts = decode_dod(row.ts_blob)
                vals = decode_gorilla(row.val_blob)
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "day": row.day,
                            "seq_idx": range(len(ts)),
                            "ts_us": ts,
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return encoded.mapInPandas(_dec, DECODED_SCHEMA)


def codec_roundtrip(signals: DataFrame, value_col: str = "inter_time_us") -> DataFrame:
    """encode ∘ decode = identity — exposed as a driver-checkable query.

    Returns the same rows as the plain signal frame (modulo column set),
    so its DuckDB oracle is ordinary SQL: the codec path must be exact to
    pass the hash compare.
    """
    dec = decode_series(encode_series(signals, value_col))
    return dec.select(
        "conv_id",
        "day",
        F.col("seq_idx").cast("long").alias("seq_idx"),
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        F.col("value").cast("long").alias(value_col),
    )
