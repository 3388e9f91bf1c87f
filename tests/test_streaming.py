"""Structured Streaming rollup converges to the batch tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aroma_spark.operators.normalize import dedup_exact
from aroma_spark.operators.signals import with_signals
from aroma_spark.operators.tiers import rollup_tier
from aroma_spark.streaming.stream import streaming_rollup_1m, streaming_signals

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


@pytest.fixture()
def stream_dir(spark, tiny_transcripts, tmp_path):
    p = str(tmp_path / "in")
    dedup_exact(tiny_transcripts).write.parquet(p)
    return p


def _run_stream(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "sig" else "complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_rollup_matches_batch(spark, tiny_transcripts, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    _run_stream(streaming_rollup_1m(stream), tmp_path, "r1m")
    got = spark.sql("select * from r1m")
    want = rollup_tier(with_signals(dedup_exact(tiny_transcripts)), "minute").select(
        "conv_id", "bucket_ts", "n_points", "sum_text_len", "sum_tool_calls",
        "first_ts", "last_ts",
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_streaming_signals_stateful(spark, tiny_transcripts, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    _run_stream(streaming_signals(stream), tmp_path, "sig")
    got = spark.sql("select * from sig")
    want = with_signals(dedup_exact(tiny_transcripts)).select(
        "conv_id", "turn_idx", "ts", "inter_time_us", "text_len", "tool_call"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
