"""Dedup + normalization semantics (reference O2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.normalize import (
    dedup_exact,
    normalize,
    normalize_for_rollup,
    sequence_content_hash,
)


def test_full_record_dedup(spark, tiny_transcripts):
    """The injected duplicate row (b,0) collapses; everything else stays
    (reference: src/aroma/datasets/breakfast.py:597-618)."""
    assert tiny_transcripts.count() == 8
    out = dedup_exact(tiny_transcripts)
    assert out.count() == 7
    assert out.where((F.col("conv_id") == "b") & (F.col("turn_idx") == 0)).count() == 1


def test_keyed_dedup_deterministic_survivor(spark):
    rows = [
        ("k", 0, "user", "first", None, "2024-01-01 00:00:00"),
        ("k", 0, "user", "second", None, "2024-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dedup_exact(df, keys=["conv_id", "turn_idx"]).collect()
    assert len(out) == 1 and out[0].text == "first"


def test_normalize_casts_and_dedups(spark):
    rows = [("c1", "0", "user", "t", None, "2024-01-01 00:00:00")] * 2
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx string, role string, text string, tool string, ts string"
    )
    out = normalize(df)
    assert out.count() == 1
    assert dict(out.dtypes)["turn_idx"] == "int"
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_normalize_for_rollup_matches_exact_path(spark):
    """The hash-pruned dedup (pipeline fast path) keeps exactly the rows
    the exact full-record DISTINCT keeps — including the NULL-vs-empty
    text distinction — while never shuffling the payload."""
    rows = [
        ("c1", 0, "user", "hello", None, "2024-01-01 00:00:00"),
        ("c1", 0, "user", "hello", None, "2024-01-01 00:00:00"),  # dup
        ("c1", 1, "user", None, None, "2024-01-01 00:00:01"),
        ("c1", 1, "user", "", None, "2024-01-01 00:00:01"),  # NULL != ""
        ("c1", 2, "tool", "x", "fn_a", "2024-01-01 00:00:02"),
        ("c1", 2, "tool", "y", "fn_a", "2024-01-01 00:00:02"),  # texts differ
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    exact = (
        normalize(df)
        .select(
            "conv_id", "turn_idx",
            F.length("text").alias("text_len"),
            F.when(
                F.col("tool").isNotNull() & (F.col("tool") != ""), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("tool_call"),
            "ts",
        )
        .collect()
    )
    pruned = normalize_for_rollup(df).collect()
    key = lambda r: (
        r.conv_id, r.turn_idx,
        -1 if r.text_len is None else r.text_len, r.tool_call, str(r.ts),
    )
    assert sorted(map(key, pruned)) == sorted(map(key, exact))
    assert len(pruned) == 5


def test_sequence_content_hash_detects_duplicate_conversations(spark):
    rows = []
    for cid in ("s1", "s2"):  # identical content, different conv ids
        rows += [
            (cid, 0, "user", "hello", None, "2024-01-01 00:00:00"),
            (cid, 1, "assistant", "world", None, "2024-01-01 00:01:00"),
        ]
    rows += [("s3", 0, "user", "different", None, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    h = sequence_content_hash(df).toPandas()
    assert h[h.conv_id == "s1"].content_hash.iloc[0] == h[h.conv_id == "s2"].content_hash.iloc[0]
    assert h[h.conv_id == "s3"].content_hash.iloc[0] != h[h.conv_id == "s1"].content_hash.iloc[0]


def test_collapse_bursts_keeps_first_per_burst(spark):
    from datetime import datetime

    from aroma_spark.operators.normalize import collapse_bursts

    def t(s):
        return datetime(2024, 1, 1, 12, 0, s)

    rows = [
        # burst of three identical retries 10 s apart -> one survivor
        ("c1", 0, "user", "hello", None, t(0)),
        ("c1", 1, "user", "hello", None, t(10)),
        ("c1", 2, "user", "hello", None, t(20)),
        # same text much later -> its own burst
        ("c1", 3, "user", "hello", None, datetime(2024, 1, 1, 13, 0, 0)),
        # different text inside the burst window -> untouched
        ("c1", 4, "user", "bye", None, t(15)),
        # other conversation, same text -> independent
        ("c2", 0, "user", "hello", None, t(5)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    out = collapse_bursts(df, gap_us=30_000_000).toPandas()
    kept = {(r.conv_id, r.turn_idx): (r.burst_id, r.n_collapsed)
            for r in out.itertuples()}
    assert kept == {
        ("c1", 0): (1, 3),  # survivor of the 3-row burst
        ("c1", 3): (2, 1),  # later burst of the same text
        ("c1", 4): (1, 1),
        ("c2", 0): (1, 1),
    }


def test_collapse_bursts_chain_rule(spark):
    """t=0,25,50 s with a 30 s gap: one burst even though first->last
    exceeds the gap (sessionization, not fixed lookback)."""
    from datetime import datetime

    from aroma_spark.operators.normalize import collapse_bursts

    rows = [
        ("c", i, "user", "x", None, datetime(2024, 1, 1, 0, 0, 25 * i))
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    out = collapse_bursts(df, gap_us=30_000_000).collect()
    assert len(out) == 1
    assert out[0].turn_idx == 0 and out[0].n_collapsed == 3
