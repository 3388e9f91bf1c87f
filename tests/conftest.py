from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aroma_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("aroma-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    """Hand-written deterministic fixture in the spirit of the reference's
    create_text_files (reference: tests/unit/datasets/test_breakfast.py:46-68):
    3 conversations — ragged lengths, a >1h gap, a ts tie, an exact
    duplicate row, NULL tools, one single-turn conversation."""
    rows = [
        # conv a: 4 turns, includes a >1h gap and a ts tie
        ("a", 0, "user", "hello world", None, "2024-01-01 00:00:00"),
        ("a", 1, "assistant", "hi", None, "2024-01-01 00:00:30"),
        ("a", 2, "tool", "result=42", "fn_calc", "2024-01-01 00:00:30"),
        ("a", 3, "user", "thanks bye", None, "2024-01-01 02:10:00"),
        # conv b: 2 turns + an exact duplicate of its first row
        ("b", 0, "user", "start", None, "2024-01-02 10:00:00"),
        ("b", 0, "user", "start", None, "2024-01-02 10:00:00"),
        ("b", 1, "assistant", "done", "fn_x", "2024-01-02 10:05:00"),
        # conv c: single turn
        ("c", 0, "system", "init", None, "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.to_timestamp("ts"))
