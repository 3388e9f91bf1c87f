"""Checkpoint/lineage: resume skips unchanged days, results stay exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.normalize import dedup_exact
from aroma_spark.operators.signals import with_signals
from aroma_spark.operators.tiers import rollup_tier
from aroma_spark.plans.checkpoint import incremental_rollup, load_manifest
from aroma_spark.plans.pipeline import run_pipeline


def _sig(tiny):
    return with_signals(dedup_exact(tiny))


def test_incremental_rollup_writes_all_tiers(spark, tiny_transcripts, tmp_path):
    root = str(tmp_path / "wh")
    m = incremental_rollup(spark, _sig(tiny_transcripts), root)
    assert set(m) == {"1m", "1h", "1d"}
    for tier, stats in m.items():
        assert stats["row_count"] > 0
        assert stats["changed_partitions"] == stats["total_partitions"] == 3
    # written 1m tier equals the in-memory rollup
    disk = spark.read.parquet(f"{root}/tier=1m").drop("day")
    mem = rollup_tier(_sig(tiny_transcripts), "minute")
    assert disk.exceptAll(mem).count() == 0 and mem.exceptAll(disk).count() == 0


def test_resume_skips_unchanged(spark, tiny_transcripts, tmp_path):
    root = str(tmp_path / "wh")
    incremental_rollup(spark, _sig(tiny_transcripts), root)
    m2 = incremental_rollup(spark, _sig(tiny_transcripts), root)
    for stats in m2.values():
        assert stats["changed_partitions"] == 0


def test_append_day_recomputes_only_that_day(spark, tiny_transcripts, tmp_path):
    root = str(tmp_path / "wh")
    incremental_rollup(spark, _sig(tiny_transcripts), root)
    extra = spark.createDataFrame(
        [("z", 0, "user", "new day", None, "2024-02-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    m = incremental_rollup(
        spark, _sig(tiny_transcripts.unionByName(extra)), root
    )
    for stats in m.values():
        assert stats["changed_partitions"] == 1
        assert stats["total_partitions"] == 4
    manifest = load_manifest(root, "1m")
    assert "2024-02-01" in manifest


def test_run_pipeline_metrics(spark, tiny_transcripts, tmp_path):
    out = run_pipeline(spark, tiny_transcripts, str(tmp_path / "wh"))
    assert out["total_rollup_points"] > 0
    assert set(out["tiers"]) == {"1m", "1h", "1d"}
    assert out["points_per_sec"] is not None


def test_run_pipeline_nonmonotone_ts_one_blob_per_conv_day(spark, tmp_path):
    """ts out of order vs turn_idx crossing midnight: turn order visits
    day2, day1, day2 — non-contiguous (conv, day) groups. The pipeline
    must detect it (negative inter_time probe) and fall back to the
    repartition+sort encode path: exactly one blob per (conv, day),
    never duplicate rows with restarting seq_idx."""
    rows = [
        ("x", 0, "user", "late", None, "2024-01-02 00:00:05"),
        ("x", 1, "assistant", "early", None, "2024-01-01 23:59:50"),
        ("x", 2, "user", "late2", None, "2024-01-02 00:00:10"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    root = str(tmp_path / "wh")
    run_pipeline(spark, df, root)
    blobs = spark.read.parquet(f"{root}/blobs")
    per_group = blobs.groupBy("conv_id", "day").count().collect()
    assert len(per_group) == 2  # (x, 01-01) and (x, 01-02)
    assert all(r["count"] == 1 for r in per_group)
    assert blobs.agg(F.sum("n")).collect()[0][0] == 3
