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
    manifest = load_manifest(spark, root, "1m")
    assert any(k.startswith("2024-02-01|") for k in manifest)


def test_deleted_day_removes_tier_partition_and_manifest(
    spark, tiny_transcripts, tmp_path
):
    """A day deleted from the source is detected as stale: its tier
    partitions are deleted, its manifest entry dropped, and later days
    recompute (lag signals cross day boundaries). Result equals a fresh
    rollup of the truncated source."""
    import os

    root = str(tmp_path / "wh")
    incremental_rollup(spark, _sig(tiny_transcripts), root)
    days = sorted(
        r[0]
        for r in tiny_transcripts.select(
            F.to_date("ts").cast("string")
        ).distinct().collect()
    )
    drop_day = days[0]
    truncated = tiny_transcripts.where(F.to_date("ts").cast("string") != drop_day)
    m = incremental_rollup(spark, _sig(truncated), root)
    assert m["1m"]["stale_partitions"] == 1
    assert not os.path.exists(f"{root}/tier=1m/day={drop_day}")
    assert not any(
        k.startswith(f"{drop_day}|") for k in load_manifest(spark, root, "1m")
    )
    # tier content equals a from-scratch rollup of the truncated source
    disk = spark.read.parquet(f"{root}/tier=1m").drop("day")
    mem = rollup_tier(_sig(truncated), "minute")
    assert disk.exceptAll(mem).count() == 0 and mem.exceptAll(disk).count() == 0


def test_backfill_recomputes_only_affected_convs(spark, tiny_transcripts, tmp_path):
    """Editing one conversation in day 1 recomputes later days only for
    that conversation: untouched convs' later-day rows survive from disk
    (verified by value equality with a fresh rollup — the merge path
    keep ∪ partial must be lossless)."""
    root = str(tmp_path / "wh")
    incremental_rollup(spark, _sig(tiny_transcripts), root)
    # edit conv 'a' on the earliest day: shift one text payload
    edited = tiny_transcripts.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == "a") & (F.col("turn_idx") == 0),
            F.lit("hello world EDITED"),
        ).otherwise(F.col("text")),
    )
    m = incremental_rollup(spark, _sig(edited), root)
    assert m["1m"]["changed_partitions"] >= 1
    # the backfill scope is one conversation, not the corpus
    assert m["1m"]["affected_convs"] == 1
    disk = spark.read.parquet(f"{root}/tier=1m").drop("day")
    mem = rollup_tier(_sig(edited), "minute")
    assert disk.exceptAll(mem).count() == 0 and mem.exceptAll(disk).count() == 0


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
