"""Synthetic generator: determinism, skew, fixture properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.synth import synth_transcripts


def test_deterministic_across_parallelism(spark):
    a = synth_transcripts(spark, n_turns=2000, n_convs=50, seed=1, partitions=2)
    b = synth_transcripts(spark, n_turns=2000, n_convs=50, seed=1, partitions=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema_and_fixture_properties(spark):
    df = synth_transcripts(spark, n_turns=5000, n_convs=100, seed=42).cache()
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    # duplicates injected
    assert df.count() > df.dropDuplicates().count()
    # skew: hottest conversation much larger than median
    sizes = df.groupBy("conv_id").count().toPandas()["count"]
    assert sizes.max() > 5 * sizes.median()
    # turn_idx dense from 0 per conversation (on the dedup'd frame)
    d = df.dropDuplicates()
    chk = d.groupBy("conv_id").agg(
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.count("*").alias("n"),
    )
    bad = chk.where((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0
    # ts ties exist (0-gap injection) and >1h holes exist
    from aroma_spark.operators.signals import with_signals

    sig = with_signals(d).toPandas()
    later = sig[sig.turn_idx > 0]
    assert (later.inter_time_us == 0).any()
    assert (later.inter_time_us > 3600 * 10**6).any()
    df.unpersist()
