"""Spark-side codec plumbing: blob-per-(conv,day), exact round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroma_spark.operators.codec_ops import (
    codec_roundtrip,
    decode_series,
    encode_series,
)
from aroma_spark.operators.normalize import dedup_exact
from aroma_spark.operators.signals import with_signals


def test_one_blob_per_conv_day(spark, tiny_transcripts):
    sig = with_signals(dedup_exact(tiny_transcripts))
    enc = encode_series(sig).toPandas()
    want = (
        dedup_exact(tiny_transcripts)
        .select("conv_id", F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert len(enc) == want
    assert (enc.n > 0).all()


def test_roundtrip_identity(spark, tiny_transcripts):
    sig = with_signals(dedup_exact(tiny_transcripts))
    rt = codec_roundtrip(sig)
    orig = sig.select(
        "conv_id", F.to_date("ts").alias("day"), "ts", "inter_time_us"
    )
    got = rt.select("conv_id", "day", "ts", "inter_time_us")
    assert got.exceptAll(orig).count() == 0
    assert orig.exceptAll(got).count() == 0


def test_decode_preserves_order_within_blob(spark, tiny_transcripts):
    sig = with_signals(dedup_exact(tiny_transcripts))
    dec = decode_series(encode_series(sig)).toPandas()
    for (_, _), grp in dec.groupby(["conv_id", "day"]):
        g = grp.sort_values("seq_idx")
        assert g.ts_us.is_monotonic_increasing
