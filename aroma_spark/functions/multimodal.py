"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
transforms run as Arrow-batched ``mapInPandas`` so payload bytes never
round-trip through Python row objects. The actual media decode is
STUBBED (no codec libs in this container): ``decode_image`` raises
NotImplementedError unless given the deterministic fake decoder, which
derives a fixed feature vector from the payload bytes — the Spark-side
schema, batching, and partition behavior are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "n_frames int, sample_rate int"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, kind string, feature array<float>, n_bytes long"


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode requires PIL/libjpeg — not available in this
    container. The pipeline uses fake_features() instead."""
    raise NotImplementedError(
        "media decode is stubbed in this environment; wire PIL/ffmpeg here"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: md5-seeded projection of
    the payload bytes. Stable across engines/partitions -> testable."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batch in/out; one task per input partition — media tables
    should be stored with size-bounded row groups
    (spark.sql.files.maxPartitionBytes) so a batch of payloads fits in
    executor memory.
    """

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fake_features(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """Deterministic uniform frame sampling for video payloads.

    Emits one row per sampled frame index: evenly spaced over
    [0, n_frames) (the standard eval-time sampling policy), entirely in
    Catalyst (sequence + explode) — the actual frame *decode* is the
    stubbed step; this is the plumbing that feeds it.
    """
    idx = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: (i * F.col("n_frames")) / k,
        ).cast("array<int>")
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", "kind", "n_frames", idx.alias("frame_idx")
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: output schema + metadata are real, the pixel
    transform is the deterministic fake (payload re-hash) since no image
    codec exists in this container."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                hashlib.md5(
                    (p if p is not None else b"") + f":{width}x{height}".encode()
                ).digest()
                for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(fn, media.schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table derived deterministically from the shared ``documents``
    corpus: payload = UTF-8 bytes of the text column. Both engines can
    compute the md5-projection features from the same bytes, which makes
    the multimodal path oracle-checkable at every scale factor (unlike
    ``synth_media``, which is engine-local)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.coalesce(F.col("text"), F.lit("")).cast("binary").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("doc_id") % 16 + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(f"media:{seed}:"), F.col("id")), 256)
        .cast("binary")
        .alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("id") % 16 + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )
    return df
