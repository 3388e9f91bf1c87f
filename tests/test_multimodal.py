"""Multimodal plumbing: binary payloads, Arrow batch feature extraction."""

from __future__ import annotations

import numpy as np
import pytest

from aroma_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_features,
    synth_media,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_features_deterministic():
    a, b = fake_features(b"abc"), fake_features(b"abc")
    assert np.array_equal(a, b)
    assert len(a) == FEATURE_DIM
    assert not np.array_equal(a, fake_features(b"abd"))


def test_extract_features_schema_and_values(spark):
    media = synth_media(spark, n=32)
    out = extract_features(media).toPandas().sort_values("media_id")
    assert len(out) == 32
    assert set(out.kind) == {"image", "audio", "video"}
    assert (out.n_bytes > 0).all()
    # per-row determinism against the local function
    payloads = {r.media_id: r.payload for r in media.collect()}
    row = out.iloc[0]
    assert np.allclose(
        np.array(row.feature, dtype=np.float32),
        fake_features(bytes(payloads[row.media_id])),
    )


def test_extract_features_partition_invariant(spark):
    media = synth_media(spark, n=16)
    a = extract_features(media.repartition(1)).toPandas().sort_values("media_id")
    b = extract_features(media.repartition(7)).toPandas().sort_values("media_id")
    assert [list(x) for x in a.feature] == [list(x) for x in b.feature]


def test_sample_frames_even_spacing(spark):
    from aroma_spark.functions.multimodal import sample_frames

    media = synth_media(spark, n=32)
    out = sample_frames(media, k=4).toPandas()
    assert set(out.kind) == {"video"}
    for mid, grp in out.groupby("media_id"):
        n = grp.n_frames.iloc[0]
        assert grp.frame_idx.tolist() == [i * n // 4 for i in range(4)]
        assert (grp.frame_idx < n).all()


def test_resize_stub_changes_payload_and_dims(spark):
    from aroma_spark.functions.multimodal import resize_stub

    media = synth_media(spark, n=8)
    out = resize_stub(media, 32, 24).toPandas()
    assert (out.width == 32).all() and (out.height == 24).all()
    orig = media.toPandas()
    assert not orig.payload.equals(out.payload)
