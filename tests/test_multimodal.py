"""Multimodal plumbing: binary payloads, Arrow batch feature extraction."""

from __future__ import annotations

import numpy as np
import pytest

from aroma_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_features,
    image_stats,
    is_pil_available,
    synth_media,
)


def _ppm_bytes(w: int, h: int, pixels: np.ndarray) -> bytes:
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _bmp_bytes(w: int, h: int, pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = b"".join(
        pixels[y, :, ::-1].tobytes().ljust(stride, b"\0")
        for y in range(h - 1, -1, -1)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + body


def _pixels(w: int, h: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_decode_netpbm_real_pixels():
    px = _pixels(5, 3)
    assert np.array_equal(decode_image(_ppm_bytes(5, 3, px)), px)
    # P5 grayscale broadcast to 3 channels
    gray = _pixels(4, 2)[:, :, 0]
    p5 = b"P5\n4 2\n255\n" + gray.tobytes()
    out = decode_image(p5)
    assert out.shape == (2, 4, 3) and np.array_equal(out[:, :, 1], gray)


def test_decode_bmp_real_pixels():
    px = _pixels(5, 3, seed=11)
    assert np.array_equal(decode_image(_bmp_bytes(5, 3, px)), px)


def test_decode_compressed_gated_on_pil():
    if is_pil_available():
        import io

        from PIL import Image

        px = _pixels(4, 4, seed=3)
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="PNG")
        assert np.array_equal(decode_image(buf.getvalue()), px)
    else:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")


def test_image_stats_real_decode(spark):
    px = _pixels(6, 4, seed=5)
    rows = [
        (1, "image", bytearray(_ppm_bytes(6, 4, px)), 6, 4, 1, 0),
        (2, "image", bytearray(_bmp_bytes(6, 4, px)), 6, 4, 1, 0),
        (3, "image", bytearray(b"\x89PNG garbage"), 0, 0, 1, 0),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, "
        "height int, n_frames int, sample_rate int",
    )
    out = {r.media_id: r for r in image_stats(media).collect()}
    want = px.reshape(-1, 3).mean(axis=0)
    for mid in (1, 2):
        r = out[mid]
        assert (r.height, r.width) == (4, 6) and r.decode_err is None
        assert np.allclose([r.mean_r, r.mean_g, r.mean_b], want)
    # corrupt blob -> error row, not a crashed batch
    assert out[3].decode_err is not None and out[3].mean_r is None


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
