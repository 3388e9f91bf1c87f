"""Codec round-trip tests: encode ∘ decode = identity, exact bits."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aroma_spark.functions.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)


@pytest.mark.parametrize(
    "ts",
    [
        [],
        [7],
        [7, -9],
        [0, 2**40, -(2**40), 5],
        [1, 2, 3, 4, 5],
        [10, 10, 10],
        [-(2**62), 2**62, 0],
    ],
)
def test_dod_edges(ts):
    a = np.array(ts, dtype=np.int64)
    assert np.array_equal(decode_dod(encode_dod(a)), a)


def test_dod_regular_compresses():
    ts = np.arange(10_000, dtype=np.int64) * 60_000_000
    blob = encode_dod(ts)
    assert len(blob) < 0.05 * 8 * len(ts)  # constant dod -> ~1 bit/point
    assert np.array_equal(decode_dod(blob), ts)


@given(
    st.lists(
        st.integers(min_value=-(2**61), max_value=2**61), min_size=0, max_size=300
    )
)
@settings(max_examples=80, deadline=None)
def test_dod_property(xs):
    a = np.cumsum(np.array(xs, dtype=np.int64) // 4).astype(np.int64)
    assert np.array_equal(decode_dod(encode_dod(a)), a)


@pytest.mark.parametrize(
    "vs",
    [
        [],
        [float("nan")],
        [1.0, 1.0, 1.0],
        [0.0, -0.0, float("inf"), float("-inf"), float("nan")],
        [1e-308, 5e-324, 1.7e308],
    ],
)
def test_gorilla_edges(vs):
    a = np.array(vs, dtype=np.float64)
    out = decode_gorilla(encode_gorilla(a))
    assert np.array_equal(out.view(np.uint64), a.view(np.uint64))


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300))
@settings(max_examples=80, deadline=None)
def test_gorilla_property(vs):
    a = np.array(vs, dtype=np.float64)
    out = decode_gorilla(encode_gorilla(a))
    assert np.array_equal(out.view(np.uint64), a.view(np.uint64))


def test_gorilla_slowly_varying_compresses():
    rng = np.random.default_rng(7)
    v = np.round(np.cumsum(rng.normal(size=5000) * 0.01) + 100.0, 2)
    blob = encode_gorilla(v)
    assert len(blob) < 0.75 * 8 * len(v)
    assert np.array_equal(decode_gorilla(blob).view(np.uint64), v.view(np.uint64))


# --- segmented encoders: byte parity with the per-group encoders ---

from aroma_spark.functions.codecs import (  # noqa: E402
    encode_dod_segments,
    encode_gorilla_segments,
)


@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=12),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_segmented_byte_parity(lens, rnd):
    """encode_*_segments must emit byte-identical blobs to per-group
    encode_* — the pipeline swaps between them freely."""
    total = sum(lens)
    starts = np.cumsum([0] + lens[:-1])
    pool = [
        0,
        1,
        -1,
        2**40,
        -(2**40),
        np.iinfo(np.int64).max,
        np.iinfo(np.int64).min,
    ]
    ts = np.array([pool[rnd.randrange(len(pool))] for _ in range(total)],
                  dtype=np.int64)
    fpool = [0.0, -0.0, 1.5, np.nan, np.inf, -np.inf, 1e308, 5e-324]
    vs = np.array([fpool[rnd.randrange(len(fpool))] for _ in range(total)],
                  dtype=np.float64)
    seg_d = encode_dod_segments(ts, starts)
    seg_g = encode_gorilla_segments(vs, starts)
    off = 0
    for i, ln in enumerate(lens):
        assert seg_d[i] == encode_dod(ts[off : off + ln])
        assert seg_g[i] == encode_gorilla(vs[off : off + ln])
        assert np.array_equal(decode_dod(seg_d[i]), ts[off : off + ln])
        assert np.array_equal(
            decode_gorilla(seg_g[i]).view(np.uint64),
            vs[off : off + ln].view(np.uint64),
        )
        off += ln


def test_segmented_smooth_series_parity():
    """Realistic smooth series hit the fused-codeword fast paths."""
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 300, size=50)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total = int(lens.sum())
    ts = np.cumsum(rng.integers(900_000, 1_100_000, size=total)).astype(
        np.int64
    )
    vs = np.cumsum(rng.normal(size=total)).astype(np.float64)
    seg_d = encode_dod_segments(ts, starts)
    seg_g = encode_gorilla_segments(vs, starts)
    off = 0
    for i, ln in enumerate(lens):
        assert seg_d[i] == encode_dod(ts[off : off + ln])
        assert seg_g[i] == encode_gorilla(vs[off : off + ln])
        off += int(ln)


# --- transposed decoders: vectorized across blobs ---

from aroma_spark.functions.codecs import (  # noqa: E402
    decode_dod_many,
    decode_gorilla_many,
)


@given(
    st.lists(st.integers(min_value=1, max_value=25), min_size=1, max_size=10),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_decode_many_parity(lens, rnd):
    """decode_*_many must equal per-blob decode_* on every blob,
    including length-skewed batches (active-prefix shrink)."""
    pool = [0, 1, -1, 2**40, np.iinfo(np.int64).max, np.iinfo(np.int64).min]
    fpool = [0.0, -0.0, 1.5, np.nan, np.inf, -np.inf, 1e308, 5e-324]
    dblobs, gblobs, ts_ref, vs_ref = [], [], [], []
    for ln in lens:
        ts = np.array(
            [pool[rnd.randrange(len(pool))] for _ in range(ln)],
            dtype=np.int64,
        )
        vs = np.array(
            [fpool[rnd.randrange(len(fpool))] for _ in range(ln)],
            dtype=np.float64,
        )
        dblobs.append(encode_dod(ts))
        gblobs.append(encode_gorilla(vs))
        ts_ref.append(ts)
        vs_ref.append(vs)
    out_d = decode_dod_many(dblobs)
    out_g = decode_gorilla_many(gblobs)
    for i in range(len(lens)):
        assert np.array_equal(out_d[i], ts_ref[i])
        assert np.array_equal(
            out_g[i].view(np.uint64), vs_ref[i].view(np.uint64)
        )


def test_decode_many_empty_and_singleton():
    assert decode_dod_many([]) == []
    assert decode_gorilla_many([]) == []
    e = encode_dod(np.array([], dtype=np.int64))
    assert len(decode_dod_many([e])[0]) == 0
    s = encode_dod(np.array([77], dtype=np.int64))
    assert np.array_equal(decode_dod_many([s])[0], [77])
    g1 = encode_gorilla(np.array([np.nan], dtype=np.float64))
    assert np.isnan(decode_gorilla_many([g1])[0][0])
