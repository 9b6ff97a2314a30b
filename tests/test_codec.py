import numpy as np
import pytest

from intuition_spark.index import codec


@pytest.mark.parametrize("seed", range(5))
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    # mix of small gaps and huge 64-bit-ish values
    vals = np.concatenate(
        [
            rng.integers(0, 128, 200),
            rng.integers(0, 1 << 20, 200),
            rng.integers(0, 1 << 62, 50),
            np.array([0, 1, 127, 128, 16383, 16384, (1 << 63) - 1]),
        ]
    ).astype(np.uint64)
    out = codec.varint_decode(codec.varint_encode(vals), len(vals))
    assert np.array_equal(out, vals)


def test_varint_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0


@pytest.mark.parametrize("seed", range(5))
def test_delta_roundtrip_sorted(seed):
    rng = np.random.default_rng(100 + seed)
    vals = np.unique(rng.integers(0, 1 << 45, 500)).astype(np.int64)
    out = codec.delta_decode(codec.delta_encode(vals), len(vals))
    assert np.array_equal(out, vals)


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    plists = [np.sort(rng.choice(1000, size=rng.integers(1, 20), replace=False)) for _ in range(50)]
    tfs = np.array([len(p) for p in plists])
    blob = codec.encode_positions(plists)
    out = codec.decode_positions(blob, tfs)
    for a, b in zip(plists, out):
        assert np.array_equal(a, b)


def test_varint_compression_is_compact():
    # delta-varint of dense sorted doc ids ≈ 1 byte per doc
    ids = np.arange(10_000, dtype=np.int64) + (7 << 40)
    blob = codec.delta_encode(ids)
    assert len(blob) < 10_000 + 10


# ---- property-based roundtrips (hypothesis) --------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    buf, lens = codec.varint_encode_with_lengths(arr)
    assert codec.varint_decode(buf, len(vals)).tolist() == [int(v) for v in vals]
    # per-value lengths tile the buffer exactly
    assert int(lens.sum()) == len(buf)
    assert codec.varint_encode(arr) == buf


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True))
def test_delta_roundtrip_property(vals):
    arr = np.sort(np.asarray(vals, dtype=np.int64))
    assert codec.delta_decode(codec.delta_encode(arr), len(arr)).tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=100000),
                         min_size=1, max_size=20).map(sorted).map(
                             lambda xs: sorted(set(xs))),
                min_size=1, max_size=30))
def test_positions_roundtrip_property(plists):
    plists = [np.asarray(p, dtype=np.int64) for p in plists if p]
    if not plists:
        return
    buf = codec.encode_positions(plists)
    tfs = np.asarray([len(p) for p in plists])
    out = codec.decode_positions(buf, tfs)
    for got, exp in zip(out, plists):
        assert got.tolist() == exp.tolist()
