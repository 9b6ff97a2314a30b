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
