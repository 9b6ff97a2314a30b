"""Real image decode path (INTUITION_MM_DECODE=real): the pure-stdlib PNG
decoder must invert an independently-written encoder for every PNG filter
type, and the mapInPandas feature pipeline must consume real pixels
end-to-end. The default stub mode (the gate path) is untouched."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from intuition_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    PNG_SIG,
    _decode_png,
    extract_features,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + typ + data + struct.pack(
        ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
    )


def _encode_png(px: np.ndarray, filters: list[int]) -> bytes:
    """Minimal PNG encoder (test-side, independent arithmetic): px is
    (h, w) grayscale or (h, w, 3) RGB uint8; filters gives the per-row
    filter type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth)."""
    if px.ndim == 2:
        ctype, ch = 0, 1
        flat = px[:, :, None]
    else:
        ctype, ch = 2, px.shape[2]
        flat = px
    h, w = flat.shape[:2]
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y].astype(np.int32)
        out = np.zeros_like(cur)
        for x in range(w):
            for c in range(ch):
                a = int(cur[x - 1, c]) if x >= 1 else 0
                b = int(prev[x, c])
                cc = int(prev[x - 1, c]) if x >= 1 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[x, c] = (cur[x, c] - pred) % 256
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_grayscale(filters):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    assert np.array_equal(_decode_png(_encode_png(px, filters)), px)


def test_png_roundtrip_rgb_averages_channels():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    got = _decode_png(_encode_png(px, [0, 4, 2]))
    exp = (px.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    assert np.array_equal(got, exp)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_png(b"not a png at all")


def test_extract_features_real_mode(spark, monkeypatch):
    """End-to-end: a real PNG payload flows through the mapInPandas feature
    pipeline with INTUITION_MM_DECODE=real; features equal the pooling of the
    TRUE pixels, not the stub's byte-derived fake."""
    monkeypatch.setenv("INTUITION_MM_DECODE", "real")
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload = _encode_png(px, [0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [("m0001", "image", "image/png", 8, 8, 0, bytearray(payload))], MEDIA_SCHEMA
    )
    rows = extract_features(media, feat_dim=16).collect()
    assert len(rows) == 1
    exp = np.resize(px.astype(np.float64).sum(axis=0), 16) / 256.0
    got = np.asarray(rows[0]["feature"], dtype=np.float64)
    assert np.allclose(got, exp)


# ---- JPEG (baseline, functions/jpeg.py) -----------------------------------
import sys as _sys
import os as _os

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from jpeg_ref_encoder import encode_jpeg  # noqa: E402 (test-side encoder)

from intuition_spark.functions.jpeg import JpegError, decode_jpeg_luma  # noqa: E402


def _test_image(h=20, w=30, seed=4):
    rng = np.random.default_rng(seed)
    img = (np.add.outer(np.arange(h) * 6, np.arange(w) * 4) % 256).astype(np.uint8)
    return (img * 0.7 + rng.integers(0, 60, img.shape)).astype(np.uint8)


def test_jpeg_roundtrip_grayscale():
    img = _test_image()
    out = decode_jpeg_luma(encode_jpeg([img], np.ones((8, 8))))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_nonuniform_quant_table_order():
    """A non-uniform quant table catches zigzag-order mistakes in DQT
    handling (a uniform table is order-blind)."""
    img = _test_image(seed=7)
    q = (1 + (np.add.outer(np.arange(8), np.arange(8)) % 3)).astype(np.float64)
    out = decode_jpeg_luma(encode_jpeg([img], q))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 10 and err.mean() <= 2.0


def test_jpeg_color_444_returns_luma():
    img = _test_image(seed=5)
    cb, cr = np.full_like(img, 100), np.full_like(img, 140)
    out = decode_jpeg_luma(encode_jpeg([img, cb, cr], np.ones((8, 8))))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_restart_markers():
    img = _test_image(h=24, w=40, seed=6)
    out = decode_jpeg_luma(encode_jpeg([img], np.ones((8, 8)), restart_interval=2))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(JpegError):
        decode_jpeg_luma(b"not a jpeg")
    img = _test_image(h=8, w=8)
    payload = bytearray(encode_jpeg([img], np.ones((8, 8))))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(JpegError, match="progressive"):
        decode_jpeg_luma(bytes(payload))


def test_jpeg_truncation_raises_jpeg_error():
    """Truncated payloads must surface as JpegError (the module's per-record
    rejection contract), not raw IndexError/struct.error from the bit reader
    or marker loop — a mapInPandas caller catching JpegError would otherwise
    crash its whole Arrow batch on one cut-off record."""
    img = _test_image(h=8, w=8)
    payload = encode_jpeg([img], np.ones((8, 8)))
    for cut in (3, 8, len(payload) // 2):
        with pytest.raises(JpegError):
            decode_jpeg_luma(payload[:cut])
    # dropping only the EOI marker is decodable by design: the entropy data is
    # complete and the reader pads with 1-bits at segment end (spec behavior)
    assert decode_jpeg_luma(payload[:-2]).shape == (8, 8)


def test_extract_features_real_mode_jpeg(spark, monkeypatch):
    """End-to-end: a real JPEG payload through the mapInPandas feature
    pipeline with INTUITION_MM_DECODE=real (no PIL in this sandbox, so this
    exercises the from-scratch baseline decoder on executors)."""
    monkeypatch.setenv("INTUITION_MM_DECODE", "real")
    img = _test_image(h=8, w=8, seed=11)
    payload = encode_jpeg([img], np.ones((8, 8)))
    media = spark.createDataFrame(
        [("m0002", "image", "image/jpeg", 8, 8, 0, bytearray(payload))], MEDIA_SCHEMA
    )
    rows = extract_features(media, feat_dim=16).collect()
    decoded = decode_jpeg_luma(payload)  # driver-side reference decode
    exp = np.resize(decoded.astype(np.float64).sum(axis=0), 16) / 256.0
    got = np.asarray(rows[0]["feature"], dtype=np.float64)
    assert np.allclose(got, exp)
    # and the real pixels, not the stub's byte-derived fake
    stub_exp = np.resize(
        np.frombuffer(payload, dtype=np.uint8)[: 64].astype(np.float64), (8, 8)
    )
    assert not np.allclose(got, np.resize(stub_exp.sum(axis=0), 16) / 256.0)
