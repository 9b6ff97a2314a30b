"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested. Decoding has two modes (`_decode_image`):
the default deterministic stub (gate/oracle mode — pixels derived from the
byte stream by integer arithmetic) and, with INTUITION_MM_DECODE=real, a
REAL image path: PIL when installed, else the built-in pure-stdlib PNG
decoder (`_decode_png`: zlib inflate + filter reversal). Audio/video decode
remains stubbed (no codecs in the sandbox); every plan shape is identical
across modes.

Design notes for 100 TB of media:
* binary payloads ride in their own column; `spark.sql.files.maxPartitionBytes`
  governs scan partition sizing, and metadata-only queries never touch the
  payload column (parquet column pruning).
* decode/feature steps are `mapInPandas` so one Arrow batch amortizes model
  setup; batch size is bounded by bytes not rows (`maxRecordsPerBatch` +
  payload size).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixels from the byte stream.

    The default (gate/test) mode — the oracle can replicate it with integer
    arithmetic. Set INTUITION_MM_DECODE=real to route PNG payloads through a
    real decoder instead (_decode_image below). Raising NotImplementedError
    here would poison plan tests, so the fake is deterministic instead:
    tests can assert exact feature values.
    """
    raw = np.frombuffer(payload, dtype=np.uint8)
    n = max(1, width * height)
    reps = int(np.ceil(n / max(1, raw.size)))
    return np.tile(raw, reps)[:n].reshape(max(1, height), max(1, width))


PNG_SIG = b"\x89PNG\r\n\x1a\n"
DECODE_ENV = "INTUITION_MM_DECODE"  # "stub" (default) | "real"


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode with only stdlib + numpy (the sandbox ships no image
    libraries): parses the chunk stream (PNG spec, RFC 2083), inflates the
    IDAT zlib stream, reverses per-row filters 0-4 (None/Sub/Up/Average/
    Paeth). Supports 8-bit depth, grayscale/RGB/RGBA, non-interlaced.
    Returns a 2-D uint8 grayscale array (RGB(A) channel-averaged)."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
        raise ValueError(f"unsupported PNG variant (depth={depth}, type={ctype})")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline stream length mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = line % 256
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        img[y] = cur.astype(np.uint8)
        prev = cur
    px = img.reshape(h, w, ch)
    if ch == 1:
        return px[:, :, 0].copy()
    return (px[:, :, :3].astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)


def _decode_mode() -> str:
    """Resolved DRIVER-side at plan-build time and captured in the UDF
    closure — executor python workers do not share the driver's env."""
    import os as _os

    return _os.environ.get(DECODE_ENV, "stub")


JPEG_SIG = b"\xff\xd8"


def _decode_image(payload: bytes, width: int, height: int, mode: str = "stub") -> np.ndarray:
    """Decoder dispatch: mode="real" routes PNG and JPEG payloads through
    PIL when importable, else the built-in pure-stdlib readers (_decode_png
    here; baseline-JPEG luma in functions/jpeg.py); everything else (and the
    default mode) uses the deterministic stub, so the gate and its oracle
    are unchanged unless INTUITION_MM_DECODE=real is set."""
    if mode == "real" and (payload[:8] == PNG_SIG or payload[:2] == JPEG_SIG):
        try:
            import io

            from PIL import Image  # type: ignore[import-not-found]

            return np.asarray(Image.open(io.BytesIO(payload)).convert("L"), dtype=np.uint8)
        except ImportError:
            if payload[:8] == PNG_SIG:
                return _decode_png(payload)
            from intuition_spark.functions.jpeg import decode_jpeg_luma

            return decode_jpeg_luma(payload)
    return _decode_image_stub(payload, width, height)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode → pooled feature vector, one Arrow batch at a time.

    Pooling is column-SUM / 256 (not mean): every pooled value is a dyadic
    rational exactly representable in float32 (colsum < 2^12, divided by a
    power of two), so downstream sums/rounds are bit-deterministic and the
    DuckDB gate oracle can reproduce them with integer arithmetic."""
    mode = _decode_mode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for row in pdf.itertuples(index=False):
                img = _decode_image(row.payload or b"", row.width or 4, row.height or 4, mode)
                pooled = np.resize(img.astype(np.float64).sum(axis=0), feat_dim) / 256.0
                feats.append([float(x) for x in pooled])
                nbytes.append(len(row.payload or b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(nbytes, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize (nearest-neighbor over the decoded pixels) → new payload column.
    Plan shape: mapInPandas, payload in/payload out, metadata updated."""
    mode = _decode_mode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for row in pdf.itertuples(index=False):
                img = _decode_image(row.payload or b"", row.width or 4, row.height or 4, mode)
                ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                payloads.append(img[np.ix_(ys, xs)].astype(np.uint8).tobytes())
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = np.int32(out_w)
            out["height"] = np.int32(out_h)
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.
    (Stub derives frame bytes from slices of the payload.)"""
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("t_ms", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, payloads = [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                dur = int(row.duration_ms or 0)
                body = row.payload or b""
                n_frames = max(1, dur // every_ms)
                step = max(1, len(body) // n_frames)
                for i in range(n_frames):
                    ids.append(row.media_id)
                    idxs.append(i)
                    ts.append(i * every_ms)
                    payloads.append(body[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "t_ms": pd.array(ts, dtype="int32"), "payload": payloads}
            )

    return media.mapInPandas(run, frame_schema)


def media_from_documents(docs: DataFrame, n: int = 64) -> DataFrame:
    """Deterministic media table derived from the gate's `documents` table:
    payload = UTF-8 bytes of `text` (pure-ASCII in the gate corpus), metadata
    from doc_id arithmetic. Because every byte is reproducible as
    ``ascii(substr(text, k, 1))`` in SQL, the DuckDB oracle can replicate the
    stub decode end-to-end — this is what upgrades the mm_* gate entries from
    rows-only to full value-hash PASS."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    idx = (F.col("doc_id") % 3 + 1).cast("int")
    return (
        docs.filter((F.col("doc_id") < n) & (F.length("text") > 0))
        .select(
            F.concat(F.lit("m"), F.lpad(F.col("doc_id").cast("string"), 4, "0")).alias(
                "media_id"
            ),
            F.element_at(kinds, idx).alias("kind"),
            F.element_at(mimes, idx).alias("mime"),
            (F.col("doc_id") % 8 + 4).cast("int").alias("width"),
            (F.floor(F.col("doc_id") / 2) % 8 + 4).cast("int").alias("height"),
            ((F.col("doc_id") % 7) * 1500).cast("int").alias("duration_ms"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                f"m{i:04d}",
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                4 + i % 8,
                4 + (i // 2) % 8,
                (i % 7) * 1500,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
