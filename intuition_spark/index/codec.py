"""Delta + varint posting-block codec, fully vectorized with numpy.

Replaces Lucene's internal postings format (the reference treats it as a black
box behind ``SolrClientTool.add``, `util/SolrClientTool.java:357`). Posting
blocks hold ≤ BLOCK_SIZE docs; doc ids are strictly increasing within a block,
so they delta-encode; tfs / doc-lengths / positions varint-encode directly.

Both encode and decode are O(bytes) numpy array programs — no per-value Python
loops — so they run fast inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_U64 = np.uint64
_SHIFTS = [_U64(7 * i) for i in range(10)]


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; also return per-value byte lengths so a
    caller can slice the buffer into blocks without re-encoding (vectorized:
    one pass per byte-position)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= _U64(7)
    nbytes = np.maximum(nbits // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    for i, shift in enumerate(_SHIFTS):
        sel = nbytes > i
        if not sel.any():
            break
        byte = ((v[sel] >> shift) & _U64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1 > i).astype(np.uint8) << 7
        buf[offsets[:-1][sel] + i] = byte | cont
    return buf.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized: one pass per byte-position)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= _U64(7)
    nbytes = np.maximum(nbits // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    for i, shift in enumerate(_SHIFTS):
        sel = nbytes > i
        if not sel.any():
            break
        byte = ((v[sel] >> shift) & _U64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1 > i).astype(np.uint8) << 7
        buf[offsets[:-1][sel] + i] = byte | cont
    return buf.tobytes()


def varint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized via reduceat)."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_end = (b & 0x80) == 0
    starts = np.concatenate(([0], np.flatnonzero(is_end)[:-1] + 1))
    byte_idx = np.arange(b.size) - np.repeat(starts, np.diff(np.concatenate((starts, [b.size]))))
    vals = (b & 0x7F).astype(_U64) << (_U64(7) * byte_idx.astype(_U64))
    out = np.add.reduceat(vals, starts)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """First value absolute, then gaps (values must be strictly increasing)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.int64)
    if v.size == 0:
        return b""
    d = np.empty(v.shape, dtype=_U64)
    d[0] = _U64(v[0])
    d[1:] = (v[1:] - v[:-1]).astype(_U64)
    return varint_encode(d)


def delta_decode(data: bytes, count: int | None = None) -> np.ndarray:
    d = varint_decode(data, count)
    return np.cumsum(d.astype(np.int64)) if d.size else np.empty(0, dtype=np.int64)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concatenate per-doc position lists, each internally delta-encoded.

    Per-doc lengths are NOT stored here — they equal the tf stream, which the
    block already carries (Lucene does the same: freqs double as position
    counts).
    """
    if not positions_per_doc:
        return b""
    chunks = []
    for ps in positions_per_doc:
        a = np.asarray(ps, dtype=np.int64)
        d = np.empty(a.shape, dtype=_U64)
        if a.size:
            d[0] = _U64(a[0])
            d[1:] = (a[1:] - a[:-1]).astype(_U64)
        chunks.append(d)
    return varint_encode(np.concatenate(chunks))


def decode_positions(data: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    flat = varint_decode(data).astype(np.int64)
    out: list[np.ndarray] = []
    off = 0
    for tf in tfs:
        tf = int(tf)
        seg = flat[off : off + tf]
        out.append(np.cumsum(seg))
        off += tf
    if off != flat.size:
        raise ValueError("position stream length mismatch")
    return out
