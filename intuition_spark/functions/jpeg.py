"""Baseline JPEG (ITU-T T.81) decoder — pure stdlib + numpy.

The sandbox ships no image libraries, so INTUITION_MM_DECODE=real needs a
from-scratch decoder for JPEG payloads (the PNG path has `_decode_png` in
multimodal.py). Scope: baseline sequential DCT (SOF0/SOF1), 8-bit samples,
1 or 3 components, any sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
markers. Progressive (SOF2) and arithmetic coding are rejected with a clear
error. Output is the LUMA plane as 2-D uint8 (the feature extractor pools a
grayscale plane; chroma blocks are entropy-decoded to keep bitstream sync
but skip dequant/IDCT — at 100 TB that is a third of the IDCT work saved).

Decode cost is dominated by the per-coefficient Huffman loop (pure Python);
payloads decode inside mapInPandas batches, so one Arrow batch amortizes
the setup and the engine never ships pixels across the wire (features only).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II basis: spatial = C.T @ coeffs @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class JpegError(ValueError):
    pass


class _Huff:
    """Canonical Huffman table: (length, code) → symbol, as a dict keyed by
    (nbits, code) — simple and fast enough for metadata-scale payloads."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via reset()
                raise JpegError("hit restart marker mid-symbol")
            else:
                # past the scan: pad with 1-bits (spec behavior at segment end)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def reset_at_rst(self) -> None:
        """Align to the next RST marker boundary and clear the bit buffer."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("expected restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` raw bits to a signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG → 2-D uint8 luma plane (h × w).

    Every malformed input — including TRUNCATED payloads, whose raw symptom
    is an IndexError/struct.error deep in the bit reader or marker loop —
    surfaces as JpegError, so per-record rejection in mapInPandas callers
    works with one except clause instead of crashing the Arrow batch."""
    try:
        return _decode_jpeg_luma(payload)
    except JpegError:
        raise
    except (IndexError, KeyError, ValueError, struct.error) as e:
        raise JpegError(f"malformed or truncated JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg_luma(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    d = payload
    while True:
        if d[pos] != 0xFF:
            raise JpegError(f"bad marker sync at {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise JpegError("reached EOI without a scan")
        (seglen,) = struct.unpack(">H", d[pos : pos + 2])
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (huff_ac if tc else huff_dc)[th] = _Huff(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline / ext sequential)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker == 0xC2:
            raise JpegError("progressive JPEG not supported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"], comp["ta"] = tt >> 4, tt & 15
                scan.append(comp)
            pos += seglen
            return _decode_scan(d, pos, scan, qt, huff_dc, huff_ac, h, w, restart_interval)
        # APPn / COM / anything else: skip
        pos += seglen


def _decode_scan(d, pos, scan, qt, huff_dc, huff_ac, h, w, restart_interval):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luma = scan[0]
    ly = mcus_y * luma["v"] * 8
    lx = mcus_x * luma["h"] * 8
    Y = np.zeros((ly, lx), dtype=np.float64)
    # DQT stores the table in ZIGZAG order (T.81 B.2.4.1): natural-order
    # position ZIGZAG[i] holds stored element i — same scatter as coefficients
    dq = np.zeros(64, dtype=np.float64)
    dq[ZIGZAG] = qt[luma["tq"]].astype(np.float64)
    dq = dq.reshape(8, 8)
    pred = {c["id"]: 0 for c in scan}
    br = _BitReader(d, pos)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.reset_at_rst()
                pred = {c["id"]: 0 for c in scan}
            n_mcu += 1
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = _decode_block(br, huff_dc[c["td"]], huff_ac[c["ta"]], pred, c)
                        if ci != 0:
                            continue  # chroma: sync-only, luma out
                        zz = np.zeros(64, dtype=np.float64)
                        zz[ZIGZAG] = coefs
                        blk = _C.T @ (zz.reshape(8, 8) * dq) @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        Y[y0 : y0 + 8, x0 : x0 + 8] = blk
    out = np.clip(np.round(Y + 128.0), 0, 255).astype(np.uint8)
    # luma plane is sampled at h*(v/vmax) × w*(h/hmax); scale to image dims
    sy = luma["v"] / vmax
    sx = luma["h"] / hmax
    plane_h = int(np.ceil(h * sy))
    plane_w = int(np.ceil(w * sx))
    out = out[:plane_h, :plane_w]
    if sy != 1.0 or sx != 1.0:  # nearest-neighbor up to (h, w)
        yi = np.minimum((np.arange(h) * sy).astype(int), plane_h - 1)
        xi = np.minimum((np.arange(w) * sx).astype(int), plane_w - 1)
        out = out[np.ix_(yi, xi)]
    else:
        out = out[:h, :w]
    return out


def _decode_block(br: _BitReader, hdc: _Huff, hac: _Huff, pred: dict, comp: dict) -> np.ndarray:
    coefs = np.zeros(64, dtype=np.int32)
    size = br.huff(hdc)
    diff = _extend(br.bits(size), size) if size else 0
    pred[comp["id"]] += diff
    coefs[0] = pred[comp["id"]]
    k = 1
    while k < 64:
        rs = br.huff(hac)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise JpegError("AC run past block end")
        coefs[k] = _extend(br.bits(size), size)
        k += 1
    return coefs
