"""Minimal baseline JPEG ENCODER — test scaffolding only (the product ships
the decoder, intuition_spark/functions/jpeg.py; the sandbox has no image
library to produce fixtures, so the tests encode their own). Baseline
sequential DCT, 8-bit, grayscale or 3-component 4:4:4, one quant table,
standard T.81 Annex K.3 luminance Huffman tables, optional restart markers.
"""

from __future__ import annotations

import struct

import numpy as np

from intuition_spark.functions.jpeg import _C, ZIGZAG

# T.81 Annex K.3 typical luminance tables (public spec constants)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = bytes(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)


def _codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)

    def raw_marker(self, b: int) -> None:
        self.pad()
        self.out += bytes([0xFF, b])


def _encode_block(bw, blk, qnat, dc_codes, ac_codes, pred):
    coef = _C @ (blk.astype(np.float64) - 128.0) @ _C.T
    q = np.round(coef / qnat).astype(np.int32)
    zz = q.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    ln, code = dc_codes[s]
    bw.write(code, ln)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    last = last_nz[-1] + 1 if last_nz.size else 0
    for k in range(1, 64):
        if k > last:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(planes: list[np.ndarray], qnat: np.ndarray, restart_interval: int = 0) -> bytes:
    """planes: 1 (grayscale) or 3 (4:4:4) equal-shape uint8 planes; qnat:
    8x8 natural-order quant table."""
    h, w = planes[0].shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    dc_codes, ac_codes = _codes(DC_BITS, DC_VALS), _codes(AC_BITS, AC_VALS)

    head = bytearray(b"\xff\xd8")
    qzz = qnat.flatten()[ZIGZAG].astype(np.uint8)
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qzz.tobytes()
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    head += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (bits, vals) in ((0, (DC_BITS, DC_VALS)), (1, (AC_BITS, AC_VALS))):
        seg = bytes([tc << 4]) + bytes(bits) + vals
        head += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        head += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + b"\x00\x3f\x00"
    head += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    pred = [0] * nc
    n_mcu = 0
    rst = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
                pred = [0] * nc
            n_mcu += 1
            for ci in range(nc):
                blk = padded[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                pred[ci] = _encode_block(bw, blk, qnat, dc_codes, ac_codes, pred[ci])
    bw.pad()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"
