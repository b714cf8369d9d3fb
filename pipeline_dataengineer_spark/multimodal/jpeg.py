"""Pure-Python/numpy baseline JPEG (SOF0) pixel decoder — stdlib + numpy only.

Decodes baseline sequential DCT JPEGs: DQT / DHT / SOF0 / SOS / DRI
segments, Huffman entropy decode of interleaved MCUs, dequantization,
8x8 inverse DCT (vectorized numpy, orthonormal DCT-III via matrix
multiply), chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0, YCbCr -> RGB.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise —
callers treat any raise as an undecodable blob.

Exists because this container has no libjpeg/PIL: it makes the
mapInPandas media path (``media.py``) run on GENUINE JPEG pixels, the
same role the stdlib PNG inflate+defilter plays for PNG. Throughput
is test-scale (per-bit Python Huffman loop); a production deployment
swaps this for libjpeg-turbo behind the same ``_decode_image_bytes``
seam without touching any Spark plumbing. Verified against real-world
camera JPEGs (4:2:0) and spec-table round trips (see
tests/jpeg_encoder.py).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i in the scan stream -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Orthonormal 8-point DCT-II basis; IDCT is C.T @ block @ C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


class _HuffTable:
    """Canonical JPEG Huffman table with a flat (code, length) -> value
    lookup via the standard successive-range decoding (F.16)."""

    def __init__(self, counts: list[int], values: bytes):
        # mincode/maxcode/valptr per length, per spec figure C.1-C.3
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            self.maxcode[ln] = code - 1 if counts[ln - 1] else -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at any real marker."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            # pad with 1-bits past the end, per spec
            self.bitbuf = (self.bitbuf << 8) | 0xFF
            self.bitcnt += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync
                self.marker = nxt
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                return
            else:
                self.marker = nxt
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.bitcnt += 8

    def bit(self) -> int:
        if self.bitcnt == 0:
            self._fill()
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker; reset bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.bitbuf = 0
                self.bitcnt = 0
                self.marker = None
                return
            p += 1
        self.pos = len(d)
        self.bitbuf = 0
        self.bitcnt = 0


def _decode_huff(br: _BitReader, tbl: _HuffTable) -> int:
    code = br.bit()
    ln = 1
    while code > tbl.maxcode[ln]:
        code = (code << 1) | br.bit()
        ln += 1
        if ln > 16:
            raise ValueError("bad Huffman code")
    return tbl.values[tbl.valptr[ln] + code - tbl.mincode[ln]]


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (spec F.12)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_baseline_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """payload -> (width, height, RGB uint8 array of shape (h, w, 3)).
    Grayscale JPEGs replicate luma into all three channels."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = None
    restart_interval = 0
    pos = 2
    data = payload
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:  # 16-bit table
                    tab = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tab = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                values = seg[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(counts, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + c * 3]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tables = {}
            for s in range(ns):
                cs = seg[1 + s * 2]
                td_ta = seg[2 + s * 2]
                scan_tables[cs] = (td_ta >> 4, td_ta & 0xF)
            scan_start = pos + 2 + seglen
            return _decode_scan(
                data, scan_start, w, h, comps, qt, huff_dc, huff_ac,
                scan_tables, restart_interval,
            )
        elif marker == 0xD9:
            break
        pos += 2 + seglen
    raise ValueError("no scan data found")


def _decode_scan(data, pos, w, h, comps, qt, huff_dc, huff_ac,
                 scan_tables, restart_interval):
    if comps is None or w is None:
        raise ValueError("SOS before SOF")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # per-component coefficient planes (blocks laid out spatially)
    planes = []
    for cid, ch, cv, tq in comps:
        pw, ph = mcus_x * ch * 8, mcus_y * cv * 8
        planes.append(np.zeros((ph, pw), dtype=np.float32))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    idct_c = _C.astype(np.float32)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                dctab, actab = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(br, dctab)
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, actab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float32)
                        block[_ZIGZAG] = (zz * q).astype(np.float32)
                        block = block.reshape(8, 8)
                        pix = idct_c.T @ block @ idct_c
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # level shift + upsample to full resolution + color convert
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci] + 128.0
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, np.stack([y, y, y], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(rgb + 0.5, 0, 255).astype(np.uint8)
