"""Pure-Python/numpy JPEG pixel decoder — stdlib + numpy only.

Decodes baseline sequential (SOF0/1) AND progressive (SOF2) DCT
JPEGs: DQT / DHT / SOF / SOS / DRI segments, Huffman entropy decode,
dequantization, 8x8 inverse DCT (vectorized numpy, orthonormal
DCT-III via matrix multiply), chroma upsampling for 4:4:4 / 4:2:2 /
4:2:0, YCbCr -> RGB. Progressive decode follows ITU T.81 Annex G:
per-component coefficient accumulation across scans with spectral
selection (Ss..Se bands) and successive approximation (DC bit
refinement, AC significance + correction-bit refinement, EOB runs).
Arithmetic coding, hierarchical, and 12-bit precision raise —
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


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """payload -> (width, height, RGB uint8 array of shape (h, w, 3)).
    Baseline sequential and progressive. Grayscale JPEGs replicate
    luma into all three channels."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = None
    restart_interval = 0
    progressive = False
    coef = None  # progressive: per-comp (pby, pbx, 64) zigzag coefficients
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + c * 3]))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG (lossless/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for s in range(ns):
                cs = seg[1 + s * 2]
                td_ta = seg[2 + s * 2]
                scan_comps.append((cs, td_ta >> 4, td_ta & 0xF))
            scan_start = pos + 2 + seglen
            if not progressive:
                return _decode_scan(
                    data, scan_start, w, h, comps,
                    qt, huff_dc, huff_ac,
                    {cs: (td, ta) for cs, td, ta in scan_comps},
                    restart_interval,
                )
            if comps is None:
                raise ValueError("SOS before SOF")
            if coef is None:
                coef = _alloc_coef(w, h, comps)
            ss, se, ah_al = seg[1 + ns * 2], seg[2 + ns * 2], seg[3 + ns * 2]
            pos = _progressive_scan(
                data, scan_start, w, h, comps, coef, huff_dc, huff_ac,
                scan_comps, ss, se, ah_al >> 4, ah_al & 0xF,
                restart_interval,
            )
            continue
        elif marker == 0xD9:
            break
        pos += 2 + seglen
    if progressive and coef is not None:
        return _finish_progressive(w, h, comps, coef, qt)
    raise ValueError("no scan data found")


# the historical name (pre-progressive support) — same full decoder
decode_baseline_jpeg = decode_jpeg


def _decode_scan(data, pos, w, h, comps, qt, huff_dc, huff_ac,
                 scan_tables, restart_interval):
    if comps is None or w is None:
        raise ValueError("SOS before SOF")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # Per-component zigzag coefficient store; the pixel stage is shared
    # with the progressive path (_finish_progressive) so identical
    # coefficients are guaranteed to produce bit-identical pixels —
    # separate per-block vs batched IDCT float orderings once flipped a
    # +0.5 rounding boundary between the two decoders.
    coef = _alloc_coef(w, h, comps)
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                dctab, actab = huff_dc[td], huff_ac[ta]
                for by in range(cv):
                    for bx in range(ch):
                        zz = coef[ci][my * cv + by, mx * ch + bx]
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
            mcu_count += 1
    return _finish_progressive(w, h, comps, coef, qt)


def _planes_to_rgb(planes, comps, hmax, vmax, w, h):
    """Level shift + upsample subsampled chroma to full resolution +
    YCbCr->RGB (shared by the sequential and progressive paths)."""
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


def _geometry(w, h, comps):
    """(hmax, vmax, mcus_x, mcus_y, per-comp padded/actual block dims).
    Interleaved scans cover MCU-padded block grids; non-interleaved
    progressive scans cover only each component's ACTUAL block grid."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    dims = []
    for cid, ch, cv, tq in comps:
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        dims.append({
            "pbx": mcus_x * ch, "pby": mcus_y * cv,
            "abx": (cw + 7) // 8, "aby": (chh + 7) // 8,
        })
    return hmax, vmax, mcus_x, mcus_y, dims


def _alloc_coef(w, h, comps):
    """Per-component zigzag coefficient store for progressive decode,
    sized to the MCU-padded block grid."""
    _hmax, _vmax, _mx, _my, dims = _geometry(w, h, comps)
    return [
        np.zeros((d["pby"], d["pbx"], 64), dtype=np.int32) for d in dims
    ]


def _progressive_scan(data, pos, w, h, comps, coef, huff_dc, huff_ac,
                      scan_comps, ss, se, ah, al, restart_interval):
    """One progressive SOS (T.81 G.1.2): DC first/refine scans may be
    interleaved over MCUs; AC scans are single-component over the
    component's own block raster. Returns the stream position of the
    next marker."""
    hmax, vmax, mcus_x, mcus_y, dims = _geometry(w, h, comps)
    comp_idx = {c[0]: i for i, c in enumerate(comps)}
    br = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = [0] * len(comps)

    def restart():
        br.sync_restart()
        state["eobrun"] = 0
        for i in range(len(pred)):
            pred[i] = 0

    if ss == 0:  # DC scan (interleaved if ns > 1)
        if len(scan_comps) > 1:
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for cs, td, _ta in scan_comps:
                        ci = comp_idx[cs]
                        _cid, ch, cv, _tq = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                blocks.append(
                                    (ci, td, my * cv + by, mx * ch + bx)
                                )
                    units.append(blocks)
        else:
            cs, td, _ta = scan_comps[0]
            ci = comp_idx[cs]
            d = dims[ci]
            units = [
                [(ci, td, by, bx)]
                for by in range(d["aby"])
                for bx in range(d["abx"])
            ]
        for n, blocks in enumerate(units):
            if restart_interval and n and n % restart_interval == 0:
                restart()
            for ci, td, by, bx in blocks:
                c = coef[ci][by, bx]
                if ah == 0:  # first DC scan: diff accumulation << Al
                    t = _decode_huff(br, huff_dc[td])
                    pred[ci] += _extend(br.bits(t), t) if t else 0
                    c[0] = pred[ci] << al
                else:  # refinement: one bit per block
                    if br.bit():
                        c[0] |= 1 << al
        return _next_marker_pos(data, br.pos)

    # AC scan: spec requires exactly one component
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    cs, _td, ta = scan_comps[0]
    ci = comp_idx[cs]
    actab = huff_ac[ta]
    d = dims[ci]
    n = 0
    for by in range(d["aby"]):
        for bx in range(d["abx"]):
            if restart_interval and n and n % restart_interval == 0:
                restart()
            n += 1
            c = coef[ci][by, bx]
            if ah == 0:
                _ac_first_block(br, actab, c, ss, se, al, state)
            else:
                _ac_refine_block(br, actab, c, ss, se, al, state)
    return _next_marker_pos(data, br.pos)


def _ac_first_block(br, actab, c, ss, se, al, state):
    """First AC scan for a band (G.1.2.2): zero runs, EOB runs, new
    coefficients at magnitude << Al."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, actab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.bits(r)
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC index past band end")
            c[k] = _extend(br.bits(s), s) << al
            k += 1


def _ac_refine_block(br, actab, c, ss, se, al, state):
    """AC refinement scan (G.1.2.3): already-nonzero coefficients take
    correction bits; zero-history runs position newly significant
    ±1<<Al coefficients; EOB runs correct the rest of the band."""
    bit = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(br, actab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:  # EOB run: correct the remainder, then done
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.bits(r)
                    r = 64  # run past band end -> pure correction sweep
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                val = bit if br.bit() else -bit
            while k <= se:
                if c[k] != 0:
                    if br.bit() and not (c[k] & bit):
                        c[k] += bit if c[k] > 0 else -bit
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                c[k] = val
            k += 1
    else:
        state["eobrun"] -= 1
        while k <= se:  # EOB-run block: corrections only
            if c[k] != 0 and br.bit() and not (c[k] & bit):
                c[k] += bit if c[k] > 0 else -bit
            k += 1


def _next_marker_pos(data, pos):
    """Skip any remaining entropy bytes/RSTs to the next real marker."""
    p = pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(data)


def _finish_progressive(w, h, comps, coef, qt):
    """All scans applied: dequantize, un-zigzag, batched IDCT, place
    blocks, upsample + color convert."""
    hmax, vmax, _mx, _my, dims = _geometry(w, h, comps)
    idct_c = _C.astype(np.float32)
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        d = dims[ci]
        q = qt[tq].astype(np.float32)
        deq = coef[ci].astype(np.float32) * q  # (pby, pbx, 64) zigzag
        nat = np.zeros_like(deq)
        nat[:, :, _ZIGZAG] = deq  # scatter into natural order
        blocks = nat.reshape(d["pby"], d["pbx"], 8, 8)
        pix = np.einsum("ki,ABkl,lj->ABij", idct_c, blocks, idct_c)
        plane = pix.transpose(0, 2, 1, 3).reshape(d["pby"] * 8, d["pbx"] * 8)
        planes.append(plane)
    return _planes_to_rgb(planes, comps, hmax, vmax, w, h)
