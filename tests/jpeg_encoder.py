"""Minimal baseline JPEG ENCODER (test fixture generator) — stdlib +
numpy. Emits real, spec-conformant baseline sequential JPEGs:
grayscale or YCbCr 4:4:4 / 4:2:0, standard Annex K quantization and
Huffman tables, optional restart markers."""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K tables
QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K Huffman specs: (counts[16], values)
DC_L = ([0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0], list(range(12)))
DC_C = ([0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0], list(range(12)))
AC_L = (
    [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7D],
    [0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
     0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,0x23,0x42,0xB1,0xC1,0x15,0x52,
     0xD1,0xF0,0x24,0x33,0x62,0x72,0x82,0x09,0x0A,0x16,0x17,0x18,0x19,0x1A,0x25,
     0x26,0x27,0x28,0x29,0x2A,0x34,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,
     0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,
     0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x83,
     0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
     0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,
     0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,
     0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE1,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,
     0xE9,0xEA,0xF1,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA],
)
AC_C = (
    [0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,0x77],
    [0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,0x61,
     0x71,0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xA1,0xB1,0xC1,0x09,0x23,0x33,
     0x52,0xF0,0x15,0x62,0x72,0xD1,0x0A,0x16,0x24,0x34,0xE1,0x25,0xF1,0x17,0x18,
     0x19,0x1A,0x26,0x27,0x28,0x29,0x2A,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,
     0x45,0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,
     0x64,0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,
     0x82,0x83,0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,
     0x98,0x99,0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,
     0xB5,0xB6,0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,
     0xD2,0xD3,0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,
     0xE8,0xE9,0xEA,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA],
)

C = np.zeros((8, 8))
for k in range(8):
    for n in range(8):
        C[k, n] = np.cos(np.pi * k * (2 * n + 1) / 16) * (
            np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
        )


def _huff_codes(counts, values):
    codes = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[values[vi]] = (code, ln)
            vi += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)

    def raw_marker(self, b):
        self.flush()
        self.out += bytes([0xFF, b])


def _mag(v):
    """(size, code-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coeffs = C @ (block - 128.0) @ C.T
    zz = np.round(coeffs.flatten()[ZIGZAG] / q.flatten()[ZIGZAG]).astype(int)
    diff = int(zz[0]) - pred
    s, bits = _mag(diff)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        s, bits = _mag(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(bits, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


def _dqt(tq, table):
    return _seg(0xDB, bytes([tq]) + bytes(int(table.flatten()[z]) for z in ZIGZAG))


def _dht(tc, th, spec):
    counts, values = spec
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(values))


def encode_jpeg(rgb: np.ndarray, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """rgb uint8 (h, w, 3) or gray (h, w) -> baseline JPEG bytes."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, QL)
    if not gray:
        out += _dqt(1, QC)
    if gray:
        comps_sof = bytes([1, 0x11, 0])
        ncomp = 1
    elif subsampling == "444":
        comps_sof = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    elif subsampling == "420":
        comps_sof = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    else:
        raise ValueError(subsampling)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps_sof)
    out += _dht(0, 0, DC_L) + _dht(1, 0, AC_L)
    if not gray:
        out += _dht(0, 1, DC_C) + _dht(1, 1, AC_C)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xDA, sos)

    dc_l = _huff_codes(*DC_L)
    ac_l = _huff_codes(*AC_L)
    if not gray:
        dc_c = _huff_codes(*DC_C)
        ac_c = _huff_codes(*AC_C)
        r, g, b = [rgb[..., i].astype(np.float64) for i in range(3)]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    else:
        y = rgb.astype(np.float64)

    def pad(plane, bw, bh):
        ph = ((plane.shape[0] + bh - 1) // bh) * bh
        pw = ((plane.shape[1] + bw - 1) // bw) * bw
        out_p = np.empty((ph, pw))
        out_p[: plane.shape[0], : plane.shape[1]] = plane
        out_p[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out_p[:, plane.shape[1] :] = out_p[:, plane.shape[1] - 1 : plane.shape[1]]
        return out_p

    bw_ = _BitWriter()
    rst = 0
    if gray:
        yp = pad(y, 8, 8)
        preds = [0]
        mcus = [(yp, 1, 1, QL, dc_l, ac_l, 0)]
        mcu_w, mcu_h = 8, 8
    elif subsampling == "444":
        yp, cbp, crp = pad(y, 8, 8), pad(cb, 8, 8), pad(cr, 8, 8)
        preds = [0, 0, 0]
        mcus = [(yp, 1, 1, QL, dc_l, ac_l, 0), (cbp, 1, 1, QC, dc_c, ac_c, 1),
                (crp, 1, 1, QC, dc_c, ac_c, 2)]
        mcu_w, mcu_h = 8, 8
    else:  # 420
        yp = pad(y, 16, 16)
        # downsample chroma by 2x2 mean over the padded luma grid
        cbf = pad(cb, 16, 16)
        crf = pad(cr, 16, 16)
        cbs = cbf.reshape(cbf.shape[0] // 2, 2, cbf.shape[1] // 2, 2).mean(axis=(1, 3))
        crs = crf.reshape(crf.shape[0] // 2, 2, crf.shape[1] // 2, 2).mean(axis=(1, 3))
        preds = [0, 0, 0]
        mcus = [(yp, 2, 2, QL, dc_l, ac_l, 0), (cbs, 1, 1, QC, dc_c, ac_c, 1),
                (crs, 1, 1, QC, dc_c, ac_c, 2)]
        mcu_w, mcu_h = 16, 16
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and count and count % restart_interval == 0:
                bw_.raw_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                for i in range(len(preds)):
                    preds[i] = 0
            for plane, ch, cv, q, dcc, acc, pi in mcus:
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        preds[pi] = _encode_block(bw_, block, q, dcc, acc, preds[pi])
            count += 1
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — spectral selection + successive approximation
# with EOB-run and buffered-correction-bit emission per T.81 Annex G.
# ---------------------------------------------------------------------------


# Progressive AC scans emit EOBn symbols ((r<<4)|0 for r=1..14) that the
# baseline Annex K tables don't contain. A uniform 9-bit table over all
# 256 symbols (255 at 9 bits + 1 at 10 — DHT counts are bytes) is
# spec-valid (Kraft < 1; the all-ones code stays unused) and keeps the
# encoder table-complete for any scan script.
PROG_AC = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _quant_zigzag_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Padded pixel plane -> (by, bx, 64) quantized zigzag coefficients."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    qz = q.flatten()[ZIGZAG]
    for by in range(bh):
        for bx in range(bw):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeffs = C @ (block - 128.0) @ C.T
            out[by, bx] = np.round(coeffs.flatten()[ZIGZAG] / qz).astype(np.int64)
    return out


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift, truncation toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgWriter(_BitWriter):
    """BitWriter + EOB-run / buffered-correction-bit state for one scan."""

    def __init__(self, ac_codes=None):
        super().__init__()
        self.ac = ac_codes
        self.eobrun = 0
        self.corr = []  # correction bits buffered behind a pending EOB run

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, ln = self.ac[nbits << 4]
            self.put(c, ln)
            if nbits:
                self.put(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.corr:
            self.put(b, 1)
        self.corr = []


def _enc_ac_first(pw: _ProgWriter, band: np.ndarray, ss: int, se: int, al: int):
    r = 0
    for k in range(ss, se + 1):
        t = _pt_ac(int(band[k]), al)
        if t == 0:
            r += 1
            continue
        pw.emit_eobrun()
        while r > 15:
            c, ln = pw.ac[0xF0]
            pw.put(c, ln)
            r -= 16
        s, bits = _mag(t)
        c, ln = pw.ac[(r << 4) | s]
        pw.put(c, ln)
        pw.put(bits, s)
        r = 0
    if r > 0:
        pw.eobrun += 1
        if pw.eobrun == 0x7FFF:
            pw.emit_eobrun()


def _enc_ac_refine(pw: _ProgWriter, band: np.ndarray, ss: int, se: int, al: int):
    absv = [abs(int(band[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    r = 0
    pending = []  # correction bits owed to the next emitted symbol
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            pw.emit_eobrun()
            c, ln = pw.ac[0xF0]
            pw.put(c, ln)
            r -= 16
            for b in pending:
                pw.put(b, 1)
            pending = []
        if t > 1:  # previously significant: correction bit only
            pending.append(t & 1)
            continue
        pw.emit_eobrun()
        c, ln = pw.ac[(r << 4) | 1]
        pw.put(c, ln)
        pw.put(1 if int(band[ss + i]) > 0 else 0, 1)
        for b in pending:
            pw.put(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        pw.eobrun += 1
        pw.corr.extend(pending)
        if pw.eobrun == 0x7FFF or len(pw.corr) > 937:
            pw.emit_eobrun()


def encode_progressive_jpeg(rgb: np.ndarray, subsampling: str = "444") -> bytes:
    """rgb uint8 (h, w, 3) or gray (h, w) -> progressive JPEG bytes,
    using the classic multi-scan script (interleaved DC with Al=1,
    banded luma AC, chroma AC, successive-approximation refinements,
    DC refinement)."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]

    def pad(plane, bw_, bh_):
        ph = ((plane.shape[0] + bh_ - 1) // bh_) * bh_
        pw_ = ((plane.shape[1] + bw_ - 1) // bw_) * bw_
        out_p = np.empty((ph, pw_))
        out_p[: plane.shape[0], : plane.shape[1]] = plane
        out_p[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        out_p[:, plane.shape[1] :] = out_p[:, plane.shape[1] - 1 : plane.shape[1]]
        return out_p

    if gray:
        y = rgb.astype(np.float64)
        planes = [(pad(y, 8, 8), 1, 1, QL)]
    else:
        r, g, b = [rgb[..., i].astype(np.float64) for i in range(3)]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            planes = [(pad(y, 8, 8), 1, 1, QL), (pad(cb, 8, 8), 1, 1, QC),
                      (pad(cr, 8, 8), 1, 1, QC)]
        elif subsampling == "420":
            yp = pad(y, 16, 16)
            cbf, crf = pad(cb, 16, 16), pad(cr, 16, 16)
            cbs = cbf.reshape(cbf.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            crs = crf.reshape(crf.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            planes = [(yp, 2, 2, QL), (cbs, 1, 1, QC), (crs, 1, 1, QC)]
        else:
            raise ValueError(subsampling)

    coef = [_quant_zigzag_blocks(p, q) for p, _ch, _cv, q in planes]
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # actual (non-MCU-padded) per-component block dims for AC scans
    actual = []
    for _p, ch, cv, _q in planes:
        cw = (w * ch + hmax - 1) // hmax
        chh = (h * cv + vmax - 1) // vmax
        actual.append(((chh + 7) // 8, (cw + 7) // 8))

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, QL)
    if not gray:
        out += _dqt(1, QC)
    ncomp = 1 if gray else 3
    sof_comps = (bytes([1, 0x11, 0]) if gray else
                 bytes([1, (hmax << 4) | vmax, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += _dht(0, 0, DC_L) + _dht(1, 0, PROG_AC)
    if not gray:
        out += _dht(0, 1, DC_C) + _dht(1, 1, PROG_AC)

    dc_codes = [_huff_codes(*DC_L)] + ([] if gray else [_huff_codes(*DC_C)] * 2)
    ac_codes = [_huff_codes(*PROG_AC)] * 3

    def sos(scan_cis, ss, se, ah, al):
        body = bytes([len(scan_cis)])
        for ci in scan_cis:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | td])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_scan(scan_cis, ah, al):
        pw = _ProgWriter()
        dcl = _huff_codes(*DC_L)
        preds = {ci: 0 for ci in scan_cis}
        if len(scan_cis) > 1:
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in scan_cis:
                        _p, ch, cv, _q = planes[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                units.append((ci, my * cv + by, mx * ch + bx))
        else:
            ci = scan_cis[0]
            aby, abx = actual[ci]
            units = [(ci, by, bx) for by in range(aby) for bx in range(abx)]
        for ci, by, bx in units:
            v = int(coef[ci][by, bx, 0]) >> al
            if ah == 0:
                diff = v - preds[ci]
                preds[ci] = v
                s, bits = _mag(diff)
                codes = dcl if ci == 0 else dc_codes[ci]
                c, ln = codes[s]
                pw.put(c, ln)
                if s:
                    pw.put(bits, s)
            else:
                pw.put(v & 1, 1)
        pw.flush()
        return bytes(pw.out)

    def ac_scan(ci, ss, se, ah, al):
        pw = _ProgWriter(ac_codes[ci])
        aby, abx = actual[ci]
        for by in range(aby):
            for bx in range(abx):
                band = coef[ci][by, bx]
                if ah == 0:
                    _enc_ac_first(pw, band, ss, se, al)
                else:
                    _enc_ac_refine(pw, band, ss, se, al)
        pw.emit_eobrun()
        pw.flush()
        return bytes(pw.out)

    all_cis = list(range(ncomp))
    if gray:
        script = [
            ("dc", all_cis, 0, 0, 0, 1),
            ("ac", 0, 1, 63, 0, 1),
            ("dc", all_cis, 0, 0, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc", all_cis, 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", all_cis, 0, 0, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    for kind, who, ss, se, ah, al in script:
        if kind == "dc":
            out += sos(who, ss, se, ah, al)
            out += dc_scan(who, ah, al)
        else:
            out += sos([who], ss, se, ah, al)
            out += ac_scan(who, ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)
