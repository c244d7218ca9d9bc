"""Pure-numpy baseline JPEG codec (stdlib only).

Decoder: baseline sequential DCT (SOF0), Huffman entropy coding, 8-bit
samples, grayscale or YCbCr with any sampling factors (4:4:4 / 4:2:2 /
4:2:0), restart markers. Progressive (SOF2) and arithmetic coding raise
``ValueError`` explicitly.

Encoder: baseline SOF0 with the ITU-T T.81 Annex K example quantization
and Huffman tables, quality scaling per the common IJG formula, optional
4:2:0 chroma subsampling.

Written from the public ITU-T T.81 specification; exists so the
multimodal ``DecodeImage`` stage can decode real JPEG payloads without
PIL/libjpeg (the same motivation as the pure-numpy GeoTIFF codec in
``raster/geotiff.py``). Entropy decode is a Python bit loop — fine for
thumbnail-scale payloads; batch-size the actor stage accordingly.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K example tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K Huffman tables: (bits[1..16], huffval)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
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
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: T @ block @ T.T == DCT, T.T @ coef @ T == IDCT
_T = np.zeros((8, 8))
for _u in range(8):
    c = math.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * c * math.cos((2 * _x + 1) * _u * math.pi / 16.0)


def _build_huff_codes(bits, huffval):
    """Canonical Huffman code assignment (T.81 Annex C). Returns
    symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huff_decode(bits, huffval):
    """(length, code) -> symbol for the decoder."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing and restart-marker awareness."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self):
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("JPEG entropy data truncated")
        byte = d[p]
        p += 1
        if byte == 0xFF:
            if p < len(d) and d[p] == 0x00:
                p += 1  # stuffed zero
            else:
                # real marker (RSTn/EOI) reached: per spec the segment is
                # padded with 1-bits; do NOT advance past the marker —
                # align_restart scans from here. A corrupted stream cannot
                # loop: huffman decode reads <=16 bits then errors.
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                return
        self.bitbuf = (self.bitbuf << 8) | byte
        self.bitcnt += 8
        self.pos = p

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            self._fill()
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self, n: int):
        """Byte-align and consume the expected RSTn marker."""
        self.bitbuf = 0
        self.bitcnt = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("JPEG restart marker missing")
        if d[p + 1] != 0xD0 + (n & 7):
            raise ValueError("JPEG restart marker out of order")
        self.pos = p + 2


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


def _decode_huff(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w) gray or (h, w, 3) RGB uint8."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                q = np.zeros(64)
                q[ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(body[i + 17 : i + 17 + n])
                i += 17 + n
                tbl = _build_huff_decode(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(f"JPEG precision {precision} unsupported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0/1) is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tables = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"cs": cs, "td": tables >> 4, "ta": tables & 0xF})
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("JPEG has no scan (SOS)")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    if frame is None:
        raise ValueError("JPEG scan before frame header")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = []
    for s in scan:
        c = by_id[s["cs"]]
        order.append((c, huff_dc[s["td"]], huff_ac[s["ta"]]))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64) for c in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    tt = _T
    n_mcu = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.align_restart(rst_idx)
                rst_idx = (rst_idx + 1) & 7
                preds = [0] * len(comps)
            for ci, (c, dct, act) in enumerate(order):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        s = _decode_huff(reader, dct)
                        diff = _extend(reader.receive(s), s) if s else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[k] = _extend(reader.receive(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = coef
                        px = tt.T @ (block.reshape(8, 8) * q) @ tt + 128.0
                        py0 = (my * c["v"] + by) * 8
                        px0 = (mx * c["h"] + bx) * 8
                        planes[ci][py0 : py0 + 8, px0 : px0 + 8] = px
            n_mcu += 1
    # upsample to full resolution and crop
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - quality * 2
    out = np.floor((tbl * scale + 50) / 100)
    return np.clip(out, 1, 255)


class _BitWriter:
    __slots__ = ("buf", "acc", "cnt")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.cnt += length
        while self.cnt >= 8:
            self.cnt -= 8
            byte = (self.acc >> self.cnt) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)

def _encode_block(bw: _BitWriter, coef_z: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    dc = int(coef_z[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bits = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(bits, s)
    # AC
    run = 0
    last_nz = 0
    nz = np.nonzero(coef_z[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coef_z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bits = v if v >= 0 else v + (1 << s) - 1
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (n_blocks, 64) zigzag-scanned
    quantized int coefficients (row-major block order), vectorized."""
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,ijxy,vy->ijuv", _T, blocks, _T)
    qz = np.round(coef / q).astype(np.int64)
    return qz.reshape(-1, 64)[:, ZIGZAG]


def jpeg_encode(img: np.ndarray, quality: int = 85, subsample: bool = True) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JFIF bytes."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    gray = ch == 1
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    px = img.astype(np.float64)
    if gray:
        planes = [px[:, :, 0]]
        samp = [(1, 1)]
        qs = [ql]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qs = [ql, qc, qc]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad + (for subsampled components) box-average downsample
    comp_blocks = []
    for (sh, sv), plane, q in zip(samp, planes, qs):
        tw, th = mcux * sh * 8, mcuy * sv * 8
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            ph, pw = mcuy * vmax * 8, mcux * hmax * 8
            padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = padded.reshape(th, fy, tw, fx).mean(axis=(1, 3))
        else:
            plane = np.pad(plane, ((0, th - h), (0, tw - w)), mode="edge")
        comp_blocks.append(_fdct_quant(plane - 128.0, q))

    dc_tabs = [DC_LUMA] + ([DC_CHROMA] if not gray else [])
    ac_tabs = [AC_LUMA] + ([AC_CHROMA] if not gray else [])
    dc_codes = [_build_huff_codes(*t) for t in dc_tabs]
    ac_codes = [_build_huff_codes(*t) for t in ac_tabs]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    zl = np.zeros(64, dtype=np.uint8)
    zl[np.arange(64)] = ql.ravel()[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(zl)
    if not gray:
        zc = np.zeros(64, dtype=np.uint8)
        zc[np.arange(64)] = qc.ravel()[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x01]) + bytes(zc)
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th, (bits, huffval) in enumerate(tabs):
            seg = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
            out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else min(1, len(dc_codes) - 1)
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                ti = 0 if ci == 0 else min(1, len(dc_codes) - 1)
                bpr = mcux * sh  # blocks per row for this component
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bpr + (mx * sh + bx)
                        preds[ci] = _encode_block(
                            bw, comp_blocks[ci][bi], preds[ci], dc_codes[ti], ac_codes[ti]
                        )
    # pad final byte with 1-bits
    if bw.cnt:
        bw.write((1 << (8 - bw.cnt)) - 1, 8 - bw.cnt)
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
