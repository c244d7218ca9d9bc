"""Pure-numpy PNG decoder (stdlib zlib only).

Counterpart of :func:`..raster.viz.png_encode_rgb`; also used by the
multimodal image stage to decode real PNG payloads without PIL (the
reference's viz stack reads tile images back via java.awt ImageIO in
``viz/src/main/java/org/apache/sedona/viz/utils/ImageStitcher.java``).

Supports the common still-image profile: 8-bit depth, color types 0
(gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), all five scanline filters,
no interlacing. Everything else raises ``ValueError`` explicitly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering. ``raw`` is the decompressed stream
    (height * (1 + stride) bytes); returns (height, stride) uint8."""
    raw = raw.reshape(height, 1 + stride)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        f = ftypes[r]
        line = rows[r]
        if f == 0:
            rec = line
        elif f == 2:  # up
            rec = (line + prev) & 0xFF
        elif f == 1:  # sub — lane-wise cumulative sum mod 256
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) & 0xFF
        elif f == 3:  # average — serial in the left operand
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # paeth — serial
            rec = line.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[r] = rec
        prev = rec
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) or (h, w, c) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    bpp = None
    idat = []
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG truncated mid-chunk")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG truncated chunk body")
        pos += 12 + length
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("PNG IHDR length invalid")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"PNG bit depth {depth} unsupported (8 only)")
            if ctype not in _CHANNELS:
                raise ValueError(f"PNG color type {ctype} unsupported (palette needs PLTE handling)")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[ctype]
            bpp = channels
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG decompressed size mismatch")
    img = _unfilter(raw, height, stride, bpp)
    if channels == 1:
        return img.reshape(height, width)
    return img.reshape(height, width, channels)
