"""Pure-numpy GeoTIFF codec — no GDAL/rasterio dependency.

Implements the subset that covers the overwhelming majority of real
GeoTIFFs (reference surface: ``RasterConstructors.java:41-48``
RS_FromGeoTiff, ``RasterOutputs`` RS_AsGeoTiff):

* classic TIFF, both byte orders; strip AND tile layouts
* compression: none (1), deflate (8 / old-style 32946) via zlib,
  PackBits (32773); horizontal-differencing predictor (2)
* sample formats: uint/int 8/16/32, float 32/64; multi-band chunky
  (PlanarConfiguration=1) and planar (=2)
* geo referencing: ModelPixelScaleTag + ModelTiepointTag (the GDAL
  default encoding), GDAL_NODATA

The decoder flips rows so the result matches :class:`..raster.Raster`'s
row-0-at-bottom convention. The encoder writes uncompressed little-endian
strips with the same geo tags, enabling lossless round-trips.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(buf: memoryview, bo: str, off: int):
    (n,) = struct.unpack_from(bo + "H", buf, off)
    off += 2
    tags = {}
    for _ in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            raw = bytes(buf[off + 8 : off + 8 + size])
        else:
            (voff,) = struct.unpack_from(bo + "I", buf, off + 8)
            raw = bytes(buf[voff : voff + size])
        if typ == 2:
            tags[tag] = raw.rstrip(b"\0").decode("ascii", "ignore")
        elif typ in (5, 10):  # rational
            vals = struct.unpack(bo + ("II" if typ == 5 else "ii") * cnt, raw)
            tags[tag] = [vals[i] / (vals[i + 1] or 1) for i in range(0, len(vals), 2)]
        elif typ in _TYPE_FMT:
            tags[tag] = list(struct.unpack(bo + _TYPE_FMT[typ] * cnt, raw))
        off += 12
    (next_off,) = struct.unpack_from(bo + "I", buf, off)
    return tags, next_off


def _decompress(raw: bytes, compression: int, expected: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):
        return zlib.decompress(raw)
    if compression == 32773:  # PackBits
        out = bytearray()
        i = 0
        while i < len(raw) and len(out) < expected:
            n = raw[i]
            i += 1
            if n < 128:
                out += raw[i : i + n + 1]
                i += n + 1
            elif n > 128:
                out += raw[i : i + 1] * (257 - n)
                i += 1
        return bytes(out)
    raise NotImplementedError(f"TIFF compression {compression} (supported: none, deflate, PackBits)")


def decode_geotiff(blob: bytes):
    """GeoTIFF bytes -> :class:`..raster.Raster`."""
    from .raster import Raster

    buf = memoryview(blob)
    order = bytes(buf[:2])
    bo = "<" if order == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise ValueError("not a classic TIFF (BigTIFF unsupported)")
    tags, _ = _read_ifd(buf, bo, ifd_off)

    W = int(tags[256][0])
    H = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bits = tags.get(258, [8])
    bps = int(bits[0])
    compression = int(tags.get(259, [1])[0])
    fmt = int(tags.get(339, [1])[0])  # 1 uint, 2 int, 3 float
    predictor = int(tags.get(317, [1])[0])
    planar = int(tags.get(284, [1])[0])
    dt = {
        (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
        (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
        (3, 32): "f4", (3, 64): "f8",
    }.get((fmt, bps))
    if dt is None:
        raise NotImplementedError(f"sample format {fmt}/{bps} bits")
    dtype = np.dtype(bo + dt)

    n_inter = spp if planar == 1 else 1  # samples interleaved within a block
    if 322 in tags:  # tiled
        tw, th = int(tags[322][0]), int(tags[323][0])
        offsets, counts = tags[324], tags[325]
        tiles_across = (W + tw - 1) // tw
        tiles_down = (H + th - 1) // th
        per_plane = tiles_across * tiles_down
        img = np.zeros((spp, H, W), dtype=dtype.newbyteorder("="))
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            plane = ti // per_plane if planar == 2 else 0
            within = ti % per_plane if planar == 2 else ti
            ty, tx = divmod(within, tiles_across)
            raw = _decompress(bytes(buf[int(o) : int(o) + int(c)]), compression, tw * th * n_inter * dtype.itemsize)
            arr = np.frombuffer(raw, dtype=dtype, count=tw * th * n_inter).reshape(th, tw * n_inter)
            if predictor == 2:
                arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dtype) if fmt != 3 else np.cumsum(arr, axis=1).astype(dtype)
            arr = arr.reshape(th, tw, n_inter)
            y0t, x0t = ty * th, tx * tw
            hh, ww = min(th, H - y0t), min(tw, W - x0t)
            if planar == 2:
                img[plane, y0t : y0t + hh, x0t : x0t + ww] = arr[:hh, :ww, 0]
            else:
                for s in range(spp):
                    img[s, y0t : y0t + hh, x0t : x0t + ww] = arr[:hh, :ww, s]
    else:  # strips
        rps = int(tags.get(278, [H])[0])
        offsets, counts = tags[273], tags[279]
        strips_per_plane = (H + rps - 1) // rps
        img = np.zeros((spp, H, W), dtype=dtype.newbyteorder("="))
        for si, (o, c) in enumerate(zip(offsets, counts)):
            plane = si // strips_per_plane if planar == 2 else 0
            within = si % strips_per_plane if planar == 2 else si
            y0s = within * rps
            hh = min(rps, H - y0s)
            raw = _decompress(bytes(buf[int(o) : int(o) + int(c)]), compression, hh * W * n_inter * dtype.itemsize)
            arr = np.frombuffer(raw, dtype=dtype, count=hh * W * n_inter).reshape(hh, W * n_inter)
            if predictor == 2:
                arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dtype) if fmt != 3 else np.cumsum(arr, axis=1).astype(dtype)
            arr = arr.reshape(hh, W, n_inter)
            if planar == 2:
                img[plane, y0s : y0s + hh] = arr[:, :, 0]
            else:
                for s in range(spp):
                    img[s, y0s : y0s + hh] = arr[:, :, s]

    data = img.astype(np.float64)
    # geo referencing: GDAL-default PixelScale + Tiepoint
    sx = sy = 1.0
    ox = oy = 0.0
    if 33550 in tags:
        sx, sy = float(tags[33550][0]), float(tags[33550][1])
    if 33922 in tags:
        tp = tags[33922]
        i, j, x, y = float(tp[0]), float(tp[1]), float(tp[3]), float(tp[4])
        ox = x - i * sx
        oy = y + j * sy  # top-left northing
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            nodata = None
    # TIFF row 0 is the TOP; Raster's row 0 is the BOTTOM -> flip
    data = data[:, ::-1, :].copy()
    y0 = oy - H * sy
    return Raster(data, x0=ox, y0=y0, pixel_w=sx, pixel_h=sy, nodata=nodata)


def encode_geotiff(raster) -> bytes:
    """:class:`..raster.Raster` -> uncompressed little-endian strip GeoTIFF
    (float64 samples, PlanarConfiguration=2, PixelScale + Tiepoint tags);
    lossless round-trip with :func:`decode_geotiff`."""
    data = np.asarray(raster.data, dtype="<f8")
    spp, H, W = data.shape
    # back to TIFF top-down rows
    top_down = data[:, ::-1, :]
    payload = b"".join(top_down[s].tobytes() for s in range(spp))
    strip_size = H * W * 8

    entries = []  # (tag, type, count, packed_value_or_bytes)

    def val_entry(tag, typ, values):
        fmt = _TYPE_FMT[typ]
        raw = struct.pack("<" + fmt * len(values), *values)
        entries.append((tag, typ, len(values), raw))

    val_entry(256, 4, [W])
    val_entry(257, 4, [H])
    val_entry(258, 3, [64] * spp)
    val_entry(259, 3, [1])
    val_entry(262, 3, [1])
    val_entry(277, 3, [spp])
    val_entry(278, 4, [H])
    val_entry(284, 3, [2])
    val_entry(339, 3, [3] * spp)
    # strip offsets/counts: one strip per plane
    # (filled after layout below)
    val_entry(33550, 12, [float(raster.pixel_w), float(raster.pixel_h), 0.0])
    top_y = raster.y0 + H * raster.pixel_h
    val_entry(33922, 12, [0.0, 0.0, 0.0, float(raster.x0), float(top_y), 0.0])
    if raster.nodata is not None:
        nd = str(raster.nodata).encode() + b"\0"
        entries.append((42113, 2, len(nd), nd))

    # layout: header (8) + IFD + external values + strip data
    n_tags = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()

    fixed = []
    for tag, typ, cnt, raw in entries:
        if len(raw) <= 4:
            fixed.append((tag, typ, cnt, raw.ljust(4, b"\0"), None))
        else:
            fixed.append((tag, typ, cnt, None, len(ext)))
            ext += raw

    strip_tags_pos = ext_off + len(ext)
    offs_raw_pos = strip_tags_pos
    ext += struct.pack("<" + "I" * spp, *[0] * spp)  # placeholder offsets
    cnts_raw_pos = ext_off + len(ext)
    ext += struct.pack("<" + "I" * spp, *[strip_size] * spp)

    data_off = ext_off + len(ext)
    strip_offsets = [data_off + s * strip_size for s in range(spp)]
    ext[offs_raw_pos - ext_off : offs_raw_pos - ext_off + 4 * spp] = struct.pack("<" + "I" * spp, *strip_offsets)

    all_entries = []
    for tag, typ, cnt, inline, extpos in fixed:
        all_entries.append((tag, typ, cnt, inline, extpos))
    if spp == 1:
        all_entries.append((273, 4, 1, struct.pack("<I", strip_offsets[0]), None))
        all_entries.append((279, 4, 1, struct.pack("<I", strip_size), None))
    else:
        all_entries.append((273, 4, spp, None, offs_raw_pos - ext_off))
        all_entries.append((279, 4, spp, None, cnts_raw_pos - ext_off))
    all_entries.sort(key=lambda e: e[0])

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(all_entries))
    for tag, typ, cnt, inline, extpos in all_entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if inline is not None:
            out += inline
        else:
            out += struct.pack("<I", ext_off + extpos)
    out += struct.pack("<I", 0)  # no next IFD
    out += ext
    out += payload
    return bytes(out)
