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


def boxes_to_wkb(x0, y0, x1, y1) -> np.ndarray:
    """Vectorized axis-aligned boxes -> object array of 93-byte WKB
    polygons (one CCW closed 5-point ring), zero Python per-row math."""
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    n = len(x0)
    rec = np.zeros(
        n,
        dtype=[("bo", "u1"), ("typ", "<u4"), ("nr", "<u4"), ("np", "<u4"), ("c", "<f8", (5, 2))],
    )
    rec["bo"] = 1
    rec["typ"] = 3
    rec["nr"] = 1
    rec["np"] = 5
    c = rec["c"]
    c[:, 0, 0] = x0; c[:, 0, 1] = y0
    c[:, 1, 0] = x1; c[:, 1, 1] = y0
    c[:, 2, 0] = x1; c[:, 2, 1] = y1
    c[:, 3, 0] = x0; c[:, 3, 1] = y1
    c[:, 4, 0] = x0; c[:, 4, 1] = y0
    raw = rec.tobytes()
    assert rec.dtype.itemsize == 93
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = raw[i * 93 : (i + 1) * 93]
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

class LazyBlobs:
    """Lazy stand-in for ``tbl[col].to_pylist()`` in join side dicts: the
    batch kernels consume the ARROW column zero-copy via
    :func:`_flat_wkb_buffer` (which unwraps ``arrow_col``); the Python
    blob list is built only if an exotic-row fallback actually iterates
    it, and single-row fallback access reads one arrow scalar without
    materializing the list (VERDICT r02 #4 — no per-batch ``to_pylist``
    churn when every row takes a vectorized fast path)."""

    __slots__ = ("arrow_col", "_list")

    def __init__(self, arrow_col):
        self.arrow_col = arrow_col
        self._list = None

    def __len__(self):
        return len(self.arrow_col)

    def __getitem__(self, i):
        if self._list is not None:
            return self._list[i]
        return self.arrow_col[i].as_py()

    def __iter__(self):
        if self._list is None:
            self._list = self.arrow_col.to_pylist()
        return iter(self._list)

    @property
    def materialized(self) -> bool:
        return self._list is not None


def _flat_wkb_buffer(wkb_col):
    """Binary column -> (u8 buffer, int64 starts, int64 lens).

    Zero-copy for arrow Binary/LargeBinary arrays (reads the value and
    offset buffers directly); one concatenation copy for python lists.
    Returns None when the column has nulls or an unexpected layout (the
    caller then walks rows one by one)."""
    wkb_col = getattr(wkb_col, "arrow_col", wkb_col)
    try:
        import pyarrow as pa
    except ImportError:  # pragma: no cover
        pa = None
    if pa is not None and isinstance(wkb_col, pa.ChunkedArray):
        wkb_col = wkb_col.combine_chunks()
    if pa is not None and isinstance(wkb_col, pa.Array):
        if wkb_col.null_count:
            return None
        t = wkb_col.type
        if pa.types.is_binary(t) or pa.types.is_string(t):
            odt = np.int32
        elif pa.types.is_large_binary(t) or pa.types.is_large_string(t):
            odt = np.int64
        else:
            return None
        bufs = wkb_col.buffers()
        offsets = np.frombuffer(bufs[1], dtype=odt)[
            wkb_col.offset : wkb_col.offset + len(wkb_col) + 1
        ].astype(np.int64)
        u8 = np.frombuffer(bufs[2], dtype=np.uint8)
        return u8, offsets[:-1], np.diff(offsets)
    vals = list(wkb_col)
    if not all(isinstance(b, (bytes, bytearray)) for b in vals):
        return None
    lens = np.fromiter((len(b) for b in vals), dtype=np.int64, count=len(vals))
    ends = np.cumsum(lens)
    return np.frombuffer(b"".join(vals), dtype=np.uint8), ends - lens, lens


def _gather_bytes(u8: np.ndarray, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """One fancy-indexed gather of per-row byte ranges into a fresh
    contiguous u8 array (so the caller can .view() any dtype aligned).

    Index arithmetic is one repeat of the combined (src - dst) shift plus
    one arange, in int32 whenever the buffer allows — the index array is
    the dominant memory cost (bytes gathered x 4-8), so narrowing it
    matters more than the gather itself."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    out_starts = ends - counts
    dt = np.int32 if len(u8) < 2**31 - 1 and total < 2**31 - 1 else np.int64
    shift = (starts - out_starts).astype(dt, copy=False)
    idx = np.arange(total, dtype=dt)
    idx += np.repeat(shift, counts)
    return u8[idx]


def _read_u32_at(u8: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized little-endian u32 read at each byte offset in ``pos``."""
    idx = (pos[:, None] + np.arange(4, dtype=np.int64)[None, :]).ravel()
    return u8[idx].copy().view("<u4").astype(np.int64)


def _ring_peel_envelopes(u8, pos, nrings, out, rows):
    """Accumulate min/max over ``nrings[i]`` consecutive WKB linearrings
    starting at byte offset ``pos[i]``; vectorized per ring LEVEL (one
    gather + reduceat per level), not per row. Writes into out[rows].
    Returns False (caller falls back to the scalar walk) when a ring has
    0 points (reduceat cannot express empty groups)."""
    minx = np.full(len(pos), np.inf)
    miny = np.full(len(pos), np.inf)
    maxx = np.full(len(pos), -np.inf)
    maxy = np.full(len(pos), -np.inf)
    pos = pos.copy()
    left = nrings.astype(np.int64).copy()
    active = left > 0
    while active.any():
        cur = pos[active]
        npts = _read_u32_at(u8, cur)
        if (npts == 0).any():
            return False
        xy = _gather_bytes(u8, cur + 4, npts * 16).view("<f8").reshape(-1, 2)
        cuts = np.cumsum(npts)[:-1]
        bounds = np.concatenate([[0], cuts])
        mnx = np.minimum.reduceat(xy[:, 0], bounds)
        mny = np.minimum.reduceat(xy[:, 1], bounds)
        mxx = np.maximum.reduceat(xy[:, 0], bounds)
        mxy = np.maximum.reduceat(xy[:, 1], bounds)
        minx[active] = np.minimum(minx[active], mnx)
        miny[active] = np.minimum(miny[active], mny)
        maxx[active] = np.maximum(maxx[active], mxx)
        maxy[active] = np.maximum(maxy[active], mxy)
        pos[active] = cur + 4 + npts * 16
        left[active] -= 1
        active = left > 0
    out[rows, 0] = minx
    out[rows, 1] = miny
    out[rows, 2] = maxx
    out[rows, 3] = maxy
    return True


_EMPTY_RINGS = (
    np.zeros(0, dtype=bool),
    np.empty((0, 2), dtype=np.float64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


def polygon_rings_from_wkb(wkb_col):
    """Batch-extract every ring of plain little-endian 2D POLYGON and
    MULTIPOLYGON rows.

    Returns ``(handled, xy, ring_row, ring_counts, part_row, part_first)``:

    * ``handled`` — bool mask of rows fully extractable here (LE WKB type
      3/6, >= 1 ring per part, no empty rings; others must go through the
      scalar path);
    * ``xy`` — (N, 2) float64 of all ring coordinates, concatenated in
      (row, part, ring) order — a row's vertices are one contiguous slice;
    * ``ring_row`` / ``ring_counts`` — int64 row index and point count per
      ring, in the same order;
    * ``part_row`` / ``part_first`` — per polygon PART: its row index and
      the ``xy`` offset of its first (exterior-ring) vertex — one
      representative interior-side probe point per part.

    One u32 gather + one coordinate gather per nesting level, no per-row
    Python. Used by the vectorized polygon-x-polygon join refine — the
    role JTS geometry accessors play inside the reference's judgement
    kernels (``core/.../judgement/JudgementBase.java``,
    ``common/.../Predicates.java:19-52``), done batch-at-a-time here."""
    flat = _flat_wkb_buffer(wkb_col)
    if flat is None:
        n = len(list(wkb_col))
        return (np.zeros(n, dtype=bool),) + _EMPTY_RINGS[1:]
    u8, starts, lens = flat
    n = len(starts)
    handled = np.zeros(n, dtype=bool)
    e_row, e_part, e_ring, e_start, e_count = [], [], [], [], []

    def peel_rings(row_ids, pos0, nr, part_ids, bad_l):
        """Emit ring entries for ``nr[i]`` rings at ``pos0[i]``; marks
        ``bad_l`` on empty rings; returns end positions."""
        pos = pos0.copy()
        left = nr.astype(np.int64).copy()
        lvl = 0
        act = (left > 0) & ~bad_l
        while act.any():
            ai = np.nonzero(act)[0]
            cur = pos[ai]
            npts = _read_u32_at(u8, cur)
            z = npts == 0
            if z.any():
                bad_l[ai[z]] = True
                ai, cur, npts = ai[~z], cur[~z], npts[~z]
            if len(ai):
                e_row.append(row_ids[ai])
                e_part.append(part_ids[ai])
                e_ring.append(np.full(len(ai), lvl, dtype=np.int64))
                e_start.append(cur + 4)
                e_count.append(npts)
                pos[ai] = cur + 4 + npts * 16
                left[ai] -= 1
            lvl += 1
            act = (left > 0) & ~bad_l
        return pos

    rows = np.nonzero(lens >= 9)[0]
    if len(rows):
        rows = rows[u8[starts[rows]] == 1]
    if len(rows):
        raw = _read_u32_at(u8, starts[rows] + 1)
        polys = rows[raw == 3]
        multis = rows[raw == 6]
    else:
        polys = multis = np.empty(0, dtype=np.int64)

    bad_rows = []
    ok_rows = []
    if len(polys):
        nr3 = _read_u32_at(u8, starts[polys] + 5)
        bad3 = nr3 == 0
        peel_rings(polys, starts[polys] + 9, np.where(bad3, 0, nr3), np.zeros(len(polys), dtype=np.int64), bad3)
        bad_rows.append(polys[bad3])
        ok_rows.append(polys[~bad3])
    if len(multis):
        bad6 = np.zeros(len(multis), dtype=bool)
        nparts = _read_u32_at(u8, starts[multis] + 5)
        bad6 |= nparts == 0
        pos = starts[multis] + 9
        pleft = np.where(bad6, 0, nparts)
        pctr = np.zeros(len(multis), dtype=np.int64)
        act = pleft > 0
        while act.any():
            ai = np.nonzero(act)[0]
            cur = pos[ai]
            ok_hdr = u8[cur] == 1
            ptyp = np.full(len(ai), -1, dtype=np.int64)
            if ok_hdr.any():
                ptyp[ok_hdr] = _read_u32_at(u8, cur[ok_hdr] + 1)
            badp = ptyp != 3
            if badp.any():
                bad6[ai[badp]] = True
                ai, cur = ai[~badp], cur[~badp]
            if len(ai):
                nr = _read_u32_at(u8, cur + 5)
                z = nr == 0
                if z.any():
                    bad6[ai[z]] = True
                    ai, cur, nr = ai[~z], cur[~z], nr[~z]
            if len(ai):
                sub_bad = np.zeros(len(ai), dtype=bool)
                endpos = peel_rings(multis[ai], cur + 9, nr, pctr[ai], sub_bad)
                bad6[ai[sub_bad]] = True
                pos[ai] = endpos
                pctr[ai] += 1
                pleft[ai] -= 1
            act = (pleft > 0) & ~bad6
        bad_rows.append(multis[bad6])
        ok_rows.append(multis[~bad6])

    if not e_row:
        return (handled,) + _EMPTY_RINGS[1:]
    row = np.concatenate(e_row)
    part = np.concatenate(e_part)
    ring = np.concatenate(e_ring)
    rstart = np.concatenate(e_start)
    rcount = np.concatenate(e_count)
    good = np.concatenate(ok_rows) if ok_rows else np.empty(0, dtype=np.int64)
    bad = np.concatenate(bad_rows) if bad_rows else np.empty(0, dtype=np.int64)
    if len(bad):
        keep = ~np.isin(row, bad)
        row, part, ring, rstart, rcount = row[keep], part[keep], ring[keep], rstart[keep], rcount[keep]
    if len(row) == 0:
        return (handled,) + _EMPTY_RINGS[1:]
    order = np.lexsort((ring, part, row))
    row, part, ring, rstart, rcount = row[order], part[order], ring[order], rstart[order], rcount[order]
    xy = _gather_bytes(u8, rstart, rcount * 16).view("<f8").reshape(-1, 2)
    voff = np.cumsum(rcount) - rcount
    first = ring == 0
    handled[good] = True
    return (
        handled,
        xy,
        row.astype(np.int64),
        rcount.astype(np.int64),
        row[first].astype(np.int64),
        voff[first].astype(np.int64),
    )


def kinds_from_wkb(wkb_col) -> np.ndarray:
    """Vectorized geometry base type code per row (1=Point .. 7=Collection;
    -1 for null/empty values). Handles both endiannesses and strips
    EWKB/ISO Z/M/SRID flags — one u32 gather instead of a per-row loop."""
    flat = _flat_wkb_buffer(wkb_col)
    if flat is not None:
        u8, starts, lens = flat
        n = len(starts)
        out = np.full(n, -1, dtype=np.int64)
        ok = lens >= 5
        if ok.any():
            raw = _read_u32_at(u8, starts[ok] + 1)
            be = u8[starts[ok]] != 1
            if be.any():
                raw[be] = raw[be].astype(np.uint32).byteswap().astype(np.int64)
            out[ok] = (raw & 0x0FFFFFFF) % 1000
        return out
    vals = list(wkb_col)
    out = np.full(len(vals), -1, dtype=np.int64)
    for i, b in enumerate(vals):
        if b is not None and len(b) >= 5:
            (code,) = struct.unpack_from("<I" if b[0] == 1 else ">I", b, 1)
            out[i] = (code & 0x0FFFFFFF) % 1000
    return out


def envelopes_from_wkb(wkb_col) -> np.ndarray:
    """WKB column -> (n, 4) array of (minx, miny, maxx, maxy).

    Fully vectorized for the common little-endian 2D Point / LineString /
    Polygon / MultiPolygon cases: the column's value buffer is read
    zero-copy (arrow) or joined once (lists), then each geometry class is
    handled with one gather + ``reduceat`` per ring nesting level — no
    Python per-row work. Exotic rows (big-endian, Z/M, SRID flags,
    GeometryCollection, Multi* of mixed parts) fall back per row to
    :func:`_env_scan`, a structure walk that still never builds Geometry
    objects."""
    flat = _flat_wkb_buffer(wkb_col)
    if flat is None:
        vals = list(wkb_col)
        out = np.empty((len(vals), 4), dtype=np.float64)
        for i, b in enumerate(vals):
            out[i, 0], out[i, 1], out[i, 2], out[i, 3], _ = _env_scan(memoryview(b), 0)
        return out
    u8, starts, lens = flat
    n = len(starts)
    out = np.empty((n, 4), dtype=np.float64)
    if n == 0:
        return out
    le = u8[starts] == 1
    raw_type = np.full(n, -1, dtype=np.int64)
    if le.any():
        raw_type[le] = _read_u32_at(u8, starts[le] + 1)
    handled = np.zeros(n, dtype=bool)

    m = le & (raw_type == 1) & (lens == 21)  # Point
    if m.any():
        xy = _gather_bytes(u8, starts[m] + 5, np.full(int(m.sum()), 16, dtype=np.int64))
        xy = xy.view("<f8").reshape(-1, 2)
        out[m, 0] = out[m, 2] = xy[:, 0]
        out[m, 1] = out[m, 3] = xy[:, 1]
        handled |= m

    m = le & (raw_type == 2)  # LineString = one coordinate block
    if m.any():
        rows = np.nonzero(m)[0]
        if _ring_peel_envelopes(u8, starts[rows] + 5, np.full(len(rows), 1), out, rows):
            handled |= m

    m = le & (raw_type == 3)  # Polygon: nrings blocks
    if m.any():
        rows = np.nonzero(m)[0]
        nr = _read_u32_at(u8, starts[rows] + 5)
        ok = nr > 0
        rows = rows[ok]
        if len(rows) and _ring_peel_envelopes(u8, starts[rows] + 9, nr[ok], out, rows):
            handled[rows] = True

    m = le & (raw_type == 6) & ~handled  # MultiPolygon of plain LE polygons
    if m.any():
        rows = np.nonzero(m)[0]
        nparts = _read_u32_at(u8, starts[rows] + 5)
        # peel one POLYGON part per iteration; each part contributes its
        # rings via the same ring-level peel
        sub = np.empty((len(rows), 4), dtype=np.float64)
        sub[:, :2] = np.inf
        sub[:, 2:] = -np.inf
        pos = starts[rows] + 9
        left = nparts.copy()
        good = np.ones(len(rows), dtype=bool)
        active = (left > 0) & good
        while active.any():
            cur = pos[active]
            hdr_le = u8[cur] == 1
            ptyp = np.full(len(cur), -1, dtype=np.int64)
            if hdr_le.any():
                ptyp[hdr_le] = _read_u32_at(u8, cur[hdr_le] + 1)
            bad = ptyp != 3
            if bad.any():
                gi = np.nonzero(active)[0]
                good[gi[bad]] = False
                active = (left > 0) & good
                if not active.any():
                    break
                cur = pos[active]
            nr = _read_u32_at(u8, cur + 5)
            if (nr == 0).any():
                gi = np.nonzero(active)[0]
                good[gi[nr == 0]] = False
                active = (left > 0) & good
                continue
            tmp = np.empty((len(cur), 4), dtype=np.float64)
            if not _ring_peel_envelopes(u8, cur + 9, nr, tmp, np.arange(len(cur))):
                gi = np.nonzero(active)[0]
                good[gi] = False
                break
            ai = np.nonzero(active)[0]
            sub[ai, 0] = np.minimum(sub[ai, 0], tmp[:, 0])
            sub[ai, 1] = np.minimum(sub[ai, 1], tmp[:, 1])
            sub[ai, 2] = np.maximum(sub[ai, 2], tmp[:, 2])
            sub[ai, 3] = np.maximum(sub[ai, 3], tmp[:, 3])
            # advance past this polygon part: 9-byte header + rings
            rpos = cur + 9
            rleft = nr.copy()
            ract = rleft > 0
            while ract.any():
                rp = rpos[ract]
                npts = _read_u32_at(u8, rp)
                rpos[ract] = rp + 4 + npts * 16
                rleft[ract] -= 1
                ract = rleft > 0
            pos[active] = rpos
            left[active] -= 1
            active = (left > 0) & good
        done = good & (nparts > 0)
        out[rows[done]] = sub[done]
        handled[rows[done]] = True

    rest = np.nonzero(~handled)[0]
    for i in rest:
        mv = memoryview(u8[starts[i] : starts[i] + lens[i]].tobytes())
        out[i, 0], out[i, 1], out[i, 2], out[i, 3], _ = _env_scan(mv, 0)
    return out


def collection_parts_wkb(blob: bytes) -> list[bytes]:
    """Standalone WKB blobs of a GeometryCollection's parts, with NESTED
    collections flattened (Multi* children stay whole — the join kernel's
    fast paths handle kinds 1-6 directly). A non-collection blob returns
    ``[blob]``. One structure walk per row — called once per distinct
    collection row per batch by the vectorized join refine, never per
    pair."""
    mv = memoryview(blob)
    out: list[bytes] = []

    def walk(off: int) -> int:
        bo = "<" if mv[off] == 1 else ">"
        (raw,) = struct.unpack_from(bo + "I", mv, off + 1)
        if (raw & 0x0FFFFFFF) % 1000 == 7:
            pos = off + 5
            if raw & _EWKB_SRID:
                pos += 4
            (nparts,) = struct.unpack_from(bo + "I", mv, pos)
            pos += 4
            for _ in range(nparts):
                pos = walk(pos)
            return pos
        end = _env_scan(mv, off)[4]
        out.append(bytes(mv[off:end]))
        return end

    walk(0)
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
