"""S2 cell ids, pure numpy.

Implements the public S2 geometry cell-id scheme (s2geometry.io; the same
scheme the reference uses via the Java S2 library in
``common/.../utils/S2Utils.java:69-96`` for ``ST_S2CellIDs``):

* lat/lng -> unit-sphere XYZ -> cube face + (u, v)
* quadratic UV->ST projection
* ST -> 30-bit (i, j) leaf coordinates
* face + (i, j) -> 64-bit cell id along the face's Hilbert curve
  (4-bits-at-a-time lookup-table algorithm, ported from the public
  s2geometry ``S2CellId::FromFaceIJ``)

Everything is vectorized over point arrays. ``cells_for_points`` mirrors
``S2Utils.coordinateToCellID`` + ``roundCellsToSameLevel`` semantics:
points get the single level-``L`` ancestor cell.

Polygon coverings (``cover_geometry``) produce the exact set of level-L
cells whose closed region intersects the geometry, found by recursive
subdivision from the 6 faces with envelope pruning — equivalent to a
fixed-level S2RegionCoverer (`roundCellsToSameLevel` normalizes to uniform
level in the reference too).
"""

from __future__ import annotations

import numpy as np

from ..geom.core import Geometry, GeometryType
from ..geom import predicates as P

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2

_POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK)
_POS_TO_IJ = (
    (0, 1, 3, 2),
    (0, 2, 3, 1),
    (3, 2, 0, 1),
    (3, 1, 0, 2),
)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def init(level: int, i: int, j: int, orig: int, pos: int, orientation: int) -> None:
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            init(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig,
                pos + index,
                orientation ^ _POS_TO_ORIENTATION[index],
            )

    for orientation in range(4):
        init(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


# ---------------------------------------------------------------------------
# forward transform: lon/lat -> leaf cell id
# ---------------------------------------------------------------------------

def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x),        # face 0, +x
            (lambda: -x / y, lambda: z / y),       # face 1, +y
            (lambda: -x / z, lambda: -y / z),      # face 2, +z
            (lambda: z / x, lambda: y / x),        # face 3, -x
            (lambda: z / y, lambda: -x / y),       # face 4, -y
            (lambda: -y / z, lambda: -x / z),      # face 5, -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ufn()[m]
                v[m] = vfn()[m]
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (s2coords.h UVtoST)."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij(s: np.ndarray) -> np.ndarray:
    lim = (1 << MAX_LEVEL) - 1
    return np.clip(np.floor((1 << MAX_LEVEL) * s), 0, lim).astype(np.int64)


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Port of S2CellId::FromFaceIJ, vectorized (uint64 leaf cell ids)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)  # kPosBits - 1 = 61 - 1
    bits = face & np.uint64(_SWAP_MASK)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        sh = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> sh) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> sh) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def leaf_cell_ids(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return from_face_ij(face, i, j)


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """S2CellId::parent(level), vectorized."""
    ids = np.asarray(ids, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & ~(new_lsb - np.uint64(1))) | new_lsb


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level from trailing-one position."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    lev = MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2.0)
    return np.round(lev).astype(np.int64)


def cells_for_points(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """ST_S2CellIDs for points: the single level-L ancestor, as int64 (the
    reference returns Java longs — same two's-complement bit pattern)."""
    return parent(leaf_cell_ids(lon, lat), level).view(np.int64)


def token(cell_id: int) -> str:
    """Hex token with trailing zeros stripped (S2CellId::ToToken)."""
    h = f"{int(np.uint64(cell_id)):016x}".rstrip("0")
    return h or "X"


# ---------------------------------------------------------------------------
# inverse transform: cell id -> center lon/lat (for tests / cell bounds)
# ---------------------------------------------------------------------------

def to_face_ij(ids: np.ndarray):
    """Inverse of from_face_ij for LEAF ids, vectorized (S2CellId::ToFaceIJOrientation)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    bits = (face.astype(np.uint64)) & np.uint64(_SWAP_MASK)
    i = np.zeros_like(ids)
    j = np.zeros_like(ids)
    mask4 = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        nbits = _LOOKUP_BITS if k != 7 else (MAX_LEVEL - 7 * _LOOKUP_BITS)  # 2 top bits
        nb_mask = np.uint64((1 << (2 * nbits)) - 1)
        bits += ((ids >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & nb_mask) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & mask4) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64)


def cell_center_lonlat(ids: np.ndarray):
    """Center (lon, lat) of cells at any level (S2CellId::ToFaceSiTi delta
    rule: leaf -> 1, else 0/2 by curve parity)."""
    ids = np.asarray(ids, dtype=np.uint64)
    face, i, j = to_face_ij(ids)
    is_leaf = (ids & np.uint64(1)).astype(bool)
    parity = ((i ^ (ids >> np.uint64(2)).astype(np.int64)) & 1).astype(bool)
    delta = np.where(is_leaf, 1, np.where(parity, 2, 0)).astype(np.float64)
    s = (2.0 * i + delta) / (1 << (MAX_LEVEL + 1))
    t = (2.0 * j + delta) / (1 << (MAX_LEVEL + 1))
    u, v = st_to_uv(s), st_to_uv(t)
    return _face_uv_to_lonlat(face, u, v)


def _face_uv_to_lonlat(face, u, v):
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    xyz = {
        0: (one, u, v),
        1: (-u, one, v),
        2: (-u, -v, one),
        3: (-one, -v, -u),
        4: (v, -one, -u),
        5: (v, u, -one),
    }
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    face = np.asarray(face)
    for f, (fx, fy, fz) in xyz.items():
        m = face == f
        if m.any():
            x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


from functools import lru_cache


@lru_cache(maxsize=65536)
def cell_bounds_lonlat(cell_id: int) -> tuple[float, float, float, float]:
    """Conservative (minlon, minlat, maxlon, maxlat) of one cell, from a 3x3
    sample grid in (s, t) plus explicit pole handling (the pole sits at the
    center of faces 2/5, where corner-only bounds collapse)."""
    cid = np.uint64(cell_id)
    level = int(cell_level(np.array([cid]))[0])
    face, i, j = to_face_ij(np.array([cid]))
    f = int(face[0])
    size = 1 << (MAX_LEVEL - level)
    i0 = (int(i[0]) // size) * size
    j0 = (int(j[0]) // size) * size
    fr = np.array([0.0, 0.5, 1.0])
    si = (i0 + fr * size) / (1 << MAX_LEVEL)
    tj = (j0 + fr * size) / (1 << MAX_LEVEL)
    ss, tt = np.meshgrid(si, tj)
    u, v = st_to_uv(ss.ravel()), st_to_uv(tt.ravel())
    lon, lat = _face_uv_to_lonlat(np.full(u.shape, f), u, v)
    minlon, maxlon = float(lon.min()), float(lon.max())
    minlat, maxlat = float(lat.min()), float(lat.max())
    # cell spans the antimeridian or a pole -> full lon range
    u_lo, u_hi = st_to_uv(np.array([si[0]]))[0], st_to_uv(np.array([si[-1]]))[0]
    v_lo, v_hi = st_to_uv(np.array([tj[0]]))[0], st_to_uv(np.array([tj[-1]]))[0]
    contains_center = u_lo <= 0 <= u_hi and v_lo <= 0 <= v_hi
    if f == 2 and contains_center:
        maxlat, minlon, maxlon = 90.0, -180.0, 180.0
    if f == 5 and contains_center:
        minlat, minlon, maxlon = -90.0, -180.0, 180.0
    if maxlon - minlon > 180.0:  # antimeridian wrap -> conservative full range
        minlon, maxlon = -180.0, 180.0
    return (minlon, minlat, maxlon, maxlat)


def children(cell_id: int) -> list[int]:
    cid = int(np.uint64(cell_id))
    level = int(cell_level(np.array([cid], dtype=np.uint64))[0])
    old_lsb = 1 << (2 * (MAX_LEVEL - level))
    new_lsb = old_lsb >> 2
    base = cid - old_lsb + new_lsb
    return [base + 2 * k * new_lsb for k in range(4)]


FACE_CELLS = [int((np.uint64(f) << np.uint64(61)) + (np.uint64(1) << np.uint64(60))) for f in range(6)]


def cover_geometry(geom: Geometry, level: int) -> np.ndarray:
    """All level-L cells whose region intersects ``geom`` (uniform-level
    covering, = reference's roundCellsToSameLevel output for polygons)."""
    if geom.kind == GeometryType.POINT:
        return cells_for_points(np.array([geom.coords[0]]), np.array([geom.coords[1]]), level)
    genv = geom.envelope()
    out: list[int] = []

    def visit(cid: int) -> None:
        cminx, cminy, cmaxx, cmaxy = cell_bounds_lonlat(cid)
        if cmaxx < genv[0] or genv[2] < cminx or cmaxy < genv[1] or genv[3] < cminy:
            return
        clevel = int(cell_level(np.array([cid], dtype=np.uint64))[0])
        cell_poly = Geometry.box(cminx, cminy, cmaxx, cmaxy)
        if clevel == level:
            if P.intersects(cell_poly, geom):
                out.append(cid)
            return
        for ch in children(cid):
            visit(ch)

    for fc in FACE_CELLS:
        visit(fc)
    return np.array(sorted(np.uint64(c) for c in out), dtype=np.uint64).view(np.int64)
