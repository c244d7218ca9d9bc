"""Hexagonal hierarchical cell encoder ("H3-style").

The north rule asks for "H3/S2 cell encoding". The true S2 scheme is
implemented in :mod:`.s2`; this module provides the hexagonal alternative
behind the same (lon, lat, res) -> int64 interface. It is NOT bit-compatible
with Uber H3 (the h3 library is unavailable in this environment and the
reference itself has no H3 — SURVEY.md §2.2): it is a flat equirectangular
pointy-top hex grid with aperture-4 resolution scaling (hex edge halves per
resolution step), using cube-coordinate rounding — the standard public hex
-grid math.

id layout: [4 bits res][30 bits q+OFFSET][30 bits r+OFFSET].
"""

from __future__ import annotations

import numpy as np

_BASE_EDGE = 10.0  # degrees at res 0
_OFFSET = 1 << 29


def _edge(res: int) -> float:
    return _BASE_EDGE / (2.0 ** res)


def cell_ids(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    size = _edge(res)
    # pointy-top axial coords
    q = (np.sqrt(3.0) / 3.0 * lon - 1.0 / 3.0 * lat) / size
    r = (2.0 / 3.0 * lat) / size
    qi, ri = _cube_round(q, r)
    return (
        (np.int64(res) << np.int64(60))
        | ((qi + _OFFSET).astype(np.int64) << np.int64(30))
        | (ri + _OFFSET).astype(np.int64)
    )


def _cube_round(q: np.ndarray, r: np.ndarray):
    x, z = q, r
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def cell_center(cell_id: int) -> tuple[float, float]:
    res = int(cell_id >> 60) & 0xF
    q = ((cell_id >> 30) & ((1 << 30) - 1)) - _OFFSET
    r = (cell_id & ((1 << 30) - 1)) - _OFFSET
    size = _edge(res)
    lon = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    lat = size * (3.0 / 2.0 * r)
    return (float(lon), float(lat))


def to_parent(cell_id: int) -> int:
    """Approximate parent: the cell at res-1 containing this cell's center
    (hex grids don't nest exactly; same caveat as real H3)."""
    res = int(cell_id >> 60) & 0xF
    lon, lat = cell_center(cell_id)
    return int(cell_ids(np.array([lon]), np.array([lat]), res - 1)[0])
