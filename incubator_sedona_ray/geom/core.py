"""Lightweight geometry value type.

The engine's Datasets never carry these objects between stages — geometry
travels as WKB ``binary`` columns or bare ``lon``/``lat`` float64 columns.
``Geometry`` exists for driver-side fixtures, small broadcast layers (zone
polygons) and per-group join kernels.

Coordinate layout:

* ``Point``            -> ndarray shape (d,)
* ``LineString``       -> ndarray shape (n, d)
* ``MultiPoint``       -> ndarray shape (n, d)
* ``Polygon``          -> list[ndarray (n, d)]; ring 0 = exterior shell,
  rest = holes; rings are closed (first == last vertex)
* ``MultiLineString``  -> list[ndarray (n, d)]
* ``MultiPolygon``     -> list[list[ndarray]]
* ``GeometryCollection``-> list[Geometry]

Mirrors the type set of the reference serializer
(``common/.../geometrySerde/GeometrySerializer.java:41-58``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np


class GeometryType:
    POINT = "Point"
    LINESTRING = "LineString"
    POLYGON = "Polygon"
    MULTIPOINT = "MultiPoint"
    MULTILINESTRING = "MultiLineString"
    MULTIPOLYGON = "MultiPolygon"
    GEOMETRYCOLLECTION = "GeometryCollection"


_WKB_CODE = {
    GeometryType.POINT: 1,
    GeometryType.LINESTRING: 2,
    GeometryType.POLYGON: 3,
    GeometryType.MULTIPOINT: 4,
    GeometryType.MULTILINESTRING: 5,
    GeometryType.MULTIPOLYGON: 6,
    GeometryType.GEOMETRYCOLLECTION: 7,
}
_WKB_KIND = {v: k for k, v in _WKB_CODE.items()}


@dataclass
class Geometry:
    kind: str
    coords: Any
    srid: int = 0
    # optional Z: float for Point, (n,) ndarray for LineString/MultiPoint;
    # None = 2D (the engine's planar kernels ignore Z; only the ST_Z family
    # and WKB serde touch it — Constructors.java:94, Functions.java:92-180)
    z: Any = None

    # -- basic accessors -------------------------------------------------
    @property
    def is_empty(self) -> bool:
        c = self.coords
        if self.kind == GeometryType.POINT:
            return c is None or len(c) == 0 or bool(np.any(np.isnan(c)))
        return c is None or len(c) == 0

    def envelope(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy)."""
        pts = self.all_coords()
        if pts.size == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    def all_coords(self) -> np.ndarray:
        """All vertices as an (n, d) array (concatenated over parts/rings)."""
        k, c = self.kind, self.coords
        if k == GeometryType.POINT:
            if self.is_empty:
                return np.empty((0, 2))
            return np.asarray(c, dtype=np.float64).reshape(1, -1)
        if k in (GeometryType.LINESTRING, GeometryType.MULTIPOINT):
            return np.asarray(c, dtype=np.float64).reshape(-1, 2) if len(c) else np.empty((0, 2))
        if k in (GeometryType.POLYGON, GeometryType.MULTILINESTRING):
            arrs = [np.asarray(r, dtype=np.float64) for r in c if len(r)]
            return np.concatenate(arrs) if arrs else np.empty((0, 2))
        if k == GeometryType.MULTIPOLYGON:
            arrs = [np.asarray(r, dtype=np.float64) for poly in c for r in poly if len(r)]
            return np.concatenate(arrs) if arrs else np.empty((0, 2))
        if k == GeometryType.GEOMETRYCOLLECTION:
            arrs = [g.all_coords() for g in c]
            arrs = [a for a in arrs if a.size]
            return np.concatenate(arrs) if arrs else np.empty((0, 2))
        raise ValueError(f"unknown geometry kind {k!r}")

    def num_points(self) -> int:
        return int(self.all_coords().shape[0])

    def num_geometries(self) -> int:
        if self.kind in (
            GeometryType.MULTIPOINT,
            GeometryType.MULTILINESTRING,
            GeometryType.MULTIPOLYGON,
            GeometryType.GEOMETRYCOLLECTION,
        ):
            return len(self.coords)
        return 1

    def parts(self) -> list["Geometry"]:
        """Explode a multi-geometry into its single-geometry parts (ST_Dump)."""
        k, c = self.kind, self.coords
        if k == GeometryType.MULTIPOINT:
            return [Geometry(GeometryType.POINT, np.asarray(p, dtype=np.float64), self.srid) for p in c]
        if k == GeometryType.MULTILINESTRING:
            return [Geometry(GeometryType.LINESTRING, np.asarray(l, dtype=np.float64), self.srid) for l in c]
        if k == GeometryType.MULTIPOLYGON:
            return [Geometry(GeometryType.POLYGON, poly, self.srid) for poly in c]
        if k == GeometryType.GEOMETRYCOLLECTION:
            return list(c)
        return [self]

    # -- constructors ----------------------------------------------------
    @staticmethod
    def point(x: float, y: float, srid: int = 0) -> "Geometry":
        return Geometry(GeometryType.POINT, np.array([x, y], dtype=np.float64), srid)

    @staticmethod
    def linestring(coords, srid: int = 0) -> "Geometry":
        return Geometry(GeometryType.LINESTRING, np.asarray(coords, dtype=np.float64), srid)

    @staticmethod
    def polygon(shell, holes=(), srid: int = 0) -> "Geometry":
        rings = [_close_ring(np.asarray(shell, dtype=np.float64))]
        rings.extend(_close_ring(np.asarray(h, dtype=np.float64)) for h in holes)
        return Geometry(GeometryType.POLYGON, rings, srid)

    @staticmethod
    def box(minx: float, miny: float, maxx: float, maxy: float, srid: int = 0) -> "Geometry":
        """Axis-aligned rectangle polygon (ST_PolygonFromEnvelope semantics,
        reference ``Constructors.java:140``: ccw shell starting at (minx,miny))."""
        shell = np.array(
            [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
            dtype=np.float64,
        )
        return Geometry(GeometryType.POLYGON, [shell], srid)

    def __eq__(self, other: object) -> bool:  # structural equality (ordering-sensitive)
        if not isinstance(other, Geometry):
            return NotImplemented
        if self.kind != other.kind or self.srid != other.srid:
            return False
        return _coords_eq(self.coords, other.coords)

    def __hash__(self) -> int:
        return hash((self.kind, self.srid, self.all_coords().tobytes()))


def _coords_eq(a, b) -> bool:
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        a, b = np.asarray(a), np.asarray(b)
        return a.shape == b.shape and bool(np.array_equal(a, b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_coords_eq(x, y) for x, y in zip(a, b))
    return a == b


def _close_ring(r: np.ndarray) -> np.ndarray:
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[0]])
    return r


def wkb_type_code(kind: str) -> int:
    return _WKB_CODE[kind]


def wkb_type_kind(code: int) -> str:
    return _WKB_KIND[code]
