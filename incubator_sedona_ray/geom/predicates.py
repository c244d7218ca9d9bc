"""DE-9IM-compatible predicates, pure numpy.

Replaces the reference's JTS kernel (``common/.../Predicates.java:19-52``:
contains, intersects, within, covers, coveredBy, crosses, overlaps, touches,
disjoint, equals) with:

* an exact, vectorized point-locate kernel (:func:`locate_points_in_polygon`)
  used by the hot join path (millions of geocoded page points vs a polygon),
* exact segment-intersection tests,
* pairwise polygon/line predicates built from vertex-location + boundary
  crossing tests, exact for points/lines vs polygons and convex polygon
  pairs directly; concave and holed polygon pairs are decided EXACTLY by
  falling back to the triangulated piecewise area kernel (covers ==
  zero-area difference, interior-overlap == positive-area intersection;
  see ``triangulate.py``) whenever the probe tests alone are insufficient.

Location codes: 0 = exterior, 1 = boundary, 2 = interior.
"""

from __future__ import annotations

import numpy as np

from .core import Geometry, GeometryType

EXTERIOR, BOUNDARY, INTERIOR = 0, 1, 2


# ---------------------------------------------------------------------------
# point locate (vectorized over points)
# ---------------------------------------------------------------------------

def locate_points_in_ring(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-number locate of many points vs one closed ring.

    Returns int8 array: 0 outside, 1 on boundary, 2 inside. Vectorized over
    points; loops over ring edges (rings are small).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    n = xs.shape[0]
    inside = np.zeros(n, dtype=bool)
    boundary = np.zeros(n, dtype=bool)
    x1s, y1s = ring[:-1, 0], ring[:-1, 1]
    x2s, y2s = ring[1:, 0], ring[1:, 1]
    for x1, y1, x2, y2 in zip(x1s, y1s, x2s, y2s):
        if x1 == x2 and y1 == y2:
            boundary |= (xs == x1) & (ys == y1)
            continue
        # on-segment test: collinear and within bbox
        cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
        on = (
            (cross == 0.0)
            & (xs >= min(x1, x2))
            & (xs <= max(x1, x2))
            & (ys >= min(y1, y2))
            & (ys <= max(y1, y2))
        )
        boundary |= on
        # ray casting to +x; half-open in y avoids double-counting vertices
        cond = (y1 > ys) != (y2 > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (xs < xint)
    out = np.zeros(n, dtype=np.int8)
    out[inside] = INTERIOR
    out[boundary] = BOUNDARY
    return out


def locate_points_in_polygon(xs, ys, rings) -> np.ndarray:
    """Locate many points vs a polygon with holes. rings[0] = shell."""
    loc = locate_points_in_ring(xs, ys, rings[0])
    for hole in rings[1:]:
        hl = locate_points_in_ring(xs, ys, hole)
        inner = loc == INTERIOR
        # interior of a hole -> exterior of polygon; hole boundary -> boundary
        loc[inner & (hl == INTERIOR)] = EXTERIOR
        loc[inner & (hl == BOUNDARY)] = BOUNDARY
    return loc


def locate_points_in_geometry(xs, ys, g: Geometry) -> np.ndarray:
    """Locate points vs Polygon or MultiPolygon (union over parts)."""
    if g.kind == GeometryType.POLYGON:
        return locate_points_in_polygon(xs, ys, g.coords)
    if g.kind == GeometryType.MULTIPOLYGON:
        loc = np.zeros(len(np.atleast_1d(xs)), dtype=np.int8)
        for poly in g.coords:
            loc = np.maximum(loc, locate_points_in_polygon(xs, ys, poly))
        return loc
    raise ValueError(f"locate needs polygonal geometry, got {g.kind}")


# ---------------------------------------------------------------------------
# segment intersection (scalar-pair helpers + vectorized variants)
# ---------------------------------------------------------------------------

def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect_any(segs_a: np.ndarray, segs_b: np.ndarray, proper_only: bool = False):
    """Test all pairs of segments between two edge sets.

    ``segs_*``: (n, 4) arrays of (x1, y1, x2, y2). Returns (any_intersect,
    any_proper). Vectorized over the full pair cross-product (edge counts are
    small for zone polygons).
    """
    a = np.asarray(segs_a, dtype=np.float64)
    b = np.asarray(segs_b, dtype=np.float64)
    if a.size == 0 or b.size == 0:
        return False, False
    ax1, ay1, ax2, ay2 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper_only:
        return bool(proper.any()), bool(proper.any())
    # improper: collinear-overlap or endpoint touching
    def on_seg(px, py, qx, qy, rx, ry):
        return (
            (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
        )

    touch = (
        ((d1 == 0) & on_seg(ax1, ay1, ax2, ay2, bx1, by1))
        | ((d2 == 0) & on_seg(ax1, ay1, ax2, ay2, bx2, by2))
        | ((d3 == 0) & on_seg(bx1, by1, bx2, by2, ax1, ay1))
        | ((d4 == 0) & on_seg(bx1, by1, bx2, by2, ax2, ay2))
    )
    straddle = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    inter = proper | touch | straddle
    return bool(inter.any()), bool(proper.any())


def _edges(g: Geometry) -> np.ndarray:
    """All edges of a geometry as an (n, 4) array."""
    segs = []
    for part in g.parts():
        if part.kind == GeometryType.LINESTRING:
            c = np.asarray(part.coords, dtype=np.float64)
            if len(c) >= 2:
                segs.append(np.hstack([c[:-1], c[1:]]))
        elif part.kind == GeometryType.POLYGON:
            for ring in part.coords:
                r = np.asarray(ring, dtype=np.float64)
                if len(r) >= 2:
                    segs.append(np.hstack([r[:-1], r[1:]]))
    return np.concatenate(segs) if segs else np.empty((0, 4))


def _vertices(g: Geometry) -> np.ndarray:
    return g.all_coords()


def _edge_midpoints(g: Geometry) -> np.ndarray:
    e = _edges(g)
    if e.size == 0:
        return np.empty((0, 2))
    return np.column_stack([(e[:, 0] + e[:, 2]) / 2.0, (e[:, 1] + e[:, 3]) / 2.0])


_POLYGONAL = (GeometryType.POLYGON, GeometryType.MULTIPOLYGON)
_PUNTAL = (GeometryType.POINT, GeometryType.MULTIPOINT)
_LINEAL = (GeometryType.LINESTRING, GeometryType.MULTILINESTRING)


def _locate_pts(pts: np.ndarray, g: Geometry) -> np.ndarray:
    if pts.size == 0:
        return np.empty(0, dtype=np.int8)
    return locate_points_in_geometry(pts[:, 0], pts[:, 1], g)


def _dim(g: Geometry) -> int:
    if g.kind in _PUNTAL:
        return 0
    if g.kind in _LINEAL:
        return 1
    if g.kind in _POLYGONAL:
        return 2
    return max((_dim(s) for s in g.coords), default=-1)


_GC = GeometryType.GEOMETRYCOLLECTION


def _flatten_gc(g: Geometry) -> list:
    """Direct parts of a GeometryCollection with NESTED collections
    flattened; Multi* children stay whole (same decomposition the
    vectorized join refine uses — the two paths must agree exactly).
    Non-collections return ``[g]``."""
    if g.kind != _GC:
        return [g]
    out: list = []
    for child in g.coords:
        if child.kind == _GC:
            out.extend(_flatten_gc(child))
        else:
            out.append(child)
    return out


def _any_gc(a: Geometry, b: Geometry) -> bool:
    return a.kind == _GC or b.kind == _GC


# ---------------------------------------------------------------------------
# pairwise predicates
# ---------------------------------------------------------------------------

def envelopes_intersect(a: Geometry, b: Geometry) -> bool:
    a0, a1, a2, a3 = a.envelope()
    b0, b1, b2, b3 = b.envelope()
    return not (a2 < b0 or b2 < a0 or a3 < b1 or b3 < a1)


def intersects(a: Geometry, b: Geometry) -> bool:
    if not envelopes_intersect(a, b):
        return False
    if _any_gc(a, b):
        # JTS Geometry.intersects decomposes GeometryCollections: true iff
        # any part pair intersects
        return any(
            intersects(x, y) for x in _flatten_gc(a) for y in _flatten_gc(b)
        )
    da, db = _dim(a), _dim(b)
    if da > db or (da == db and a.kind in _PUNTAL):
        a, b = b, a
        da, db = db, da
    # now da <= db
    if da == 0:
        pts = _vertices(a)
        if db == 0:
            bv = _vertices(b)
            return any((pts == v).all(axis=1).any() for v in bv)
        if db == 1:
            return bool(_points_on_edges(pts, _edges(b)).any())
        return bool((_locate_pts(pts, b) >= BOUNDARY).any())
    if da == 1 and db == 1:
        return segments_intersect_any(_edges(a), _edges(b))[0]
    if da == 1 and db == 2:
        if (_locate_pts(_vertices(a), b) >= BOUNDARY).any():
            return True
        return segments_intersect_any(_edges(a), _edges(b))[0]
    # polygon vs polygon
    if (_locate_pts(_vertices(a), b) >= BOUNDARY).any():
        return True
    if (_locate_pts(_vertices(b), a) >= BOUNDARY).any():
        return True
    return segments_intersect_any(_edges(a), _edges(b))[0]


def _points_on_edges(pts: np.ndarray, edges: np.ndarray) -> np.ndarray:
    if pts.size == 0 or edges.size == 0:
        return np.zeros(len(pts), dtype=bool)
    px, py = pts[:, 0, None], pts[:, 1, None]
    x1, y1, x2, y2 = edges[None, :, 0], edges[None, :, 1], edges[None, :, 2], edges[None, :, 3]
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    on = (
        (cross == 0.0)
        & (px >= np.minimum(x1, x2)) & (px <= np.maximum(x1, x2))
        & (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2))
    )
    return on.any(axis=1)


def _poly_area(g: Geometry) -> float:
    from .ops import ring_area

    tot = 0.0
    for part in g.parts():
        if part.kind != GeometryType.POLYGON:
            continue
        rings = part.coords
        tot += abs(ring_area(np.asarray(rings[0], dtype=np.float64)))
        for h in rings[1:]:
            tot -= abs(ring_area(np.asarray(h, dtype=np.float64)))
    return tot


def _needs_area_check(g: Geometry) -> bool:
    """True when probe-based tests are insufficient for ``g`` as the
    container: any part is concave or has holes. Convex hole-free
    containers are exact under the vertex/midpoint/proper-cross probes
    (a chord with both endpoints in a convex set stays inside)."""
    from .triangulate import _is_convex_ring

    for part in g.parts():
        if part.kind != GeometryType.POLYGON:
            continue
        if len(part.coords) > 1:
            return True
        if not _is_convex_ring(np.asarray(part.coords[0], dtype=np.float64)):
            return True
    return False


def _area_eps(a: Geometry, b: Geometry) -> float:
    return 1e-12 * max(_poly_area(a), _poly_area(b), 1e-300)


def covers(a: Geometry, b: Geometry) -> bool:
    """Every point of b lies in the closure of a."""
    if not envelopes_intersect(a, b):
        return False
    if _any_gc(a, b):
        # decomposition formula (shared verbatim with the vectorized join
        # refine): every b-part covered by SOME single a-part. Exact for
        # puntal b-parts (a point is in the union iff in some part) and
        # whenever a b-part lies within one a-part; a b-part spanning two
        # ADJACENT a-parts reports False where true union semantics would
        # say True (JTS relate throws for GC operands, so this is an
        # extension, not a deviation)
        ap, bp = _flatten_gc(a), _flatten_gc(b)
        return bool(ap) and bool(bp) and all(
            any(covers(x, y) for x in ap) for y in bp
        )
    if a.kind in _POLYGONAL:
        pts = _vertices(b)
        if (_locate_pts(pts, a) == EXTERIOR).any():
            return False
        if b.kind in _PUNTAL:
            return True
        # no edge of b may properly cross a's boundary, and edge midpoints
        # must not fall outside (catches boundary-to-boundary excursions)
        _, proper = segments_intersect_any(_edges(b), _edges(a))
        if proper:
            return False
        mids = _edge_midpoints(b)
        if mids.size and (_locate_pts(mids, a) == EXTERIOR).any():
            return False
        if b.kind in _POLYGONAL and _needs_area_check(a):
            # concave/holed container: the probes above are necessary but
            # not sufficient (an edge of b can excurse outside a without a
            # proper crossing or an exterior midpoint). Exact decision via
            # the triangulated piecewise difference: covers iff b \ a has
            # zero area.
            from .triangulate import difference

            return _poly_area(difference(b, a)) <= _area_eps(a, b)
        return True
    if a.kind in _LINEAL:
        if b.kind in _PUNTAL:
            return bool(_points_on_edges(_vertices(b), _edges(a)).all())
        if b.kind in _LINEAL:
            # all vertices + midpoints of b on a's edges (exact for collinear cases)
            pts = np.vstack([_vertices(b), _edge_midpoints(b)])
            return bool(_points_on_edges(pts, _edges(a)).all())
        return False
    if a.kind in _PUNTAL:
        av = _vertices(a)
        return all((av == v).all(axis=1).any() for v in _vertices(b))
    return False


def contains(a: Geometry, b: Geometry) -> bool:
    """JTS contains: covers(a, b) and interiors intersect (so a polygon does
    NOT contain a point on its own boundary — ``Predicates.java:19``)."""
    if not covers(a, b):
        return False
    if _any_gc(a, b):
        # covers already holds; interiors intersect iff some part pair
        # fully contains (covers + interior) — shared with the join refine
        return any(
            contains(x, y) for x in _flatten_gc(a) for y in _flatten_gc(b)
        )
    return _interior_intersects(a, b)


def _interior_intersects(a: Geometry, b: Geometry) -> bool:
    if _any_gc(a, b):
        return any(
            _interior_intersects(x, y)
            for x in _flatten_gc(a)
            for y in _flatten_gc(b)
        )
    if a.kind in _POLYGONAL and b.kind in _POLYGONAL:
        # only reached when covers(a, b) already holds: a positive-area b
        # inside closure(a) always shares interior (boundaries are
        # measure-zero)
        return _poly_area(b) > 0.0
    if a.kind in _POLYGONAL:
        probes = [_vertices(b)]
        if b.kind not in _PUNTAL:
            probes.append(_edge_midpoints(b))
        if b.kind in _POLYGONAL:
            probes.append(_rep_points(b))
        pts = np.vstack([p for p in probes if p.size])
        return bool((_locate_pts(pts, a) == INTERIOR).any())
    if a.kind in _LINEAL and b.kind in _PUNTAL:
        # interior of a line = line minus endpoints
        endpoints = np.vstack([np.asarray(l)[[0, -1]] for l in ([a.coords] if a.kind == GeometryType.LINESTRING else a.coords)])
        bv = _vertices(b)
        on = _points_on_edges(bv, _edges(a))
        is_end = np.array([(endpoints == v).all(axis=1).any() for v in bv])
        return bool((on & ~is_end).any())
    if a.kind in _LINEAL and b.kind in _LINEAL:
        return True  # covered line shares interior unless degenerate
    if a.kind in _PUNTAL:
        return True
    return True


def _rep_points(g: Geometry) -> np.ndarray:
    """Cheap interior-representative candidates for a polygonal geometry:
    ring-vertex centroids plus shell-diagonal midpoints."""
    pts = []
    for part in g.parts():
        if part.kind != GeometryType.POLYGON:
            continue
        shell = np.asarray(part.coords[0], dtype=np.float64)
        pts.append(shell[:-1].mean(axis=0))
        for i in range(len(shell) - 2):
            pts.append((shell[i] + shell[i + 2]) / 2.0)
    return np.array(pts) if pts else np.empty((0, 2))


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def covered_by(a: Geometry, b: Geometry) -> bool:
    return covers(b, a)


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


def touches(a: Geometry, b: Geometry) -> bool:
    """Boundaries meet, interiors do not (``Predicates.java:33``)."""
    if not intersects(a, b):
        return False
    return not _interiors_overlap(a, b)


def _interiors_overlap(a: Geometry, b: Geometry) -> bool:
    if _any_gc(a, b):
        return any(
            _interiors_overlap(x, y)
            for x in _flatten_gc(a)
            for y in _flatten_gc(b)
        )
    da, db = _dim(a), _dim(b)
    if da > db:
        a, b, da, db = b, a, db, da
    if db == 2:
        if da == 0:
            return bool((_locate_pts(_vertices(a), b) == INTERIOR).any())
        if da == 1:
            pts = np.vstack([_vertices(a), _edge_midpoints(a)])
            if (_locate_pts(pts, b) == INTERIOR).any():
                return True
            _, proper = segments_intersect_any(_edges(a), _edges(b))
            return proper
        # polygon-polygon
        for g1, g2 in ((a, b), (b, a)):
            pts = np.vstack([_vertices(g1), _edge_midpoints(g1), _rep_points(g1)])
            if (_locate_pts(pts, g2) == INTERIOR).any():
                return True
        _, proper = segments_intersect_any(_edges(a), _edges(b))
        if proper:
            return True
        if _needs_area_check(a) or _needs_area_check(b):
            # thin concave overlaps can dodge every probe point without a
            # proper boundary crossing — exact decision via the triangulated
            # piecewise intersection area
            from .triangulate import intersection

            return _poly_area(intersection(a, b)) > _area_eps(a, b)
        return False
    if db == 1:
        if da == 0:
            return _interior_intersects(b, a)
        _, proper = segments_intersect_any(_edges(a), _edges(b))
        if proper:
            return True
        # collinear overlap: a midpoint of one lies on the other (excluding endpoints-only touch)
        for g1, g2 in ((a, b), (b, a)):
            mids = _edge_midpoints(g1)
            if mids.size and _points_on_edges(mids, _edges(g2)).any():
                return True
        return False
    # point-point
    av, bv = _vertices(a), _vertices(b)
    return any((av == v).all(axis=1).any() for v in bv)


def crosses(a: Geometry, b: Geometry) -> bool:
    """Interiors intersect, neither contains the other, dim(intersection) <
    max dim (JTS crosses)."""
    if _any_gc(a, b):
        # extension (JTS relate throws for GC operands): any part pair
        # crosses
        return any(crosses(x, y) for x in _flatten_gc(a) for y in _flatten_gc(b))
    da, db = _dim(a), _dim(b)
    if da == db and da != 1:
        return False
    if not intersects(a, b):
        return False
    if da == db == 1:
        _, proper = segments_intersect_any(_edges(a), _edges(b))
        return proper and not covers(a, b) and not covers(b, a)
    lo, hi = (a, b) if da < db else (b, a)
    if _dim(lo) == 0:
        locs = _locate_pts(_vertices(lo), hi) if _dim(hi) == 2 else None
        if locs is None:
            on = _points_on_edges(_vertices(lo), _edges(hi))
            return bool(on.any() and (~on).any())
        return bool((locs == INTERIOR).any() and (locs == EXTERIOR).any())
    # line vs polygon: some of the line inside, some outside
    pts = np.vstack([_vertices(lo), _edge_midpoints(lo)])
    locs = _locate_pts(pts, hi)
    inside = (locs == INTERIOR).any()
    outside = (locs == EXTERIOR).any()
    if not inside:
        _, proper = segments_intersect_any(_edges(lo), _edges(hi))
        inside = proper
    return bool(inside and outside)


def overlaps(a: Geometry, b: Geometry) -> bool:
    """Same dimension, interiors intersect, neither covers the other.
    GeometryCollection operands decompose through the GC-aware
    intersects/covers/_interiors_overlap components (extension — JTS
    relate throws for GC)."""
    if _dim(a) != _dim(b):
        return False
    if not intersects(a, b):
        return False
    if covers(a, b) or covers(b, a):
        return False
    return _interiors_overlap(a, b)


def equals(a: Geometry, b: Geometry) -> bool:
    """Topological equality — reference implements as symDifference.isEmpty
    (``Predicates.java:43-45``); equivalent to mutual covers."""
    return covers(a, b) and covers(b, a)


PREDICATES = {
    "contains": contains,
    "intersects": intersects,
    "within": within,
    "covers": covers,
    "covered_by": covered_by,
    "coveredby": covered_by,
    "crosses": crosses,
    "overlaps": overlaps,
    "touches": touches,
    "disjoint": disjoint,
    "equals": equals,
}
