"""Measures and constructions (the ST_ function kernel).

Reference kernel: ``common/.../Functions.java`` (area:59, length:96,
centroid:462, envelope:84, distance:88, convexHull:458, buffer:80,
simplifyPreserveTopology:588, geometricMedian:930, translate:901,
affine:915, flipCoordinates:214, boundingDiagonal:969, ...). Pure numpy;
GEOS-free. Euclidean (planar) semantics, same as the reference's default
(JTS is planar; spherical variants live in ``sphere.py``).
"""

from __future__ import annotations

import numpy as np

from .core import Geometry, GeometryType, _close_ring
from .predicates import (
    _edges,
    covers,
    intersects,
    locate_points_in_geometry,
)


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------

def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = CCW)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(g: Geometry) -> float:
    if g.kind == GeometryType.POLYGON:
        return abs(ring_area(g.coords[0])) - sum(abs(ring_area(h)) for h in g.coords[1:])
    if g.kind == GeometryType.MULTIPOLYGON:
        return sum(area(Geometry(GeometryType.POLYGON, p)) for p in g.coords)
    if g.kind == GeometryType.GEOMETRYCOLLECTION:
        return sum(area(s) for s in g.coords)
    return 0.0


def length(g: Geometry) -> float:
    """JTS getLength: perimeter for polygons, length for lines, 0 for points."""
    e = _edges(g)
    if e.size == 0:
        return 0.0
    return float(np.sum(np.hypot(e[:, 2] - e[:, 0], e[:, 3] - e[:, 1])))


def centroid(g: Geometry) -> Geometry:
    k = g.kind
    if k in (GeometryType.POINT, GeometryType.MULTIPOINT):
        pts = g.all_coords()
        return Geometry.point(float(pts[:, 0].mean()), float(pts[:, 1].mean()), g.srid)
    if k in (GeometryType.LINESTRING, GeometryType.MULTILINESTRING):
        e = _edges(g)
        seglen = np.hypot(e[:, 2] - e[:, 0], e[:, 3] - e[:, 1])
        total = seglen.sum()
        if total == 0:
            return centroid(Geometry(GeometryType.MULTIPOINT, g.all_coords(), g.srid))
        mx = ((e[:, 0] + e[:, 2]) / 2 * seglen).sum() / total
        my = ((e[:, 1] + e[:, 3]) / 2 * seglen).sum() / total
        return Geometry.point(float(mx), float(my), g.srid)
    if k in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON):
        # area-weighted ring centroid; holes subtract
        asum = 0.0
        cx = cy = 0.0
        for part in g.parts():
            for i, ring in enumerate(part.coords):
                r = np.asarray(ring, dtype=np.float64)
                a = ring_area(r)
                sign = 1.0 if i == 0 else -1.0
                aa = abs(a) * sign
                if abs(a) == 0:
                    continue
                x, y = r[:, 0], r[:, 1]
                crossp = x[:-1] * y[1:] - x[1:] * y[:-1]
                rx = np.sum((x[:-1] + x[1:]) * crossp) / (6.0 * a)
                ry = np.sum((y[:-1] + y[1:]) * crossp) / (6.0 * a)
                cx += rx * aa
                cy += ry * aa
                asum += aa
        if asum == 0:
            return centroid(Geometry(GeometryType.MULTIPOINT, g.all_coords(), g.srid))
        return Geometry.point(cx / asum, cy / asum, g.srid)
    if k == GeometryType.GEOMETRYCOLLECTION:
        return centroid(Geometry(GeometryType.MULTIPOINT, g.all_coords(), g.srid))
    raise ValueError(k)


def envelope_geom(g: Geometry) -> Geometry:
    minx, miny, maxx, maxy = g.envelope()
    if minx == maxx and miny == maxy:
        return Geometry.point(minx, miny, g.srid)
    return Geometry.box(minx, miny, maxx, maxy, g.srid)


def bounding_diagonal(g: Geometry) -> Geometry:
    minx, miny, maxx, maxy = g.envelope()
    return Geometry.linestring([[minx, miny], [maxx, maxy]], g.srid)


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------

def points_segments_min_dist(px: np.ndarray, py: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """Min distance from each point to any segment in ``segs`` (n,4).
    Vectorized points × segments."""
    if segs.size == 0:
        return np.full(len(px), np.inf)
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = segs[None, :, 0], segs[None, :, 1], segs[None, :, 2], segs[None, :, 3]
    dx, dy = x2 - x1, y2 - y1
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / ll
    t = np.where(ll == 0, 0.0, np.clip(t, 0.0, 1.0))
    cx, cy = x1 + t * dx, y1 + t * dy
    d = np.hypot(px - cx, py - cy)
    return d.min(axis=1)


def distance(a: Geometry, b: Geometry) -> float:
    """Min Euclidean distance between two geometries (0 if they intersect)."""
    if intersects(a, b):
        return 0.0
    pa, pb = a.all_coords(), b.all_coords()
    ea, eb = _edges(a), _edges(b)
    best = np.inf
    if eb.size:
        best = min(best, float(points_segments_min_dist(pa[:, 0], pa[:, 1], eb).min()))
    if ea.size:
        best = min(best, float(points_segments_min_dist(pb[:, 0], pb[:, 1], ea).min()))
    if not ea.size and not eb.size:
        d = np.hypot(pa[:, 0, None] - pb[None, :, 0], pa[:, 1, None] - pb[None, :, 1])
        best = float(d.min())
    return best


def points_to_geometry_distance(xs, ys, g: Geometry) -> np.ndarray:
    """Vectorized distance from many points to one geometry (0 inside
    polygons)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    e = _edges(g)
    if e.size:
        d = points_segments_min_dist(xs, ys, e)
    else:
        pc = g.all_coords()
        d = np.hypot(xs[:, None] - pc[None, :, 0], ys[:, None] - pc[None, :, 1]).min(axis=1)
    if g.kind in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON):
        inside = locate_points_in_geometry(xs, ys, g) > 0
        d = np.where(inside, 0.0, d)
    return d


def hausdorff_distance(a: Geometry, b: Geometry) -> float:
    """Discrete Hausdorff over vertices + edge midpoints (matches JTS's
    DiscreteHausdorffDistance approximation, ``Functions.java:1029``)."""
    def densify(g):
        pts = [g.all_coords()]
        e = _edges(g)
        if e.size:
            pts.append(np.column_stack([(e[:, 0] + e[:, 2]) / 2, (e[:, 1] + e[:, 3]) / 2]))
        return np.vstack(pts)

    pa, pb = densify(a), densify(b)
    da = points_to_geometry_distance(pa[:, 0], pa[:, 1], b).max()
    db = points_to_geometry_distance(pb[:, 0], pb[:, 1], a).max()
    return float(max(da, db))


# ---------------------------------------------------------------------------
# constructions
# ---------------------------------------------------------------------------

def convex_hull(g: Geometry) -> Geometry:
    """Andrew's monotone chain."""
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid)
    if len(pts) == 1:
        return Geometry.point(pts[0, 0], pts[0, 1], g.srid)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        chain: list[np.ndarray] = []
        for p in points:
            while len(chain) >= 2:
                o = (chain[-1][0] - chain[-2][0]) * (p[1] - chain[-2][1]) - (
                    chain[-1][1] - chain[-2][1]
                ) * (p[0] - chain[-2][0])
                if o <= 0:
                    chain.pop()
                else:
                    break
            chain.append(p)
        return chain

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) == 2:
        return Geometry.linestring(hull, g.srid)
    return Geometry.polygon(hull, srid=g.srid)


def buffer_point(x: float, y: float, radius: float, quad_segs: int = 8, srid: int = 0) -> Geometry:
    """Circle polygon approximation (GEOS default 8 segments per quadrant,
    matches JTS BufferOp for points, ``Functions.java:80``)."""
    n = max(4, 4 * quad_segs)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    shell = np.column_stack([x + radius * np.cos(ang), y + radius * np.sin(ang)])
    return Geometry.polygon(shell, srid=srid)


def _path_buffer_pieces(
    path: np.ndarray, radius: float, quad_segs: int, closed: bool = False
) -> list[Geometry]:
    """Convex pieces of the round-join buffer of a polyline: one disc
    (4*quad_segs-gon) per vertex + one offset rectangle per segment, in
    path order so the union fold's bbox skip only touches neighbors. With
    ``closed`` the last segment wraps to the first vertex (ring input
    WITHOUT the duplicated closing vertex — a duplicate disc would
    degenerate the union fold)."""
    n = max(4, 4 * quad_segs)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ca, sa = radius * np.cos(ang), radius * np.sin(ang)
    out: list[Geometry] = []
    m = len(path)
    for i in range(m):
        x, y = float(path[i][0]), float(path[i][1])
        out.append(Geometry.polygon(np.column_stack([x + ca, y + sa])))
        if i + 1 < m or closed:
            a, b = path[i], path[(i + 1) % m]
            dx, dy = float(b[0] - a[0]), float(b[1] - a[1])
            L = float(np.hypot(dx, dy))
            if L == 0.0:
                continue
            nx, ny = -dy / L * radius, dx / L * radius
            # CCW for radius > 0 (the only sign this helper receives)
            out.append(
                Geometry.polygon(
                    np.array(
                        [
                            [a[0] + nx, a[1] + ny],
                            [a[0] - nx, a[1] - ny],
                            [b[0] - nx, b[1] - ny],
                            [b[0] + nx, b[1] + ny],
                        ]
                    )
                )
            )
    return out


def buffer(g: Geometry, radius: float, quad_segs: int = 8) -> Geometry:
    """Round-join / round-cap buffer (JTS BufferOp semantics,
    ``Functions.java:80``): the Minkowski sum with a disc discretized at
    GEOS's 4*quad_segs circle resolution, decomposed into per-vertex discs
    + per-segment offset rectangles (+ the interior pieces for polygons),
    folded with the convex-piece union kernel and dissolved to boundary
    rings (``geom/dissolve.py``). Negative radius erodes polygons
    (interior minus the boundary's buffer); a negative buffer of points /
    lines is empty, as in JTS."""
    from .dissolve import dissolve
    from .triangulate import _as_geom, _convex_pieces, _pieces_minus_filtered

    if radius == 0:
        return g
    k = g.kind
    if radius < 0 and k not in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON):
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid)
    if k == GeometryType.POINT:
        return buffer_point(float(g.coords[0]), float(g.coords[1]), radius, quad_segs, g.srid)

    # sliver threshold: 1e-9 r^2 is far below the discretization error of
    # the 4*quad_segs circle (~1e-3 r^2), so dropped slivers never show up
    # against the arc approximation itself, but they keep the fold's
    # fragment count linear in path length
    eps_area = abs(radius) * abs(radius) * 1e-9

    def fold_union(pieces: list[Geometry]) -> list[Geometry]:
        # pieces overlap each other (a vertex disc overlaps both adjacent
        # segment rectangles), so each one must be clipped against the
        # accumulated tiling individually. Epsilon-area slivers (coincident
        # piece edges fragmenting on each other) are dropped — they change
        # the buffered area by O(1e-12 r^2) but otherwise fragment the fold
        # combinatorially.
        acc: list[Geometry] = []
        for p in pieces:
            acc = acc + _pieces_minus_filtered([p], acc, eps_area)
        return acc

    piece_lists: list[list[Geometry]] = []
    interior: list[Geometry] = []
    if k == GeometryType.MULTIPOINT:
        pts = np.asarray(g.coords, dtype=np.float64).reshape(-1, 2)
        piece_lists = [[buffer_point(float(x), float(y), radius, quad_segs)] for x, y in pts]
    elif k in (GeometryType.LINESTRING, GeometryType.MULTILINESTRING):
        paths = [np.asarray(g.coords, dtype=np.float64)] if k == GeometryType.LINESTRING else [
            np.asarray(p, dtype=np.float64) for p in g.coords
        ]
        piece_lists = [_path_buffer_pieces(p, radius, quad_segs) for p in paths]
    elif k in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON):
        interior = _convex_pieces(g)
        rings = list(g.coords) if k == GeometryType.POLYGON else [r for poly in g.coords for r in poly]
        ring_paths = []
        for r in rings:
            rr = np.asarray(r, dtype=np.float64)
            if len(rr) >= 2 and rr[0][0] == rr[-1][0] and rr[0][1] == rr[-1][1]:
                rr = rr[:-1]
            ring_paths.append(rr)
        piece_lists = [_path_buffer_pieces(rr, abs(radius), quad_segs, closed=True) for rr in ring_paths]
        if radius < 0:
            boundary_pieces = fold_union([p for pl in piece_lists for p in pl])
            out = dissolve(_as_geom(_pieces_minus_filtered(interior, boundary_pieces, eps_area)))
            out.srid = g.srid
            return out
    else:  # GeometryCollection etc.: buffer the union of member buffers
        parts = list(g.parts())
        if not parts:
            return Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid)
        piece_lists = [_convex_pieces(buffer(p, radius, quad_segs)) for p in parts]
    acc = fold_union(interior + [p for pl in piece_lists for p in pl])
    out = dissolve(_as_geom(acc))
    out.srid = g.srid
    return out


def expand_envelope(env: tuple[float, float, float, float], d: float):
    """Circle/CircleRDD-style envelope expansion for distance joins
    (``TraitJoinQueryBase.scala:84-97`` planar branch)."""
    minx, miny, maxx, maxy = env
    return (minx - d, miny - d, maxx + d, maxy + d)


def simplify(g: Geometry, tol: float) -> Geometry:
    """Douglas-Peucker (ST_SimplifyPreserveTopology approximation for
    non-self-intersecting inputs, ``Functions.java:588``)."""

    def dp(coords: np.ndarray) -> np.ndarray:
        if len(coords) <= 2:
            return coords
        keep = np.zeros(len(coords), dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, len(coords) - 1)]
        while stack:
            i0, i1 = stack.pop()
            if i1 <= i0 + 1:
                continue
            seg = np.array([[coords[i0, 0], coords[i0, 1], coords[i1, 0], coords[i1, 1]]])
            mid = coords[i0 + 1 : i1]
            d = points_segments_min_dist(mid[:, 0], mid[:, 1], seg)
            j = int(np.argmax(d))
            if d[j] > tol:
                keep[i0 + 1 + j] = True
                stack.append((i0, i0 + 1 + j))
                stack.append((i0 + 1 + j, i1))
        return coords[keep]

    k = g.kind
    if k == GeometryType.LINESTRING:
        return Geometry(k, dp(np.asarray(g.coords, dtype=np.float64)), g.srid)
    if k == GeometryType.POLYGON:
        rings = []
        for r in g.coords:
            s = dp(np.asarray(r, dtype=np.float64))
            if len(s) >= 4:
                rings.append(s)
        return Geometry(k, rings or [np.asarray(g.coords[0])], g.srid)
    if k in (GeometryType.MULTILINESTRING, GeometryType.MULTIPOLYGON):
        return Geometry(k, [simplify(p, tol).coords for p in g.parts()], g.srid)
    return g


def translate(g: Geometry, dx: float, dy: float) -> Geometry:
    return affine(g, 1, 0, 0, 1, dx, dy)


def affine(g: Geometry, a: float, b: float, d: float, e: float, xoff: float, yoff: float) -> Geometry:
    """x' = a*x + b*y + xoff ; y' = d*x + e*y + yoff (ST_Affine 2D,
    ``Functions.java:915``)."""
    M = np.array([[a, b], [d, e]], dtype=np.float64)
    off = np.array([xoff, yoff], dtype=np.float64)

    def tx(arr):
        arr = np.asarray(arr, dtype=np.float64)
        return arr @ M.T + off

    k, c = g.kind, g.coords
    if k == GeometryType.POINT:
        return Geometry(k, tx(c.reshape(1, 2))[0], g.srid)
    if k in (GeometryType.LINESTRING, GeometryType.MULTIPOINT):
        return Geometry(k, tx(c), g.srid)
    if k in (GeometryType.POLYGON, GeometryType.MULTILINESTRING):
        return Geometry(k, [tx(r) for r in c], g.srid)
    if k == GeometryType.MULTIPOLYGON:
        return Geometry(k, [[tx(r) for r in poly] for poly in c], g.srid)
    if k == GeometryType.GEOMETRYCOLLECTION:
        return Geometry(k, [affine(s, a, b, d, e, xoff, yoff) for s in c], g.srid)
    raise ValueError(k)


def flip_coordinates(g: Geometry) -> Geometry:
    return affine(g, 0, 1, 1, 0, 0, 0)


def boundary(g: Geometry) -> Geometry:
    k, c = g.kind, g.coords
    if k == GeometryType.POLYGON:
        if len(c) == 1:
            return Geometry(GeometryType.LINESTRING, np.asarray(c[0]), g.srid)
        return Geometry(GeometryType.MULTILINESTRING, [np.asarray(r) for r in c], g.srid)
    if k == GeometryType.LINESTRING:
        arr = np.asarray(c)
        if len(arr) and np.array_equal(arr[0], arr[-1]):
            return Geometry(GeometryType.MULTIPOINT, np.empty((0, 2)), g.srid)
        return Geometry(GeometryType.MULTIPOINT, arr[[0, -1]], g.srid)
    if k == GeometryType.MULTIPOLYGON:
        lines = [np.asarray(r) for poly in c for r in poly]
        return Geometry(GeometryType.MULTILINESTRING, lines, g.srid)
    return Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid)


def geometric_median(g: Geometry, tol: float = 1e-6, max_iter: int = 1000) -> Geometry:
    """Weiszfeld iteration (``Functions.java:930``)."""
    pts = g.all_coords()
    cur = pts.mean(axis=0)
    for _ in range(max_iter):
        d = np.hypot(pts[:, 0] - cur[0], pts[:, 1] - cur[1])
        if (d < 1e-12).any():
            break
        w = 1.0 / d
        nxt = (pts * w[:, None]).sum(axis=0) / w.sum()
        if np.hypot(*(nxt - cur)) < tol:
            cur = nxt
            break
        cur = nxt
    return Geometry.point(float(cur[0]), float(cur[1]), g.srid)


def _seg_intersection_point(p1, p2, p3, p4):
    """Intersection point of properly-crossing segments (caller guarantees
    a proper crossing; plain line-line solve)."""
    d1 = p2 - p1
    d2 = p4 - p3
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    t = ((p3[0] - p1[0]) * d2[1] - (p3[1] - p1[1]) * d2[0]) / denom
    return p1 + t * d1, t


def _node_ring(r: np.ndarray) -> list[np.ndarray]:
    """Split a self-crossing closed ring into its simple sub-rings (the
    JTS MakeValid bowtie repair): compute every proper segment crossing,
    insert the crossing vertices into the walk, then pop a simple ring each
    time the walk revisits a vertex (stack-cycle extraction). Crossing
    coordinates are computed ONCE per pair, so the revisit test is exact
    float equality. Returns [r] unchanged when the ring is simple."""
    n = len(r) - 1
    inserts: dict[int, list[tuple[float, tuple[float, float]]]] = {}
    found = False
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            a1, a2, b1, b2 = r[i], r[i + 1], r[j], r[j + 1]
            d1 = np.cross(a2 - a1, b1 - a1)
            d2 = np.cross(a2 - a1, b2 - a1)
            d3 = np.cross(b2 - b1, a1 - b1)
            d4 = np.cross(b2 - b1, a2 - b1)
            if d1 * d2 < 0 and d3 * d4 < 0:  # proper crossing
                pt, t = _seg_intersection_point(a1, a2, b1, b2)
                tj = np.dot(pt - b1, b2 - b1) / np.dot(b2 - b1, b2 - b1)
                key = (float(pt[0]), float(pt[1]))
                inserts.setdefault(i, []).append((float(t), key))
                inserts.setdefault(j, []).append((float(tj), key))
                found = True
    if not found:
        return [r]
    walk: list[tuple[float, float]] = []
    for i in range(n):
        walk.append((float(r[i, 0]), float(r[i, 1])))
        for _, key in sorted(inserts.get(i, [])):
            walk.append(key)
    walk.append(walk[0])
    rings: list[np.ndarray] = []
    stack: list[tuple[float, float]] = []
    pos: dict[tuple[float, float], int] = {}
    for v in walk:
        if v in pos:
            cycle = stack[pos[v] :] + [v]
            if len(cycle) >= 4:
                rings.append(np.asarray(cycle, dtype=np.float64))
            # unwind the stack back to the first occurrence
            for w in stack[pos[v] + 1 :]:
                pos.pop(w, None)
            stack = stack[: pos[v] + 1]
        else:
            pos[v] = len(stack)
            stack.append(v)
    # keep only pieces with area; interleaved crossings can leave an
    # extracted cycle still self-crossing -> recurse until simple (each
    # level consumes at least one crossing, so this terminates)
    kept = [c for c in rings if abs(_shoelace(c)) > 0.0]
    if not kept:
        return [r]
    out: list[np.ndarray] = []
    for c in kept:
        if len(c) == len(r) and np.array_equal(c, r):
            out.append(c)
        else:
            out.extend(_node_ring(c))
    return out


def _shoelace(c: np.ndarray) -> float:
    x, y = c[:, 0], c[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def make_valid(g: Geometry) -> Geometry:
    """ST_MakeValid: normalize ring closure and split self-crossing
    (bowtie) rings into simple pieces — a single bowtie shell becomes the
    MULTIPOLYGON of its lobes, matching JTS MakeValid structure. Polygons
    whose repaired rings multiply are reassembled by even-odd nesting."""
    if g.kind != GeometryType.POLYGON:
        return g
    pieces: list[np.ndarray] = []
    for r in g.coords:
        pieces.extend(_node_ring(_close_ring(np.asarray(r, dtype=np.float64))))
    if len(pieces) == len(g.coords):
        return Geometry(g.kind, pieces, g.srid)
    # even-odd nesting over the repaired ring set (buildArea semantics)
    from . import predicates as _p

    depth = []
    for i, r in enumerate(pieces):
        d = 0
        probe = r[:-1].mean(axis=0) if abs(_shoelace(r)) > 0 else r[0]
        for j, other in enumerate(pieces):
            if i != j and _p.locate_points_in_ring(
                np.array([probe[0]]), np.array([probe[1]]), other
            )[0] == _p.INTERIOR:
                d += 1
        depth.append(d)
    polys = []
    for i, r in enumerate(pieces):
        if depth[i] % 2 == 0:
            holes = [
                pieces[j]
                for j in range(len(pieces))
                if j != i
                and depth[j] == depth[i] + 1
                and _p.locate_points_in_ring(np.array([pieces[j][0, 0]]), np.array([pieces[j][0, 1]]), r)[0]
                != _p.EXTERIOR
            ]
            polys.append([r] + holes)
    if not polys:
        # deeply-interleaved crossings (e.g. a pentagram) extract OVERLAPPING
        # simple cycles — dissolve them with the piecewise union kernel
        from .triangulate import union_aggr_general

        u = union_aggr_general([Geometry(GeometryType.POLYGON, [p]) for p in pieces])
        u.srid = g.srid
        return u
    if len(polys) == 1:
        return Geometry(GeometryType.POLYGON, polys[0], g.srid)
    return Geometry(GeometryType.MULTIPOLYGON, polys, g.srid)


def union_envelope_aggr(envs: np.ndarray) -> tuple[float, float, float, float]:
    """ST_Envelope_Aggr kernel over an (n,4) envelope array."""
    return (
        float(envs[:, 0].min()),
        float(envs[:, 1].min()),
        float(envs[:, 2].max()),
        float(envs[:, 3].max()),
    )
