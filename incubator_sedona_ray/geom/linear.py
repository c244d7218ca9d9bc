"""Linear referencing + extra constructions (no GEOS needed).

Reference kernels: lineInterpolatePoint (``Functions.java:534``),
lineSubString (``:527``), lineMerge (``:491``), frechetDistance (``:965``,
JTS uses discrete Fréchet), addPoint/removePoint/setPoint (``:384-437``),
lineFromMultiPoint (``:439``), minimumBoundingCircle (``:511``, Welzl),
normalize (``:100``), convex clipping for ST_Intersection when one operand
is convex (Sutherland–Hodgman, public algorithm).
"""

from __future__ import annotations

import numpy as np

from .core import Geometry, GeometryType, _close_ring
from .ops import ring_area


def line_interpolate_point(g: Geometry, fraction: float) -> Geometry:
    """Point at ``fraction`` (0..1) of the line's length."""
    coords = np.asarray(g.coords, dtype=np.float64)
    seg = np.diff(coords, axis=0)
    lens = np.hypot(seg[:, 0], seg[:, 1])
    total = lens.sum()
    if total == 0:
        return Geometry.point(coords[0, 0], coords[0, 1], g.srid)
    target = np.clip(fraction, 0.0, 1.0) * total
    cum = np.concatenate([[0.0], np.cumsum(lens)])
    i = int(np.searchsorted(cum, target, side="right") - 1)
    i = min(i, len(seg) - 1)
    t = (target - cum[i]) / lens[i] if lens[i] else 0.0
    p = coords[i] + t * seg[i]
    return Geometry.point(float(p[0]), float(p[1]), g.srid)


def line_substring(g: Geometry, start: float, end: float) -> Geometry:
    """Sub-line between length fractions start..end."""
    coords = np.asarray(g.coords, dtype=np.float64)
    seg = np.diff(coords, axis=0)
    lens = np.hypot(seg[:, 0], seg[:, 1])
    total = lens.sum()
    cum = np.concatenate([[0.0], np.cumsum(lens)])
    a, b = np.clip(start, 0, 1) * total, np.clip(end, 0, 1) * total
    if b < a:
        a, b = b, a

    def at(target):
        i = int(np.searchsorted(cum, target, side="right") - 1)
        i = min(i, len(seg) - 1)
        t = (target - cum[i]) / lens[i] if lens[i] else 0.0
        return coords[i] + t * seg[i], i

    pa_, ia = at(a)
    pb_, ib = at(b)
    mid = coords[ia + 1 : ib + 1]
    pts = np.vstack([[pa_], mid, [pb_]])
    # drop consecutive duplicates
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = np.any(np.diff(pts, axis=0) != 0, axis=1)
    return Geometry(GeometryType.LINESTRING, pts[keep], g.srid)


def line_merge(g: Geometry) -> Geometry:
    """Merge connectable linestrings of a MultiLineString (JTS LineMerger
    semantics for simple chains)."""
    if g.kind != GeometryType.MULTILINESTRING:
        return g
    lines = [np.asarray(l, dtype=np.float64) for l in g.coords]
    merged = True
    while merged and len(lines) > 1:
        merged = False
        for i in range(len(lines)):
            for j in range(i + 1, len(lines)):
                a, b = lines[i], lines[j]
                if np.array_equal(a[-1], b[0]):
                    lines[i] = np.vstack([a, b[1:]])
                elif np.array_equal(a[-1], b[-1]):
                    lines[i] = np.vstack([a, b[::-1][1:]])
                elif np.array_equal(a[0], b[-1]):
                    lines[i] = np.vstack([b, a[1:]])
                elif np.array_equal(a[0], b[0]):
                    lines[i] = np.vstack([b[::-1], a[1:]])
                else:
                    continue
                lines.pop(j)
                merged = True
                break
            if merged:
                break
    if len(lines) == 1:
        return Geometry(GeometryType.LINESTRING, lines[0], g.srid)
    return Geometry(GeometryType.MULTILINESTRING, lines, g.srid)


def frechet_distance(a: Geometry, b: Geometry) -> float:
    """Discrete Fréchet distance over vertices (JTS DiscreteFrechetDistance)."""
    p = a.all_coords()
    q = b.all_coords()
    n, m = len(p), len(q)
    d = np.hypot(p[:, 0, None] - q[None, :, 0], p[:, 1, None] - q[None, :, 1])
    ca = np.full((n, m), -1.0)
    ca[0, 0] = d[0, 0]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            prev = min(
                (ca[i - 1, j] if i > 0 else np.inf),
                (ca[i - 1, j - 1] if i > 0 and j > 0 else np.inf),
                (ca[i, j - 1] if j > 0 else np.inf),
            )
            ca[i, j] = max(prev, d[i, j])
    return float(ca[n - 1, m - 1])


def add_point(g: Geometry, point: Geometry, index: int = -1) -> Geometry:
    coords = np.asarray(g.coords, dtype=np.float64)
    p = np.asarray(point.coords, dtype=np.float64).reshape(1, 2)
    if index < 0 or index >= len(coords):
        out = np.vstack([coords, p])
    else:
        out = np.vstack([coords[:index], p, coords[index:]])
    return Geometry(GeometryType.LINESTRING, out, g.srid)


def remove_point(g: Geometry, index: int = -1) -> Geometry:
    coords = np.asarray(g.coords, dtype=np.float64)
    if index < 0:
        index = len(coords) - 1
    return Geometry(GeometryType.LINESTRING, np.delete(coords, index, axis=0), g.srid)


def set_point(g: Geometry, index: int, point: Geometry) -> Geometry:
    coords = np.asarray(g.coords, dtype=np.float64).copy()
    coords[index] = point.coords
    return Geometry(GeometryType.LINESTRING, coords, g.srid)


def line_from_multipoint(g: Geometry) -> Geometry:
    return Geometry(GeometryType.LINESTRING, g.all_coords(), g.srid)


def normalize(g: Geometry) -> Geometry:
    """Canonical form: polygon shells CW, holes CCW (JTS normalized form),
    rings rotated to start at the lexicographically smallest vertex."""
    def norm_ring(r: np.ndarray, want_ccw: bool) -> np.ndarray:
        r = _close_ring(np.asarray(r, dtype=np.float64))
        open_r = r[:-1]
        is_ccw = ring_area(r) > 0
        if is_ccw != want_ccw:
            open_r = open_r[::-1]
        start = np.lexsort((open_r[:, 1], open_r[:, 0]))[0]
        rolled = np.roll(open_r, -start, axis=0)
        return _close_ring(rolled)

    if g.kind == GeometryType.POLYGON:
        # JTS normalized: exterior CW, interior CCW
        rings = [norm_ring(g.coords[0], want_ccw=False)]
        rings += [norm_ring(r, want_ccw=True) for r in g.coords[1:]]
        return Geometry(g.kind, rings, g.srid)
    if g.kind == GeometryType.MULTIPOLYGON:
        return Geometry(g.kind, [normalize(Geometry(GeometryType.POLYGON, p, g.srid)).coords for p in g.coords], g.srid)
    return g


def minimum_bounding_circle(g: Geometry) -> tuple[float, float, float]:
    """(cx, cy, radius) of the exact minimum enclosing circle (Welzl)."""
    pts = np.unique(g.all_coords(), axis=0)
    rng = np.random.default_rng(0)
    P = pts[rng.permutation(len(pts))]

    def circle_two(a, b):
        c = (a + b) / 2
        return (c[0], c[1], float(np.hypot(*(a - b)) / 2))

    def circle_three(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-14:
            # collinear -> widest pair
            cands = [circle_two(a, b), circle_two(b, c), circle_two(a, c)]
            return max(cands, key=lambda t: t[2])
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
        r = float(np.hypot(ax - ux, ay - uy))
        return (float(ux), float(uy), r)

    def inside(c, p, eps=1e-9):
        return np.hypot(p[0] - c[0], p[1] - c[1]) <= c[2] + eps

    c = (float(P[0][0]), float(P[0][1]), 0.0)
    for i in range(1, len(P)):
        if inside(c, P[i]):
            continue
        c = (float(P[i][0]), float(P[i][1]), 0.0)
        for j in range(i):
            if inside(c, P[j]):
                continue
            c = circle_two(P[i], P[j])
            for k in range(j):
                if inside(c, P[k]):
                    continue
                c = circle_three(P[i], P[j], P[k])
    return c


def clip_convex(subject: Geometry, clip: Geometry) -> Geometry:
    """Sutherland–Hodgman polygon clipping: exact
    ``ST_Intersection(subject, clip)`` when ``clip`` is CONVEX (zone squares,
    envelopes, buffers). Returns a Polygon (possibly empty collection)."""
    clip_ring = np.asarray(clip.coords[0], dtype=np.float64)
    if ring_area(clip_ring) < 0:
        clip_ring = clip_ring[::-1]
    out = list(np.asarray(subject.coords[0], dtype=np.float64)[:-1])
    for i in range(len(clip_ring) - 1):
        a, b = clip_ring[i], clip_ring[i + 1]
        if not out:
            break
        inp = out
        out = []

        def side(p):
            return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])

        for j in range(len(inp)):
            cur, nxt = inp[j], inp[(j + 1) % len(inp)]
            cs, ns = side(cur), side(nxt)
            if cs >= 0:
                out.append(cur)
            if (cs >= 0) != (ns >= 0):
                t = cs / (cs - ns)
                out.append(cur + t * (nxt - cur))
    if len(out) < 3:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [], subject.srid)
    return Geometry.polygon(np.asarray(out), srid=subject.srid)


def split_line_at_points(g: Geometry, pts: np.ndarray) -> list[Geometry]:
    """Split a LineString at the given points that lie ON it; points off
    the line are ignored (GeometrySplitter.java line/point semantics).
    Returns the ordered sub-linestrings."""
    coords = np.asarray(g.coords, dtype=np.float64)
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    # locate each point as (segment index, param t along segment)
    cuts: list[tuple[int, float]] = []
    for p in pts:
        for i in range(len(coords) - 1):
            a, b = coords[i], coords[i + 1]
            ab = b - a
            denom = float(ab[0] * ab[0] + ab[1] * ab[1])
            if denom == 0.0:
                continue
            t = float(np.dot(p - a, ab) / denom)
            if -1e-12 <= t <= 1.0 + 1e-12:
                proj = a + np.clip(t, 0.0, 1.0) * ab
                if np.hypot(*(p - proj)) <= 1e-9:
                    cuts.append((i, float(np.clip(t, 0.0, 1.0))))
                    break
    if not cuts:
        return [g]
    cuts.sort()
    parts: list[Geometry] = []
    cur = [coords[0]]
    seg_ptr = 0
    for i, t in cuts:
        while seg_ptr < i:
            cur.append(coords[seg_ptr + 1])
            seg_ptr += 1
        cut_pt = coords[i] + t * (coords[i + 1] - coords[i])
        if not np.array_equal(cur[-1], cut_pt):
            cur.append(cut_pt)
        if len(cur) >= 2:
            parts.append(Geometry(GeometryType.LINESTRING, np.array(cur), g.srid))
        cur = [cut_pt]
    while seg_ptr < len(coords) - 1:
        cur.append(coords[seg_ptr + 1])
        seg_ptr += 1
    if len(cur) >= 2:
        parts.append(Geometry(GeometryType.LINESTRING, np.array(cur), g.srid))
    return parts
