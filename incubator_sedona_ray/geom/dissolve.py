"""Dissolve a piecewise (convex-piece) polygon collection into boundary rings.

The boolean kernel (``geom/triangulate.py``) returns exact PIECEWISE results:
a region represented as convex pieces that tile it, overlapping only on
measure-zero shared edges. That representation is exact for area / centroid /
containment, but a user of the reference engine (JTS ``overlayOp``,
``sedona`` ``Functions.java:466,541``) gets dissolved shells + holes. This
module closes that gap with the classic planar-overlay boundary extraction
(public-textbook algorithm, e.g. de Berg et al. ch. 2):

1. snap piece vertices onto a tolerance grid (pieces produced by clipping
   along the same edge may disagree in the last ulps);
2. node every piece edge at all snapped vertices lying on it (T-junctions
   between pieces split into matching sub-edges);
3. cancel opposite directed sub-edges — an edge interior to the region is
   traversed once in each direction by its two adjacent CCW pieces, a
   boundary edge survives with its CCW orientation;
4. chain surviving edges into rings with the clockwise-most-turn rule
   (keeps the interior on the left, so pinch vertices split into simple
   rings), drop collinear noding vertices;
5. rings with positive signed area are shells, negative are holes; each
   hole is attached to the smallest enclosing shell.

The result is a proper ``Polygon`` / ``MultiPolygon`` with holes whose
shoelace area equals the sum of piece areas (identical coordinates, only
interior edges removed).
"""

from __future__ import annotations

import numpy as np

from .core import Geometry, GeometryType
from .ops import ring_area

__all__ = ["dissolve", "dissolve_rings"]


def _snap_vertices(rings: list[np.ndarray], tol: float):
    """Merge nearly-equal vertices across all rings.

    Returns (coords (n,2) float64 of unique snapped vertices, list of rings
    as int index arrays). Near-dup merge checks the 3x3 neighborhood of each
    vertex's tolerance-grid cell, so pairs straddling a cell boundary still
    merge."""
    cell: dict[tuple[int, int], int] = {}
    coords: list[np.ndarray] = []
    out_rings: list[np.ndarray] = []
    inv = 1.0 / tol if tol > 0 else 0.0
    for ring in rings:
        idx = np.empty(len(ring), dtype=np.int64)
        for i, p in enumerate(ring):
            kx, ky = int(np.floor(p[0] * inv)), int(np.floor(p[1] * inv))
            found = -1
            for dx in (0, -1, 1):
                for dy in (0, -1, 1):
                    j = cell.get((kx + dx, ky + dy), -1)
                    if j >= 0 and abs(coords[j][0] - p[0]) <= tol and abs(coords[j][1] - p[1]) <= tol:
                        found = j
                        break
                if found >= 0:
                    break
            if found < 0:
                found = len(coords)
                coords.append(np.asarray(p, dtype=np.float64))
                cell.setdefault((kx, ky), found)
            idx[i] = found
        out_rings.append(idx)
    return (np.asarray(coords) if coords else np.empty((0, 2))), out_rings


def _node_edges(coords: np.ndarray, rings: list[np.ndarray], tol: float):
    """Split every directed ring edge at all other snapped vertices lying on
    it (within tol). Returns a dict (u,v) -> net signed count of directed
    sub-edges."""
    edges: dict[tuple[int, int], int] = {}
    xs, ys = coords[:, 0], coords[:, 1]
    for ring in rings:
        m = len(ring)
        for i in range(m):
            u, v = int(ring[i]), int(ring[(i + 1) % m])
            if u == v:
                continue
            a, b = coords[u], coords[v]
            d = b - a
            L2 = float(d[0] * d[0] + d[1] * d[1])
            # vertices on the open segment (u, v): |cross| small AND 0 < t < 1
            cross = np.abs(d[0] * (ys - a[1]) - d[1] * (xs - a[0]))
            t = ((xs - a[0]) * d[0] + (ys - a[1]) * d[1]) / L2
            on = np.nonzero((cross <= tol * max(np.sqrt(L2), 1.0)) & (t > 1e-12) & (t < 1 - 1e-12))[0]
            chain = [u]
            if len(on):
                order = on[np.argsort(t[on])]
                chain.extend(int(w) for w in order if int(w) != u and int(w) != v)
            chain.append(v)
            for k in range(len(chain) - 1):
                p, q = chain[k], chain[k + 1]
                if p == q:
                    continue
                if p < q:
                    edges[(p, q)] = edges.get((p, q), 0) + 1
                else:
                    edges[(q, p)] = edges.get((q, p), 0) - 1
    return edges


def _chain_rings(coords: np.ndarray, directed: list[tuple[int, int]]) -> list[np.ndarray]:
    """Chain directed boundary edges into closed rings.

    At a junction vertex (degree > 1) take the clockwise-most outgoing edge
    relative to the incoming direction — the standard face-walk rule that
    keeps the region interior on the left and splits pinch vertices into
    simple rings. ``directed`` is a MULTISET: an edge traversed twice in
    the same direction (two loops tangent along it) appears twice and must
    be consumed twice, or Eulerian parity breaks and whole rings drop as
    dead-end chains."""
    out_adj: dict[int, list[int]] = {}
    remaining: dict[tuple[int, int], int] = {}
    for u, v in directed:
        out_adj.setdefault(u, []).append(v)
        remaining[(u, v)] = remaining.get((u, v), 0) + 1
    rings: list[np.ndarray] = []
    for start_edge in directed:
        if remaining.get(start_edge, 0) <= 0:
            continue
        ring_idx = [start_edge[0]]
        u, v = start_edge
        remaining[start_edge] -= 1
        while v != ring_idx[0]:
            ring_idx.append(v)
            cands = [w for w in out_adj.get(v, []) if remaining.get((v, w), 0) > 0]
            if not cands:
                break  # open chain (degenerate input) — drop below
            if len(cands) == 1:
                w = cands[0]
            else:
                # incoming direction u->v; pick the outgoing edge with the
                # LARGEST CCW angle from the reversed incoming direction
                # (sharpest left turn). With interiors on the left this
                # closes each simple loop separately, so pinch vertices
                # yield simple rings instead of figure-eights.
                din = coords[u] - coords[v]
                base = np.arctan2(din[1], din[0])
                best, best_ang = cands[0], -np.inf
                for w2 in cands:
                    dout = coords[w2] - coords[v]
                    # ang ~ 0 = U-turn back along the incoming edge, which the
                    # largest-angle rule naturally ranks last
                    ang = (np.arctan2(dout[1], dout[0]) - base) % (2 * np.pi)
                    if ang > best_ang:
                        best, best_ang = w2, ang
                w = best
            remaining[(v, w)] -= 1
            u, v = v, w
        else:
            rings.append(np.asarray(ring_idx, dtype=np.int64))
            continue
    return rings


def _drop_collinear(ring: np.ndarray) -> np.ndarray:
    """Remove vertices whose adjacent edges are collinear (noding artifacts).
    ring is an open (n,2) coordinate loop."""
    n = len(ring)
    if n < 3:
        return ring
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        a, b, c = ring[(i - 1) % n], ring[i], ring[(i + 1) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if cross == 0.0:
            keep[i] = False
    out = ring[keep]
    return out if len(out) >= 3 else ring


def _ring_is_simple(ring: np.ndarray) -> bool:
    """No edge of the open ring properly crosses, T-touches the interior
    of, or collinearly overlaps another edge. Shared VERTICES are allowed
    (pinch rings self-touch at vertices by construction). Used as the
    validity gate in :func:`dissolve`: genuinely-overlapping input pieces
    chain into self-intersecting rings whose shoelace area still matches
    the (double-counted) piece sum, so the area check alone cannot reject
    them."""
    n = len(ring)
    if n < 4:
        return True
    A = ring
    B = np.vstack([ring[1:], ring[:1]])

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    def strictly_within(px, py, qx, qy, rx, ry):
        # r collinear-with and strictly between p..q (caller checked collinear)
        t = (rx - px) * (qx - px) + (ry - py) * (qy - py)
        L2 = (qx - px) ** 2 + (qy - py) ** 2
        return (t > 0) & (t < L2)

    for i in range(n - 1):
        ax, ay, bx, by = A[i, 0], A[i, 1], B[i, 0], B[i, 1]
        cx, cy = A[i + 1 :, 0], A[i + 1 :, 1]
        dx, dy = B[i + 1 :, 0], B[i + 1 :, 1]
        o1 = orient(ax, ay, bx, by, cx, cy)
        o2 = orient(ax, ay, bx, by, dx, dy)
        o3 = orient(cx, cy, dx, dy, ax, ay)
        o4 = orient(cx, cy, dx, dy, bx, by)
        bad = (o1 * o2 < 0) & (o3 * o4 < 0)
        bad |= (o1 == 0) & strictly_within(ax, ay, bx, by, cx, cy)
        bad |= (o2 == 0) & strictly_within(ax, ay, bx, by, dx, dy)
        bad |= (o3 == 0) & strictly_within(cx, cy, dx, dy, ax, ay)
        bad |= (o4 == 0) & strictly_within(cx, cy, dx, dy, bx, by)
        if bool(bad.any()):
            return False
    return True


def _point_in_ring(p: np.ndarray, ring: np.ndarray) -> bool:
    """Strict even-odd point-in-open-ring test."""
    x, y = p
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xint > x:
                inside = not inside
    return inside


def dissolve_rings(
    piece_rings: list[np.ndarray], tol: float | None = None, oriented: bool = False
) -> Geometry:
    """Dissolve convex-piece rings (open or closed) into a Polygon /
    MultiPolygon with holes. ``tol`` defaults to 1e-9 x the extent.

    With ``oriented=False`` (the piecewise-boolean case) every ring is a
    filled area and is normalized CCW. With ``oriented=True`` ring
    orientation is preserved (CCW = fill, CW = hole), so already-holed
    polygons dissolve correctly."""
    rings = []
    for r in piece_rings:
        r = np.asarray(r, dtype=np.float64).reshape(-1, 2)
        if len(r) >= 2 and r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
            r = r[:-1]
        if len(r) < 3:
            continue
        area = ring_area(np.vstack([r, r[:1]]))
        if area == 0.0:
            continue
        if area < 0 and not oriented:
            r = r[::-1]
        rings.append(r)
    if not rings:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [])
    if tol is None:
        allc = np.vstack(rings)
        extent = max(
            float(allc[:, 0].max() - allc[:, 0].min()),
            float(allc[:, 1].max() - allc[:, 1].min()),
            1.0,
        )
        tol = extent * 1e-9
    coords, iring = _snap_vertices(rings, tol)
    edges = _node_edges(coords, iring, tol)
    directed = []
    for (p, q), c in edges.items():
        if c > 0:
            directed.extend([(p, q)] * c)
        elif c < 0:
            directed.extend([(q, p)] * -c)
    chains = _chain_rings(coords, directed)
    shells: list[np.ndarray] = []
    holes: list[np.ndarray] = []
    for ridx in chains:
        ring = _drop_collinear(coords[ridx])
        if len(ring) < 3:
            continue
        a = ring_area(np.vstack([ring, ring[:1]]))
        if a > 0:
            shells.append(ring)
        elif a < 0:
            holes.append(ring)
    if not shells:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [])
    # attach each hole to the smallest enclosing shell
    shell_holes: list[list[np.ndarray]] = [[] for _ in shells]
    shell_areas = [ring_area(np.vstack([s, s[:1]])) for s in shells]
    for h in holes:
        probe = None
        for v in h:
            hit = [k for k, s in enumerate(shells) if _point_in_ring(v, s)]
            if hit:
                probe = min(hit, key=lambda k: shell_areas[k])
                break
        if probe is None:
            # pinched hole: fall back to bbox containment
            hb = (h[:, 0].min(), h[:, 1].min(), h[:, 0].max(), h[:, 1].max())
            cand = [
                k
                for k, s in enumerate(shells)
                if s[:, 0].min() <= hb[0] and s[:, 1].min() <= hb[1]
                and s[:, 0].max() >= hb[2] and s[:, 1].max() >= hb[3]
            ]
            if not cand:
                continue
            probe = min(cand, key=lambda k: shell_areas[k])
        shell_holes[probe].append(h)
    polys = []
    for s, hs in zip(shells, shell_holes):
        rings_out = [np.vstack([s, s[:1]])]
        rings_out.extend(np.vstack([h, h[:1]]) for h in hs)
        polys.append(rings_out)
    if len(polys) == 1:
        return Geometry(GeometryType.POLYGON, polys[0])
    return Geometry(GeometryType.MULTIPOLYGON, polys)


def dissolve(g: Geometry, tol: float | None = None) -> Geometry:
    """Dissolve a piecewise Polygon/MultiPolygon/GeometryCollection into
    boundary rings; non-areal geometries pass through unchanged.

    Self-checking: if the dissolved area deviates from the piece-area sum by
    more than 1e-6 relative (pathological input — e.g. self-intersecting or
    genuinely overlapping pieces), the exact piecewise input is returned
    unchanged rather than a wrong dissolved shape."""
    if g.is_empty:
        return g
    rings = []
    piece_area = 0.0
    for part in g.parts():
        if part.kind != GeometryType.POLYGON:
            return g
        for i, ring in enumerate(part.coords):
            r = np.asarray(ring, dtype=np.float64)
            a = ring_area(r if (len(r) >= 2 and np.array_equal(r[0], r[-1])) else np.vstack([r, r[:1]]))
            # shell rings CCW, hole rings CW (interior-on-the-left convention)
            if (i == 0 and a < 0) or (i > 0 and a > 0):
                r = r[::-1]
            piece_area += abs(a) if i == 0 else -abs(a)
            rings.append(r)
    out = dissolve_rings(rings, tol=tol, oriented=True)
    out_area = 0.0
    for part in out.parts():
        if part.kind == GeometryType.POLYGON:
            for i, ring in enumerate(part.coords):
                a = ring_area(np.asarray(ring))
                out_area += abs(a) if i == 0 else -abs(a)
    if abs(out_area - piece_area) > 1e-6 * max(abs(piece_area), 1e-12):
        return g
    for part in out.parts():
        if part.kind == GeometryType.POLYGON:
            for ring in part.coords:
                r = np.asarray(ring, dtype=np.float64)
                if len(r) >= 2 and np.array_equal(r[0], r[-1]):
                    r = r[:-1]
                if not _ring_is_simple(r):
                    return g
    out.srid = g.srid
    return out
