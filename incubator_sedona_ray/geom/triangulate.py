"""Ear-clipping triangulation + general polygon intersection.

Removes the "convex operands only" limit on ST_Intersection without a GEOS
kernel: any SIMPLE polygon (no self-intersections; holes unsupported —
documented) triangulates by ear clipping (public textbook algorithm,
O(n^2)); the intersection of two polygons is then the collection of
pairwise triangle∩triangle convex clips — an exact, possibly-undissolved
piecewise representation of the intersection region. Area / centroid /
containment on the piece set equal those of the dissolved region (pieces
overlap only on measure-zero edges).

``intersection_aggr`` folds: clipping convex pieces against the next
polygon's triangles keeps every piece convex, so the fold stays exact.
"""

from __future__ import annotations

import numpy as np

from .core import Geometry, GeometryType
from .linear import clip_convex
from .ops import ring_area


def _merge_hole(shell: np.ndarray, hole: np.ndarray) -> np.ndarray:
    """Bridge a CW hole into a CCW shell ring (Eberly, 'Triangulation by
    Ear Clipping' §5 — standard public algorithm): find the hole's max-x
    vertex M, shoot a +x ray to the nearest shell edge, pick a mutually
    visible shell vertex P, and splice the hole in with a doubled bridge
    edge P->M ... M->P. The result is a weakly-simple ring ear-clipping
    handles."""
    mi = int(np.argmax(hole[:, 0]))
    mx, my = float(hole[mi, 0]), float(hole[mi, 1])
    n = len(shell)
    best_t = np.inf
    best_edge = -1
    best_ix = np.inf
    for i in range(n):
        x1, y1 = shell[i]
        x2, y2 = shell[(i + 1) % n]
        if (y1 > my) == (y2 > my):
            if y1 != my or y2 != my:
                continue
            # horizontal edge at ray height: nearest endpoint to the right
            for xe in (x1, x2):
                if xe >= mx and xe - mx < best_t:
                    best_t, best_edge, best_ix = xe - mx, i, xe
            continue
        xint = x1 + (my - y1) * (x2 - x1) / (y2 - y1)
        if xint >= mx and xint - mx < best_t:
            best_t, best_edge, best_ix = xint - mx, i, xint
    if best_edge < 0:  # hole outside shell (invalid input) — skip the hole
        return shell
    i1, i2 = best_edge, (best_edge + 1) % n
    # candidate visible vertex: the intersected edge's endpoint with max x
    p_idx = i1 if shell[i1, 0] > shell[i2, 0] else i2
    if shell[i1, 1] == my and shell[i1, 0] == best_ix:
        p_idx = i1
    elif shell[i2, 1] == my and shell[i2, 0] == best_ix:
        p_idx = i2
    else:
        # any reflex shell vertex strictly inside triangle (M, I, P) blocks
        # visibility; choose the blocking vertex with the smallest angle to
        # the +x ray (ties: nearest) — Eberly's rule
        M = np.array([mx, my])
        I = np.array([best_ix, my])
        P = shell[p_idx]
        best_tan = np.inf
        best_d = np.inf
        for j in range(n):
            if j == p_idx:
                continue
            v = shell[j]
            if _in_triangle(v, M, I, P) or _in_triangle(v, M, P, I):
                dx = v[0] - mx
                if dx <= 0:
                    continue
                tan = abs(v[1] - my) / dx
                d = np.hypot(dx, v[1] - my)
                if tan < best_tan or (tan == best_tan and d < best_d):
                    best_tan, best_d, p_idx = tan, d, j
    # splice: shell[0..p], hole[m..], hole[..m], shell[p..]
    rolled = np.vstack([hole[mi:], hole[:mi + 1]])  # starts and ends at M
    return np.vstack([shell[: p_idx + 1], rolled, shell[p_idx:]])


def triangulate(poly: Geometry) -> list[np.ndarray]:
    """Polygon (holes supported via bridge-edge insertion) -> list of
    (3, 2) triangles."""
    if poly.kind != GeometryType.POLYGON:
        raise ValueError("triangulate needs a Polygon")
    ring = np.asarray(poly.coords[0], dtype=np.float64)[:-1]  # open ring
    if ring_area(np.vstack([ring, ring[:1]])) < 0:
        ring = ring[::-1]  # enforce CCW shell
    holes = []
    for h in poly.coords[1:]:
        hr = np.asarray(h, dtype=np.float64)[:-1]
        if len(hr) < 3:
            continue
        if ring_area(np.vstack([hr, hr[:1]])) > 0:
            hr = hr[::-1]  # enforce CW holes
        holes.append(hr)
    # merge holes right-to-left (max-x first) so bridges never cross
    for hr in sorted(holes, key=lambda h: -float(h[:, 0].max())):
        ring = _merge_hole(ring, hr)
    idx = list(range(len(ring)))
    tris: list[np.ndarray] = []
    # relative epsilon (area units): a cross product below eps is treated as
    # collinear. Near-collinear vertex chains (common in angular-sampled
    # polygons) otherwise pass the exact convexity test while a just-outside
    # blocking vertex fails the exact containment test, yielding overlapping
    # ears.
    span = float(max(ring[:, 0].ptp(), ring[:, 1].ptp(), 1.0))
    eps = span * span * 1e-12
    guard = 0
    while len(idx) > 3 and guard < 10000:
        guard += 1
        n = len(idx)
        ear_found = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = ring[i0], ring[i1], ring[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross <= eps:
                continue  # reflex, degenerate or numerically-unsafe vertex
            # no other active vertex (nearly) inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                if _in_triangle(ring[j], a, b, c, eps):
                    ok = False
                    break
            if ok:
                tris.append(np.array([a, b, c]))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:
            # numerically degenerate remainder: every remaining vertex is
            # within eps of collinear — the residual area is O(eps)
            break
    if len(idx) == 3:
        a, b, c = ring[idx[0]], ring[idx[1]], ring[idx[2]]
        if abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) > 0:
            tris.append(np.array([a, b, c]))
    return tris


def _in_triangle(p, a, b, c, eps: float = 0.0) -> bool:
    """CLOSED-triangle membership (boundary counts, within eps): a vertex
    lying (nearly) on a candidate ear's edge (e.g. a reflex vertex on the
    diagonal) must BLOCK the ear, or the remainder ring self-overlaps."""
    for q in (a, b, c):
        if p[0] == q[0] and p[1] == q[1]:
            return False  # coincident with an ear corner -> doesn't block
    d1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    d2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
    d3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
    return d1 >= -eps and d2 >= -eps and d3 >= -eps


def _is_convex_ring(ring: np.ndarray) -> bool:
    v = np.diff(ring, axis=0)
    cross = v[:-1, 0] * v[1:, 1] - v[:-1, 1] * v[1:, 0]
    nz = cross[cross != 0]
    return bool(len(nz) == 0 or (nz > 0).all() or (nz < 0).all())


def _convex_pieces(g: Geometry) -> list[Geometry]:
    """Polygon/MultiPolygon -> list of convex polygon pieces."""
    pieces = []
    for part in g.parts():
        if part.kind != GeometryType.POLYGON:
            continue
        ring = np.asarray(part.coords[0], dtype=np.float64)
        if len(part.coords) == 1 and _is_convex_ring(ring):
            pieces.append(part)
        else:
            pieces.extend(Geometry.polygon(t) for t in triangulate(part))
    return pieces


def intersection(a: Geometry, b: Geometry) -> Geometry:
    """General polygon∩polygon as an exact piecewise MultiPolygon (convex
    pieces; not dissolved — correct for area/centroid/containment)."""
    out = []
    for pa_ in _convex_pieces(a):
        for pb in _convex_pieces(b):
            clipped = clip_convex(pa_, pb)
            if not clipped.is_empty and clipped.kind == GeometryType.POLYGON:
                out.append(clipped.coords)
    if not out:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [])
    if len(out) == 1:
        return Geometry(GeometryType.POLYGON, out[0])
    return Geometry(GeometryType.MULTIPOLYGON, out)


def intersection_aggr(geoms: list[Geometry]) -> Geometry:
    """ST_Intersection_Aggr (``AggregateFunctions.scala``): fold of
    intersections. Pieces stay convex, so each step is a convex clip."""
    if not geoms:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [])
    acc = _convex_pieces(geoms[0])
    for g in geoms[1:]:
        nxt = []
        for piece in acc:
            for pb in _convex_pieces(g):
                clipped = clip_convex(piece, pb)
                if not clipped.is_empty and clipped.kind == GeometryType.POLYGON:
                    nxt.append(clipped)
        acc = nxt
        if not acc:
            return Geometry(GeometryType.GEOMETRYCOLLECTION, [])
    if len(acc) == 1:
        return acc[0]
    return Geometry(GeometryType.MULTIPOLYGON, [p.coords for p in acc])


# ---------------------------------------------------------------------------
# difference / union / symDifference via half-plane decomposition
# ---------------------------------------------------------------------------

def _clip_halfplane(ring: np.ndarray, a, b, keep_left: bool) -> np.ndarray:
    """Clip an open convex ring against the half-plane of directed edge a->b
    (keep_left=True keeps the left side). Returns open ring (may be empty)."""
    n = len(ring)
    sign = 1.0 if keep_left else -1.0
    s = sign * ((b[0] - a[0]) * (ring[:, 1] - a[1]) - (b[1] - a[1]) * (ring[:, 0] - a[0]))
    inside = s >= 0
    if inside.all():
        return ring
    if not inside.any():
        return np.empty((0, 2))
    out = []
    for j in range(n):
        jn = (j + 1) % n
        if inside[j]:
            out.append(ring[j])
        if inside[j] != inside[jn]:
            t = s[j] / (s[j] - s[jn])
            out.append(ring[j] + t * (ring[jn] - ring[j]))
    return np.asarray(out) if len(out) >= 3 else np.empty((0, 2))


def convex_difference(piece: Geometry, clip: Geometry) -> list[Geometry]:
    """piece \\ clip for CONVEX polygons, as a list of convex pieces:
    standard decomposition — for clip edge i, the part of ``piece`` inside
    edges 0..i-1 but OUTSIDE edge i is one convex piece."""
    pring = np.asarray(piece.coords[0], dtype=np.float64)[:-1]
    cring = np.asarray(clip.coords[0], dtype=np.float64)
    if ring_area(np.vstack([cring[:-1], cring[:1]]) if not np.array_equal(cring[0], cring[-1]) else cring) < 0:
        cring = cring[::-1]
    out = []
    current = pring  # region of piece inside all previously-processed edges
    for i in range(len(cring) - 1):
        a, b = cring[i], cring[i + 1]
        if a[0] == b[0] and a[1] == b[1]:
            # zero-length clip edge (duplicate vertex, common in clip rings
            # that are themselves fragments): no half-plane — skipping it
            # is mandatory, else side() is identically 0 and the whole
            # remainder is emitted as outside AND kept in current
            continue
        outside = _clip_halfplane(current, a, b, keep_left=False)
        if len(outside) >= 3:
            out.append(Geometry.polygon(outside))
        current = _clip_halfplane(current, a, b, keep_left=True)
        if len(current) < 3:
            break
    return out


def _piece_bbox(p: Geometry) -> tuple[float, float, float, float]:
    bb = getattr(p, "_piece_bbox_cache", None)
    if bb is None:
        r = np.asarray(p.coords[0], dtype=np.float64)
        bb = (float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max()))
        p._piece_bbox_cache = bb
    return bb


def _pieces_minus(pieces: list[Geometry], clip_pieces: list[Geometry]) -> list[Geometry]:
    # bbox fast-skip: a piece whose envelope is disjoint from the clip
    # piece's survives the convex difference unchanged. Turns the fold from
    # all-pairs into locally-overlapping pairs (critical for long piece
    # chains, e.g. buffer decompositions).
    boxes = [_piece_bbox(p) for p in pieces]
    for c in clip_pieces:
        c0, c1, c2, c3 = _piece_bbox(c)
        nxt: list[Geometry] = []
        nboxes: list[tuple[float, float, float, float]] = []
        for p, b in zip(pieces, boxes):
            if b[2] < c0 or b[0] > c2 or b[3] < c1 or b[1] > c3:
                nxt.append(p)
                nboxes.append(b)
                continue
            frags = convex_difference(p, c)
            nxt.extend(frags)
            nboxes.extend(_piece_bbox(f) for f in frags)
        pieces, boxes = nxt, nboxes
        if not pieces:
            break
    return pieces


def _pieces_minus_filtered(
    pieces: list[Geometry], clip_pieces: list[Geometry], eps_area: float
) -> list[Geometry]:
    """Like :func:`_pieces_minus` but drops fragments below ``eps_area``
    after EVERY clip step. Not exact (area shrinks by O(eps_area) per
    step) — used by the buffer fold, where slivers far below the arc
    discretization error otherwise multiply fragment counts
    combinatorially. The exact kernels keep using ``_pieces_minus``."""
    boxes = [_piece_bbox(p) for p in pieces]
    for c in clip_pieces:
        c0, c1, c2, c3 = _piece_bbox(c)
        nxt: list[Geometry] = []
        nboxes: list[tuple[float, float, float, float]] = []
        for p, b in zip(pieces, boxes):
            if b[2] < c0 or b[0] > c2 or b[3] < c1 or b[1] > c3:
                nxt.append(p)
                nboxes.append(b)
                continue
            for f in convex_difference(p, c):
                if abs(ring_area(np.asarray(f.coords[0], dtype=np.float64))) > eps_area:
                    nxt.append(f)
                    nboxes.append(_piece_bbox(f))
        pieces, boxes = nxt, nboxes
        if not pieces:
            break
    return pieces


def _as_geom(pieces: list[Geometry]) -> Geometry:
    pieces = [p for p in pieces if not p.is_empty]
    if not pieces:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [])
    if len(pieces) == 1:
        return pieces[0]
    return Geometry(GeometryType.MULTIPOLYGON, [p.coords for p in pieces])


def difference(a: Geometry, b: Geometry) -> Geometry:
    """A \\ B, exact piecewise (convex pieces)."""
    return _as_geom(_pieces_minus(_convex_pieces(a), _convex_pieces(b)))


def union(a: Geometry, b: Geometry) -> Geometry:
    """A ∪ B = pieces(A) + (pieces(B) \\ A), exact piecewise."""
    return _as_geom(_convex_pieces(a) + _pieces_minus(_convex_pieces(b), _convex_pieces(a)))


def sym_difference(a: Geometry, b: Geometry) -> Geometry:
    pa_, pb = _convex_pieces(a), _convex_pieces(b)
    return _as_geom(_pieces_minus(pa_, pb) + _pieces_minus(pb, pa_))


def union_aggr_general(geoms: list[Geometry]) -> Geometry:
    """ST_Union_Aggr for possibly-OVERLAPPING polygons, exact piecewise fold."""
    acc: list[Geometry] = []
    for g in geoms:
        acc = acc + _pieces_minus(_convex_pieces(g), acc)
    return _as_geom(acc)
