"""Mixed-dimension boolean overlay (points x lines x polygons and
GeometryCollections of them).

The reference's JTS overlay handles heterogeneous and collection operands
natively (``common/.../Functions.java:466,641`` — ST_Intersection /
ST_Union accept any geometry pair). The engine's pure-polygon kernels
live in :mod:`.triangulate` / :mod:`.dissolve`; this module adds the
dimension dispatch on top:

* operands are decomposed into (points, lines, polygons) components
* polygon x polygon uses the existing convex-clip / ear-clip kernels
* line x polygon clips polylines at polygon edges and classifies piece
  midpoints (even-odd with holes)
* line x line extracts collinear overlap segments + crossing points
* points locate against everything else
* the result is re-homogenized with OverlayNG's dimension rule: a piece
  is dropped when a higher-dimension result piece already covers it

Everything here is per-pair driver/kernel code — Datasets never carry
Geometry objects; join/aggregate stages call these inside map_batches
group kernels only for rows the vectorized fast paths can't take.
"""

from __future__ import annotations

import numpy as np

from .core import Geometry, GeometryType
from .predicates import EXTERIOR, locate_points_in_geometry

_EPS = 1e-9


# ---------------------------------------------------------------------------
# decomposition / assembly
# ---------------------------------------------------------------------------


def _decompose(g: Geometry):
    """Geometry -> (points (n,2), lines [(k,2)...], polys [rings...]).

    ``polys`` is a list of ring-lists (shell + holes), i.e. MultiPolygon
    coords layout."""
    pts: list[np.ndarray] = []
    lines: list[np.ndarray] = []
    polys: list[list[np.ndarray]] = []
    stack = [g]
    while stack:
        cur = stack.pop()
        if cur is None or cur.is_empty:
            continue
        k = cur.kind
        if k == GeometryType.POINT:
            pts.append(np.asarray(cur.coords, dtype=np.float64).reshape(1, -1)[:, :2])
        elif k == GeometryType.MULTIPOINT:
            pts.append(np.asarray(cur.coords, dtype=np.float64).reshape(-1, 2))
        elif k == GeometryType.LINESTRING:
            lines.append(np.asarray(cur.coords, dtype=np.float64)[:, :2])
        elif k == GeometryType.MULTILINESTRING:
            lines.extend(np.asarray(l, dtype=np.float64)[:, :2] for l in cur.coords if len(l) >= 2)
        elif k == GeometryType.POLYGON:
            polys.append([np.asarray(r, dtype=np.float64)[:, :2] for r in cur.coords])
        elif k == GeometryType.MULTIPOLYGON:
            polys.extend([[np.asarray(r, dtype=np.float64)[:, :2] for r in poly] for poly in cur.coords])
        elif k == GeometryType.GEOMETRYCOLLECTION:
            stack.extend(cur.coords)
        else:
            raise ValueError(f"unknown geometry kind {k!r}")
    p = np.concatenate(pts) if pts else np.empty((0, 2))
    return p, lines, polys


def _poly_geom(polys: list[list[np.ndarray]], srid: int) -> Geometry | None:
    if not polys:
        return None
    if len(polys) == 1:
        return Geometry(GeometryType.POLYGON, polys[0], srid)
    return Geometry(GeometryType.MULTIPOLYGON, polys, srid)


def _assemble(pts: np.ndarray, lines: list[np.ndarray], polys: list[list[np.ndarray]], srid: int) -> Geometry:
    members: list[Geometry] = []
    if polys:
        members.append(_poly_geom(polys, srid))
    if lines:
        if len(lines) == 1:
            members.append(Geometry(GeometryType.LINESTRING, lines[0], srid))
        else:
            members.append(Geometry(GeometryType.MULTILINESTRING, lines, srid))
    if len(pts):
        if len(pts) == 1:
            members.append(Geometry(GeometryType.POINT, pts[0], srid))
        else:
            members.append(Geometry(GeometryType.MULTIPOINT, pts, srid))
    if not members:
        return Geometry(GeometryType.GEOMETRYCOLLECTION, [], srid)
    if len(members) == 1:
        return members[0]
    return Geometry(GeometryType.GEOMETRYCOLLECTION, members, srid)


# ---------------------------------------------------------------------------
# primitive kernels
# ---------------------------------------------------------------------------


def _locate_vs_polys(pts: np.ndarray, polys: list[list[np.ndarray]]) -> np.ndarray:
    """EXTERIOR/BOUNDARY/INTERIOR of each point vs the union of polygons."""
    if not len(pts):
        return np.empty(0, dtype=np.int8)
    loc = np.full(len(pts), EXTERIOR, dtype=np.int8)
    for rings in polys:
        loc = np.maximum(loc, locate_points_in_geometry(pts[:, 0], pts[:, 1], Geometry(GeometryType.POLYGON, rings)))
    return loc


def _pts_on_lines(pts: np.ndarray, lines: list[np.ndarray], eps: float = _EPS) -> np.ndarray:
    """Bool mask: point lies on any of the polylines."""
    if not len(pts):
        return np.zeros(0, dtype=bool)
    on = np.zeros(len(pts), dtype=bool)
    for line in lines:
        a = line[:-1]
        b = line[1:]
        ab = b - a  # (m, 2)
        denom = (ab * ab).sum(axis=1)  # (m,)
        ap = pts[:, None, :] - a[None, :, :]  # (n, m, 2)
        t = np.where(denom > 0, (ap * ab[None, :, :]).sum(axis=2) / np.where(denom > 0, denom, 1.0), 0.0)
        t = np.clip(t, 0.0, 1.0)
        proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
        d2 = ((pts[:, None, :] - proj) ** 2).sum(axis=2)
        on |= (d2 <= eps * eps).any(axis=1)
    return on


def _dedup_points(pts: np.ndarray, eps: float = _EPS) -> np.ndarray:
    if len(pts) <= 1:
        return pts
    key = np.round(pts / max(eps, 1e-12)).astype(np.int64)
    _, idx = np.unique(key, axis=0, return_index=True)
    return pts[np.sort(idx)]


def _poly_edges(polys: list[list[np.ndarray]]) -> np.ndarray:
    """(m, 4) x1 y1 x2 y2 edges of all rings."""
    segs = []
    for rings in polys:
        for r in rings:
            segs.append(np.concatenate([r[:-1], r[1:]], axis=1))
    return np.concatenate(segs) if segs else np.empty((0, 4))


def _line_edges(lines: list[np.ndarray]) -> np.ndarray:
    segs = [np.concatenate([l[:-1], l[1:]], axis=1) for l in lines if len(l) >= 2]
    return np.concatenate(segs) if segs else np.empty((0, 4))


def _split_ts(a: np.ndarray, b: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Parameters t in (0,1) where segment a->b crosses/touches any edge,
    including collinear-overlap endpoints (vectorized over edges)."""
    if not len(edges):
        return np.empty(0)
    d = b - a  # (2,)
    e1 = edges[:, 0:2]
    e2 = edges[:, 2:4]
    de = e2 - e1  # (m, 2)
    denom = d[0] * de[:, 1] - d[1] * de[:, 0]  # cross(d, de)
    w = e1 - a  # (m, 2)
    ts: list[np.ndarray] = []
    # proper / touching crossings
    nz = denom != 0
    if nz.any():
        t = (w[nz, 0] * de[nz, 1] - w[nz, 1] * de[nz, 0]) / denom[nz]
        u = (w[nz, 0] * d[1] - w[nz, 1] * d[0]) / denom[nz]
        ok = (t > _EPS) & (t < 1 - _EPS) & (u >= -_EPS) & (u <= 1 + _EPS)
        ts.append(t[ok])
    # collinear overlaps: project edge endpoints onto the segment
    dd = float(d @ d)
    if dd > 0:
        para = ~nz
        if para.any():
            cross_w = w[para, 0] * d[1] - w[para, 1] * d[0]
            col = np.abs(cross_w) <= _EPS * np.sqrt(dd)
            if col.any():
                sel = np.nonzero(para)[0][col]
                t1 = ((e1[sel] - a) @ d) / dd
                t2 = ((e2[sel] - a) @ d) / dd
                tt = np.concatenate([t1, t2])
                ts.append(tt[(tt > _EPS) & (tt < 1 - _EPS)])
    return np.concatenate(ts) if ts else np.empty(0)


def _clip_lines_vs_polys(
    lines: list[np.ndarray], polys: list[list[np.ndarray]], keep: str
) -> list[np.ndarray]:
    """Split polylines at polygon edges; keep pieces whose midpoint is
    inside/boundary (``keep='in'``) or strictly outside (``keep='out'``)
    the polygon union. Adjacent kept pieces are re-chained."""
    if not lines:
        return []
    if not polys:
        return [l.copy() for l in lines] if keep == "out" else []
    edges = _poly_edges(polys)
    out: list[np.ndarray] = []
    for line in lines:
        pieces: list[np.ndarray] = []
        chain: list[np.ndarray] = []  # growing vertex chain of kept pieces
        for i in range(len(line) - 1):
            a, b = line[i], line[i + 1]
            if not np.any(a != b):
                continue
            ts = np.unique(np.concatenate([[0.0, 1.0], _split_ts(a, b, edges)]))
            ts.sort()
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= _EPS:
                    continue
                p0 = a + t0 * (b - a)
                p1 = a + t1 * (b - a)
                mid = (p0 + p1) / 2.0
                loc = _locate_vs_polys(mid.reshape(1, 2), polys)[0]
                keep_piece = (loc != EXTERIOR) if keep == "in" else (loc == EXTERIOR)
                if keep_piece:
                    if chain and np.allclose(chain[-1], p0, atol=_EPS):
                        chain.append(p1)
                    else:
                        if len(chain) >= 2:
                            pieces.append(np.asarray(chain))
                        chain = [p0, p1]
                else:
                    if len(chain) >= 2:
                        pieces.append(np.asarray(chain))
                    chain = []
        if len(chain) >= 2:
            pieces.append(np.asarray(chain))
        out.extend(pieces)
    return out


def _collinear_overlap_1d(a0, a1, b0, b1, d, dd):
    """Overlap interval of collinear segments as params on a0->a1."""
    t0 = float((b0 - a0) @ d) / dd
    t1 = float((b1 - a0) @ d) / dd
    lo, hi = max(0.0, min(t0, t1)), min(1.0, max(t0, t1))
    return (lo, hi) if hi - lo > _EPS else None


def _line_line_parts(lines_a: list[np.ndarray], lines_b: list[np.ndarray]):
    """(overlap_segments, crossing_points) between two polyline sets."""
    segs_b = _line_edges(lines_b)
    overlaps: list[np.ndarray] = []
    pts: list[np.ndarray] = []
    if not len(segs_b):
        return overlaps, np.empty((0, 2))
    for line in lines_a:
        for i in range(len(line) - 1):
            a, b = line[i], line[i + 1]
            d = b - a
            dd = float(d @ d)
            if dd == 0:
                continue
            e1, e2 = segs_b[:, 0:2], segs_b[:, 2:4]
            de = e2 - e1
            denom = d[0] * de[:, 1] - d[1] * de[:, 0]
            w = e1 - a
            nz = denom != 0
            if nz.any():
                t = (w[nz, 0] * de[nz, 1] - w[nz, 1] * de[nz, 0]) / denom[nz]
                u = (w[nz, 0] * d[1] - w[nz, 1] * d[0]) / denom[nz]
                ok = (t >= -_EPS) & (t <= 1 + _EPS) & (u >= -_EPS) & (u <= 1 + _EPS)
                if ok.any():
                    pts.append(a + np.clip(t[ok], 0, 1)[:, None] * d)
            para = ~nz
            if para.any():
                cross_w = w[para, 0] * d[1] - w[para, 1] * d[0]
                col = np.abs(cross_w) <= _EPS * np.sqrt(dd)
                if col.any():
                    sel = np.nonzero(para)[0][col]
                    for j in sel:
                        ov = _collinear_overlap_1d(a, b, e1[j], e2[j], d, dd)
                        if ov is not None:
                            overlaps.append(np.stack([a + ov[0] * d, a + ov[1] * d]))
    p = np.concatenate(pts) if pts else np.empty((0, 2))
    if len(p) and overlaps:
        p = p[~_pts_on_lines(p, overlaps)]
    return overlaps, _dedup_points(p)


def _lines_minus_lines(lines_a: list[np.ndarray], lines_b: list[np.ndarray]) -> list[np.ndarray]:
    """Remove from ``lines_a`` every collinear-overlap interval shared with
    ``lines_b`` (crossing points have measure zero and are kept)."""
    segs_b = _line_edges(lines_b)
    if not len(segs_b):
        return [l.copy() for l in lines_a]
    out: list[np.ndarray] = []
    for line in lines_a:
        chain: list[np.ndarray] = []
        for i in range(len(line) - 1):
            a, b = line[i], line[i + 1]
            d = b - a
            dd = float(d @ d)
            if dd == 0:
                continue
            ivals = []
            e1, e2 = segs_b[:, 0:2], segs_b[:, 2:4]
            de = e2 - e1
            denom = d[0] * de[:, 1] - d[1] * de[:, 0]
            w = e1 - a
            para = denom == 0
            cross_w = w[:, 0] * d[1] - w[:, 1] * d[0]
            col = para & (np.abs(cross_w) <= _EPS * np.sqrt(dd))
            for j in np.nonzero(col)[0]:
                ov = _collinear_overlap_1d(a, b, e1[j], e2[j], d, dd)
                if ov is not None:
                    ivals.append(ov)
            ivals.sort()
            # walk the kept complement of the merged intervals
            cur = 0.0
            kept: list[tuple[float, float]] = []
            for lo, hi in ivals:
                if lo - cur > _EPS:
                    kept.append((cur, lo))
                cur = max(cur, hi)
            if 1.0 - cur > _EPS:
                kept.append((cur, 1.0))
            for lo, hi in kept:
                p0, p1 = a + lo * d, a + hi * d
                if chain and np.allclose(chain[-1], p0, atol=_EPS):
                    chain.append(p1)
                else:
                    if len(chain) >= 2:
                        out.append(np.asarray(chain))
                    chain = [p0, p1]
            if ivals and (not kept or kept[-1][1] < 1.0 - _EPS):
                if len(chain) >= 2:
                    out.append(np.asarray(chain))
                chain = []
        if len(chain) >= 2:
            out.append(np.asarray(chain))
    return out


# ---------------------------------------------------------------------------
# polygon x polygon via the existing kernels
# ---------------------------------------------------------------------------


def _poly_overlay(pa_: list[list[np.ndarray]], pb: list[list[np.ndarray]], op: str, srid: int):
    """Polygonal pieces of the result, as a list of ring-lists."""
    from . import triangulate as _tri
    from .dissolve import dissolve as _dis

    ga, gb = _poly_geom(pa_, srid), _poly_geom(pb, srid)
    if op == "intersection":
        if ga is None or gb is None:
            return []
        res = _dis(_tri.intersection(ga, gb))
    elif op == "union":
        if ga is None:
            return pb
        if gb is None:
            return pa_
        res = _dis(_tri.union(ga, gb))
    elif op == "difference":
        if ga is None:
            return []
        if gb is None:
            return pa_
        res = _dis(_tri.difference(ga, gb))
    else:  # sym_difference
        if ga is None:
            return pb
        if gb is None:
            return pa_
        res = _dis(_tri.sym_difference(ga, gb))
    if res is None or res.is_empty:
        return []
    _, _, polys = _decompose(res)
    return polys


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _is_pure_polygonal(g: Geometry) -> bool:
    return g.kind in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON)


def overlay(a: Geometry, b: Geometry, op: str) -> Geometry:
    """JTS-semantics boolean overlay for arbitrary (incl. mixed-dimension
    and GeometryCollection) operands. ``op`` in intersection / union /
    difference / sym_difference."""
    srid = a.srid or b.srid
    ap, al, ag = _decompose(a)
    bp, bl, bg = _decompose(b)

    if op == "sym_difference":
        left = overlay(a, b, "difference")
        right = overlay(b, a, "difference")
        return overlay(left, right, "union")

    if op == "intersection":
        polys = _poly_overlay(ag, bg, "intersection", srid)
        lines = _clip_lines_vs_polys(al, bg, "in") + _clip_lines_vs_polys(bl, ag, "in")
        ll_over, ll_pts = _line_line_parts(al, bl)
        lines += ll_over
        pts = []
        if len(ap):
            keep = np.zeros(len(ap), dtype=bool)
            if bg:
                keep |= _locate_vs_polys(ap, bg) != EXTERIOR
            if bl:
                keep |= _pts_on_lines(ap, bl)
            if len(bp):
                keep |= (np.abs(ap[:, None, :] - bp[None, :, :]).max(axis=2) <= _EPS).any(axis=1)
            pts.append(ap[keep])
        if len(bp):
            keep = np.zeros(len(bp), dtype=bool)
            if ag:
                keep |= _locate_vs_polys(bp, ag) != EXTERIOR
            if al:
                keep |= _pts_on_lines(bp, al)
            pts.append(bp[keep])
        if len(ll_pts):
            pts.append(ll_pts)
        p = _dedup_points(np.concatenate(pts) if pts else np.empty((0, 2)))
    elif op == "union":
        polys = _poly_overlay(ag, bg, "union", srid)
        # lines outside the polygonal union; dedup overlap between the sets
        lines = _clip_lines_vs_polys(al + _lines_minus_lines(bl, al), polys, "out")
        p = np.concatenate([ap, bp]) if len(ap) or len(bp) else np.empty((0, 2))
        p = _dedup_points(p)
    elif op == "difference":
        polys = _poly_overlay(ag, bg, "difference", srid)
        lines = _lines_minus_lines(_clip_lines_vs_polys(al, bg, "out"), bl)
        p = ap
        if len(p):
            drop = np.zeros(len(p), dtype=bool)
            if bg:
                drop |= _locate_vs_polys(p, bg) != EXTERIOR
            if bl:
                drop |= _pts_on_lines(p, bl)
            if len(bp):
                drop |= (np.abs(p[:, None, :] - bp[None, :, :]).max(axis=2) <= _EPS).any(axis=1)
            p = p[~drop]
    else:
        raise ValueError(f"unknown overlay op {op!r}")

    # homogenize: drop lower-dim pieces covered by higher-dim result pieces
    # (partial coverage keeps the uncovered remainder, as in OverlayNG)
    if lines and polys:
        lines = _clip_lines_vs_polys(lines, polys, "out")
    if len(p):
        drop = np.zeros(len(p), dtype=bool)
        if polys:
            drop |= _locate_vs_polys(p, polys) != EXTERIOR
        if lines:
            drop |= _pts_on_lines(p, lines)
        p = p[~drop]
    return _assemble(p, lines, polys, srid)
