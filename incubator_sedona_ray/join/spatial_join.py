"""Partitioned spatial join — the engine's heart.

Ray-Data translation of ``JoinQuery.spatialJoin`` (``core/.../spatialOperator/
JoinQuery.java:527-581``) per SURVEY.md §3.1: instead of Spark's
``zipPartitions`` over two co-partitioned RDDs, both sides are normalized to
a common slim schema, tagged with ``__side``, assigned exploded ``part_id``
columns from ONE fitted partitioner (boundary duplication), unioned, and
shuffled ONCE with ``groupby("part_id")``; each group runs a local
STRtree-index join (``RightIndexLookupJudgement`` envelope-candidates ->
exact-predicate refine, ``JudgementBase.java:205-246``) followed by the
reference-point dedup (``DuplicatesFilter.java:46-67`` /
``GeomUtils.isDuplicate:327-350``) evaluated against the group's own
half-open extent — so no second dedup shuffle is needed.

Distance joins follow ``JoinQuery.DistanceJoinQuery`` (``JoinQuery.java:
332-520``): the left side acts as CircleRDD (envelope expanded by the
radius, treated as non-point for dedup), refine is ``distance(l, r) <= r``.

Scale notes: driver state is O(sample + leaves); the single groupby is the
only all-to-all; callers should project payload columns away and re-attach
by key afterwards (SURVEY.md §7.3 wide-row rule). Output is streamed blocks,
never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..conf import DEFAULT_CONF, SpatialConf
from ..state.blocks import safe_hash_join as _safe_hash_join
from ..geom import wkb as _wkb
from ..geom.core import Geometry, GeometryType
from ..geom import ops as _ops
from ..geom import predicates as P
from ..geom.strtree import STRtree
from ..partition.assign import resolve_ref
from ..partition.base import pad_boundary
from ..partition.kdb import KDBTree
from ..partition.quadtree import QuadTree, equal_grid

_POINT_FALSE = {"contains", "covers", "equals", "overlaps", "crosses"}  # poly can't be inside a point


def _side_fields(tbl, geom, radius: float = 0.0, circle: bool = False):
    """Geometry working arrays for one side of a join, computed from the
    USER columns (``geom`` = ("xcol", "ycol") or "wkbcol", already prefixed
    when called from the kernel).

    This is the reconstruction half of the slim-shuffle design: the
    exchange ships ONLY user columns + part_id + __side (measured 2x less
    shuffle volume than shipping 9 internal geometry columns), and each
    group kernel re-derives x/y/envelope/point-flag/radius here — trivial
    for point sides, one envelope scan for WKB sides.

    ``circle=True`` reproduces CircleRDD (``Circle.java:68-82``): the row
    becomes a circle at its MBR center with per-row radius
    ``max(radius, mbr_diag/2)``; ``pt`` False (circles dedup like extended
    geometries)."""
    n = tbl.num_rows
    if isinstance(geom, (tuple, list)):
        x = tbl[geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
        y = tbl[geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
        env = np.column_stack([x, y, x, y])
        is_pt = np.full(n, radius == 0.0)
        wkb = None
    else:
        env = _wkb.envelopes_from_wkb(tbl[geom])  # zero-copy batch scan
        wkb = _wkb.LazyBlobs(tbl[geom])  # python list built only on exotic fallback
        is_pt = (
            pc.binary_length(tbl[geom]).fill_null(0).to_numpy(zero_copy_only=False) == 21
        ) & (radius == 0.0)
        x = np.where(is_pt, env[:, 0], np.nan)
        y = np.where(is_pt, env[:, 1], np.nan)
    if circle and radius > 0.0:
        cx = (env[:, 0] + env[:, 2]) / 2.0
        cy = (env[:, 1] + env[:, 3]) / 2.0
        rad = np.maximum(
            radius, np.hypot(env[:, 2] - env[:, 0], env[:, 3] - env[:, 1]) / 2.0
        )
        env = np.column_stack([cx - rad, cy - rad, cx + rad, cy + rad])
        x, y = cx, cy
        is_pt = np.zeros(n, dtype=bool)
    elif radius > 0.0:
        rad = np.full(n, radius)
        env = env + np.array([-radius, -radius, radius, radius])
    else:
        rad = np.zeros(n)
    return {
        "x": np.asarray(x, dtype=np.float64),
        "y": np.asarray(y, dtype=np.float64),
        "e": env,
        "ispt": np.asarray(is_pt, dtype=bool),
        "wkb": wkb,
        "rad": rad,
    }


# ---------------------------------------------------------------------------
# side normalization
# ---------------------------------------------------------------------------

def _summarize_side(ds, geom, radius: float = 0.0, circle: bool = False, per_batch_cap: int = 4096):
    """ONE pass computing analyze() stats AND the envelope sample together
    (the reference needs two scans, SpatialRDD.java:470-503 + :230-241; we
    fuse them). Emits one tiny summary row per batch: bbox, count, and an
    evenly-spaced per-batch envelope subsample; the driver unions the
    subsamples and thins them to the RDDSampleUtils policy count."""

    def summarize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"minx": pa.array([], pa.float64()), "miny": pa.array([], pa.float64()),
                 "maxx": pa.array([], pa.float64()), "maxy": pa.array([], pa.float64()),
                 "n": pa.array([], pa.int64()), "sample": pa.array([], pa.list_(pa.float64())),
                 "cols": pa.array([], pa.list_(pa.string()))}
            )
        env = _side_fields(batch, geom, radius=radius, circle=circle)["e"]
        take = min(n, per_batch_cap)
        idx = np.unique(np.linspace(0, n - 1, take).astype(np.int64))
        samp = env[idx].ravel()
        return pa.table(
            {
                "minx": pa.array([float(env[:, 0].min())]),
                "miny": pa.array([float(env[:, 1].min())]),
                "maxx": pa.array([float(env[:, 2].max())]),
                "maxy": pa.array([float(env[:, 3].max())]),
                "n": pa.array([n], pa.int64()),
                "sample": pa.array([samp], pa.list_(pa.float64())),
                # schema rides the summary rows: the caller then never needs
                # a separate ds.schema() probe (each probe is its own small
                # Dataset execution on a lazy chain)
                "cols": pa.array([list(batch.column_names)], pa.list_(pa.string())),
            }
        )

    rows = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    if not rows:
        return 0, (0.0, 0.0, 0.0, 0.0), np.empty((0, 4)), None
    total = int(sum(r["n"] for r in rows))
    env = (
        min(r["minx"] for r in rows),
        min(r["miny"] for r in rows),
        max(r["maxx"] for r in rows),
        max(r["maxy"] for r in rows),
    )
    samples = np.concatenate([np.asarray(r["sample"], dtype=np.float64).reshape(-1, 4) for r in rows])
    names = list(rows[0]["cols"]) if rows[0].get("cols") is not None else None
    return total, env, samples, names


def get_sample_count_safe(num_partitions: int, conf) -> int:
    if conf.sample_number > 0:
        return conf.sample_number
    return max(2 * num_partitions, 1000)


def _fit(samples, boundary, n_parts, grid_type):
    padded = pad_boundary(boundary)
    if grid_type == "kdbtree":
        return KDBTree(samples, padded, n_parts)
    if grid_type == "quadtree":
        return QuadTree(samples, padded, n_parts)
    if grid_type == "equalgrid":
        return equal_grid(padded, n_parts)
    raise ValueError(f"grid type {grid_type!r}")


def _assign(ds, geom, prefix, part_ref, radius: float = 0.0, circle: bool = False):
    """Fused envelope-compute + partition placement: emits ONLY the
    prefixed user columns + ``part_id`` (boundary duplication by row
    replication). The geometry internals are re-derived per group by the
    kernel (slim-shuffle design, see :func:`_side_fields`)."""

    def fn(batch: pa.Table, part) -> pa.Table:
        f = _side_fields(batch, geom, radius=radius, circle=circle)
        ri, pid = part.place_mixed(f["e"], f["ispt"])
        order = np.argsort(ri, kind="stable")
        ri, pid = ri[order], pid[order]
        out = batch.rename_columns([prefix + c for c in batch.column_names]).take(pa.array(ri))
        return out.append_column("part_id", pa.array(pid, type=pa.int32()))

    from ..partition.assign import broadcast_map_batches

    return broadcast_map_batches(ds, fn, {"part": part_ref})


def _assign_self_union(ds, l_geom, r_geom, lprefix, rprefix, part_ref, l_user, r_user, radius=0.0, circle=False):
    """Self-join fast path: one map_batches computes BOTH sides' placement
    from the same batch and emits the already-padded union rows (side 0 =
    left with radius/circle envelope expansion, side 1 = plain right)."""
    order = l_user + r_user + ["part_id", "__side"]

    def fn(batch: pa.Table, part) -> pa.Table:
        fl = _side_fields(batch, l_geom, radius=radius, circle=circle)
        ri_l, pid_l = part.place_mixed(fl["e"], fl["ispt"])
        ol = np.argsort(ri_l, kind="stable")
        ri_l, pid_l = ri_l[ol], pid_l[ol]
        if r_geom == l_geom and radius == 0.0 and not circle:
            ri_r, pid_r = ri_l, pid_l
        else:
            fr = _side_fields(batch, r_geom)
            ri_r, pid_r = part.place_mixed(fr["e"], fr["ispt"])
            orr = np.argsort(ri_r, kind="stable")
            ri_r, pid_r = ri_r[orr], pid_r[orr]

        def side_table(ri, pid, prefix, own_cols, other_cols, side_val):
            t = batch.rename_columns([prefix + c for c in batch.column_names]).take(pa.array(ri))
            cols = {c: t[c] for c in own_cols}
            other_prefix = rprefix if side_val == 0 else lprefix
            for name in other_cols:
                # pad with nulls typed from the SAME source batch (self-join:
                # both sides share the input schema)
                base = name[len(other_prefix):]
                cols[name] = pa.nulls(t.num_rows, type=batch.schema.field(base).type)
            cols["part_id"] = pa.array(pid, type=pa.int32())
            cols["__side"] = pa.array(np.full(len(ri), side_val, dtype=np.int8))
            return pa.table({k: cols[k] for k in order})

        lt = side_table(ri_l, pid_l, lprefix, l_user, r_user, 0)
        rt = side_table(ri_r, pid_r, rprefix, r_user, l_user, 1)
        return pa.concat_tables([lt, rt])

    from ..partition.assign import broadcast_map_batches

    return broadcast_map_batches(ds, fn, {"part": part_ref})


def _pad_union(left, right, l_cols, r_cols, l_schema, r_schema):
    """Give both sides the same column set (nulls for the other side's
    columns) so ``Dataset.union`` has one schema."""
    order = l_cols + r_cols + ["part_id", "__side"]

    def pad(missing_schema, side_val):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = dict(zip(batch.column_names, batch.columns))
            for name in missing_schema.names:
                cols[name] = pa.nulls(n, type=missing_schema.field(name).type)
            cols["__side"] = pa.array(np.full(n, side_val, dtype=np.int8))
            return pa.table({k: cols[k] for k in order})

        return fn

    lp = left.map_batches(pad(r_schema, 0), batch_format="pyarrow")
    rp = right.map_batches(pad(l_schema, 1), batch_format="pyarrow")
    return lp.union(rp)


# ---------------------------------------------------------------------------
# per-group join kernel
# ---------------------------------------------------------------------------

def _dist_point_xy(side):
    """(x, y) arrays valid for every POINT row — bare x/y rows AND 21-byte
    LE WKB point rows (whose side["x"] is NaN under a radius) — NaN for
    extended geometries. Cached on the side dict."""
    cached = side.get("_ptxy")
    if cached is not None:
        return cached
    if side["wkb"] is None:
        cached = (
            np.asarray(side["x"], dtype=np.float64),
            np.asarray(side["y"], dtype=np.float64),
        )
    else:
        nones = _wkb_none(side)
        x = np.where(nones, side["x"], np.nan)
        y = np.where(nones, side["y"], np.nan)
        col = getattr(side["wkb"], "arrow_col", None)
        if col is not None:  # stay arrow: nulls -> b"" without a python list
            if col.null_count:
                col = pc.fill_null(col, b"")
            flat = _wkb._flat_wkb_buffer(col)
        else:
            vals = [b if isinstance(b, (bytes, bytearray)) else b"" for b in side["wkb"]]
            flat = _wkb._flat_wkb_buffer(vals)
        if flat is not None:
            u8, starts, lens = flat
            m = lens == 21
            if m.any():
                rows = np.nonzero(m)[0]
                rows = rows[u8[starts[rows]] == 1]
                if len(rows):
                    typ = _wkb._read_u32_at(u8, starts[rows] + 1)
                    rows = rows[typ == 1]
                if len(rows):
                    xy = _wkb._gather_bytes(
                        u8, starts[rows] + 5, np.full(len(rows), 16, dtype=np.int64)
                    ).view("<f8").reshape(-1, 2)
                    x[rows] = xy[:, 0]
                    y[rows] = xy[:, 1]
        cached = (x, y)
    side["_ptxy"] = cached
    return cached


def _min_reduceat(vals: np.ndarray, off: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-group min with possibly-empty groups (empty -> +inf)."""
    out = np.full(len(off), np.inf)
    ne = counts > 0
    if vals.size and ne.any():
        out[ne] = np.minimum.reduceat(vals, off[ne])
    return out


def _point_seg_dist2(px, py, a, b) -> np.ndarray:
    """Squared distance point -> segment, vectorized (degenerate segments
    collapse to their start point)."""
    dx = b[:, 0] - a[:, 0]
    dy = b[:, 1] - a[:, 1]
    den = dx * dx + dy * dy
    t = np.where(den > 0.0, ((px - a[:, 0]) * dx + (py - a[:, 1]) * dy) / np.where(den > 0.0, den, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    qx = a[:, 0] + t * dx - px
    qy = a[:, 1] + t * dy - py
    return qx * qx + qy * qy


def _point_poly_dist(px, py, side, rows) -> np.ndarray:
    """Vectorized distance from per-pair points to per-pair polygons of
    ``side`` (rows must be ``_poly_side_arrays(side)["handled"]``):
    0 when the point is in/on the polygon, else the min distance to any
    boundary segment."""
    ps = _poly_side_arrays(side)
    idx, off = _expand_pair_slices(ps["sstart"][rows], ps["scount"][rows])
    pex = np.repeat(px, ps["scount"][rows])
    pey = np.repeat(py, ps["scount"][rows])
    d2 = _point_seg_dist2(pex, pey, ps["seg_a"][idx], ps["seg_b"][idx])
    d = np.sqrt(_min_reduceat(d2, off, ps["scount"][rows]))
    # inside test, one locate call per distinct polygon row
    g = _geom_cache(side)
    order = np.argsort(rows, kind="stable")
    sorted_r = rows[order]
    bounds = np.nonzero(np.diff(sorted_r))[0] + 1
    for grp in np.split(order, bounds):
        geom = g(int(rows[grp[0]]))
        loc = P.locate_points_in_geometry(px[grp], py[grp], geom)
        inside = loc != P.EXTERIOR
        if inside.any():
            d[grp[inside]] = 0.0
    return d


def point_to_wkb_polygons_dist(wkb_col, qx: float, qy: float) -> np.ndarray:
    """Distance from ONE query point to every polygon/multipolygon row of a
    WKB column, vectorized: min point-segment distance per row with a
    ray-cast parity inside test (parity over ALL rings handles holes and
    disjoint multi parts). Rows the batch ring extractor can't handle
    (points, lines, exotic WKB) come back NaN — the caller falls back per
    row. Used by the kNN-query WKB path."""
    n = len(wkb_col)
    side = {"ispt": np.zeros(n, dtype=bool), "wkb": wkb_col}
    ps = _poly_side_arrays(side)
    out = np.full(n, np.nan)
    rows = np.nonzero(ps["handled"])[0]
    if len(rows) == 0:
        return out
    idx, off = _expand_pair_slices(ps["sstart"][rows], ps["scount"][rows])
    a = ps["seg_a"][idx]
    b = ps["seg_b"][idx]
    d2 = _point_seg_dist2(qx, qy, a, b)
    dmin = np.sqrt(_min_reduceat(d2, off, ps["scount"][rows]))
    straddle = (a[:, 1] > qy) != (b[:, 1] > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = a[:, 0] + (qy - a[:, 1]) * (b[:, 0] - a[:, 0]) / (b[:, 1] - a[:, 1])
    cross = straddle & (qx < xint)
    ncross = np.zeros(len(rows), dtype=np.int64)
    ne = ps["scount"][rows] > 0
    if cross.size and ne.any():
        ncross[ne] = np.add.reduceat(cross.astype(np.int64), off[ne])
    inside = (ncross % 2) == 1
    out[rows] = np.where(inside, 0.0, dmin)
    return out


def _pair_mask_distance(lt, rt, li, ri, radius, inclusive):
    """SQL DistanceJoinExec semantics: true geometric distance(l, r) <=/< radius.

    Point-ness is judged by the actual geometry (bare x/y rows or 21-byte
    WKB points), NOT the ``__pt`` dedup flag — radius expansion clears the
    flag but the geometry is still a point, and the vectorized hypot path
    must keep applying. Polygon rows (incl. multipolygons) use the batch
    ring arrays: point-polygon = min point-segment distance with a grouped
    inside test; polygon-polygon = 0 when they intersect (fast path D) else
    min segment-segment distance. Only exotic rows (lines, collections,
    big-endian/Z WKB) fall back to the per-pair evaluator."""
    if len(li) == 0:
        return np.zeros(0, dtype=bool)
    lx, ly = _dist_point_xy(lt)
    rx, ry = _dist_point_xy(rt)
    l_pt = ~np.isnan(lx[li]) & ~np.isnan(ly[li])
    r_pt = ~np.isnan(rx[ri]) & ~np.isnan(ry[ri])
    out = np.zeros(len(li), dtype=bool)
    done = np.zeros(len(li), dtype=bool)

    def accept(idx, d):
        out[idx] = (d <= radius) if inclusive else (d < radius)
        done[idx] = True

    pp = l_pt & r_pt
    if pp.any():
        idx = np.nonzero(pp)[0]
        accept(idx, np.hypot(lx[li[idx]] - rx[ri[idx]], ly[li[idx]] - ry[ri[idx]]))

    pl = _poly_side_arrays(lt)
    pr = _poly_side_arrays(rt)
    l_poly = pl["handled"][li]
    r_poly = pr["handled"][ri]

    m = ~done & l_pt & r_poly  # point x polygon
    if m.any():
        idx = np.nonzero(m)[0]
        accept(idx, _point_poly_dist(lx[li[idx]], ly[li[idx]], rt, ri[idx]))
    m = ~done & r_pt & l_poly  # polygon x point
    if m.any():
        idx = np.nonzero(m)[0]
        accept(idx, _point_poly_dist(rx[ri[idx]], ry[ri[idx]], lt, li[idx]))

    m = ~done & l_poly & r_poly  # polygon x polygon
    if m.any():
        idx = np.nonzero(m)[0]
        elig, inter = _poly_poly_intersects(lt, rt, li[idx], ri[idx])
        # all pairs are eligible (both handled), so elig is all-True here
        touch = idx[inter]
        out[touch] = True
        done[touch] = True
        far = idx[~inter]
        if len(far):
            # min seg-seg distance: for non-crossing segments it is the min
            # of the four endpoint-to-segment distances (chunked expansion)
            na = pl["scount"][li[far]]
            nb = pr["scount"][ri[far]]
            dmin = np.full(len(far), np.inf)
            cm_all = na * nb
            cuts = np.cumsum(cm_all)
            start = 0
            while start < len(far):
                base = cuts[start - 1] if start else 0
                stop = int(np.searchsorted(cuts, base + _SEG_CHUNK, side="right")) + 1
                stop = min(max(stop, start + 1), len(far))
                cna, cnb = na[start:stop], nb[start:stop]
                cm = cna * cnb
                total = int(cm.sum())
                if total:
                    ends = np.cumsum(cm)
                    off = ends - cm
                    t = np.arange(total, dtype=np.int64) - np.repeat(off, cm)
                    ai = np.repeat(pl["sstart"][li[far[start:stop]]], cm) + t // np.repeat(cnb, cm)
                    bi = np.repeat(pr["sstart"][ri[far[start:stop]]], cm) + t % np.repeat(cnb, cm)
                    a1, a2 = pl["seg_a"][ai], pl["seg_b"][ai]
                    b1, b2 = pr["seg_a"][bi], pr["seg_b"][bi]
                    d2 = np.minimum(
                        np.minimum(
                            _point_seg_dist2(a1[:, 0], a1[:, 1], b1, b2),
                            _point_seg_dist2(a2[:, 0], a2[:, 1], b1, b2),
                        ),
                        np.minimum(
                            _point_seg_dist2(b1[:, 0], b1[:, 1], a1, a2),
                            _point_seg_dist2(b2[:, 0], b2[:, 1], a1, a2),
                        ),
                    )
                    dmin[start:stop] = np.sqrt(_min_reduceat(d2, off, cm))
                start = stop
            accept(far, dmin)

    rest = np.nonzero(~done)[0]
    if len(rest):
        lg = _geom_cache(lt)
        rg = _geom_cache(rt)
        for k in rest:
            d = _ops.distance(lg(int(li[k])), rg(int(ri[k])))
            out[k] = d <= radius if inclusive else d < radius
    return out


def _pair_mask_circle(lt, rt, li, ri, predicate):
    """CircleRDD semantics (``Circle.java:132-222``): the left row is a
    circle (center __x/__y, per-row radius __rad).

    * covers (considerBoundaryIntersection=false): every VERTEX of the right
      geometry within the radius (Circle.covers checks ring/line vertices)
    * intersects (=true): distance(center point, right geometry) <= radius
    """
    out = np.zeros(len(li), dtype=bool)
    if not len(li):
        return out
    cx, cy, rad = lt["x"][li], lt["y"][li], lt["rad"][li]
    r_pt = rt["ispt"][ri]
    # point rights: both predicates reduce to center distance <= radius
    if r_pt.any():
        idx = np.nonzero(r_pt)[0]
        d = np.hypot(cx[idx] - rt["x"][ri[idx]], cy[idx] - rt["y"][ri[idx]])
        out[idx] = d <= rad[idx]
    rest = np.nonzero(~r_pt)[0]
    if len(rest):
        rg = _geom_cache(rt)
        for k in rest:
            g = rg(int(ri[k]))
            if predicate == "covers":
                pts = g.all_coords()
                out[k] = bool(
                    np.all(np.hypot(pts[:, 0] - cx[k], pts[:, 1] - cy[k]) <= rad[k])
                )
            else:  # intersects
                d = _ops.points_to_geometry_distance(
                    np.array([cx[k]]), np.array([cy[k]]), g
                )[0]
                out[k] = d <= rad[k]
    return out


def _wkb_none(side) -> np.ndarray:
    cached = side.get("wkbnone")
    if cached is None:
        blobs = side["wkb"]
        if blobs is None:  # pure point side, wkb column skipped entirely
            cached = np.ones(len(side["x"]), dtype=bool)
        else:
            col = getattr(blobs, "arrow_col", None)
            if col is not None:  # arrow null mask, no list materialization
                cached = pc.is_null(col).to_numpy(zero_copy_only=False)
            else:
                cached = np.fromiter((w is None for w in blobs), dtype=bool, count=len(blobs))
        side["wkbnone"] = cached
    return cached


def _geom_cache(side):
    cache: dict[int, Geometry] = {}

    def get(i: int) -> Geometry:
        g = cache.get(i)
        if g is None:
            blob = side["wkb"][i] if side["wkb"] is not None else None
            if blob is None:
                g = Geometry.point(side["x"][i], side["y"][i])
            else:
                g = _wkb.from_wkb(blob)
            cache[i] = g
        return g

    return get


_POLYGONAL_FIRST_BYTEPAIRS = {3, 6}  # wkb type codes Polygon / MultiPolygon


def _wkb_kinds(blobs, n: int | None = None):
    """Geometry type code per row (or -1 for point rows carried as x/y)."""
    if blobs is None:
        return np.full(int(n or 0), -1, dtype=np.int64)
    return _wkb.kinds_from_wkb(blobs)


_GC_DECOMPOSABLE = {
    "intersects",
    "disjoint",
    "covers",
    "contains",
    "within",
    "covered_by",
    "coveredby",
    "touches",
    "equals",
}


def _gc_parts(side, row: int) -> list:
    """Flattened part blobs of a collection row — parsed ONCE per distinct
    row per batch (cached on the side dict), never per candidate pair."""
    cache = side.setdefault("_gcparts", {})
    parts = cache.get(row)
    if parts is None:
        parts = _wkb.collection_parts_wkb(side["wkb"][row])
        cache[row] = parts
    return parts


def _exploded_side(side, uniq_rows: np.ndarray):
    """Virtual side table over the PARTS of the given rows: collection
    rows (kind 7) contribute one row per flattened part, every other row
    contributes itself. Returns (sub_side, starts, counts) where row j of
    ``uniq_rows`` owns sub-side rows ``starts[j] : starts[j]+counts[j]``."""
    kinds = side["kind"]
    wkb = side["wkb"]
    none_mask = _wkb_none(side)
    blob_list: list = []
    owner: list = []
    for r in uniq_rows.tolist():
        if kinds[r] == 7:
            ps = _gc_parts(side, r)
            blob_list.extend(ps)
            owner.extend([r] * len(ps))
        else:
            blob_list.append(None if none_mask[r] else wkb[r])
            owner.append(r)
    owner_a = np.asarray(owner, dtype=np.int64)
    n2 = len(blob_list)
    have = np.fromiter((b is not None for b in blob_list), dtype=bool, count=n2)
    env = np.zeros((n2, 4), dtype=np.float64)
    x = np.full(n2, np.nan)
    y = np.full(n2, np.nan)
    ispt = np.zeros(n2, dtype=bool)
    kind = np.full(n2, -1, dtype=np.int64)
    if have.any():
        comp = pa.array([b for b in blob_list if b is not None], type=pa.binary())
        e2 = _wkb.envelopes_from_wkb(comp)
        k2 = _wkb.kinds_from_wkb(comp)
        ln2 = pc.binary_length(comp).to_numpy(zero_copy_only=False).astype(np.int64)
        at = np.nonzero(have)[0]
        env[at] = e2
        kind[at] = k2
        p2 = ln2 == 21
        ispt[at] = p2
        x[at] = np.where(p2, e2[:, 0], np.nan)
        y[at] = np.where(p2, e2[:, 1], np.nan)
    miss = ~have
    if miss.any():
        rows = owner_a[miss]
        env[miss] = side["e"][rows]
        x[miss] = side["x"][rows]
        y[miss] = side["y"][rows]
        ispt[miss] = side["ispt"][rows]
    sub = {
        "x": x,
        "y": y,
        "e": env,
        "ispt": ispt,
        "wkb": _wkb.LazyBlobs(pa.array(blob_list, type=pa.binary())),
        "rad": np.zeros(n2),
        "kind": kind,
    }
    pos = np.searchsorted(uniq_rows, owner_a)
    counts = np.bincount(pos, minlength=len(uniq_rows)).astype(np.int64)
    starts = np.cumsum(counts) - counts
    return sub, starts, counts


def _collection_pairs(lt, rt, li, ri, predicate) -> np.ndarray:
    """Vectorized predicate evaluation for pairs where at least one side
    is a GeometryCollection: explode both sides into parts, run THIS
    kernel on the exploded part pairs (parts are never collections, so
    the recursion bottoms out in the poly/line/point fast paths), and
    reduce with exactly the decomposition formulas of the GC branches in
    geom/predicates.py — the per-row generic path and this path agree by
    construction."""
    lu, linv = np.unique(li, return_inverse=True)
    ru, rinv = np.unique(ri, return_inverse=True)
    lsub, lst, lct = _exploded_side(lt, lu)
    rsub, rst, rct = _exploded_side(rt, ru)
    npairs = len(li)
    nl = lct[linv]
    nr = rct[rinv]
    m = nl * nr
    tot = int(m.sum())
    if tot == 0:
        # a side with zero parts (empty collection): nothing intersects
        return np.full(npairs, predicate == "disjoint")
    pair_of = np.repeat(np.arange(npairs), m)
    offs = np.cumsum(m) - m
    k = np.arange(tot, dtype=np.int64) - offs[pair_of]
    nr_p = nr[pair_of]
    pli = lst[linv][pair_of] + k // nr_p
    pri = rst[rinv][pair_of] + k % nr_p

    def any_reduce(mask: np.ndarray) -> np.ndarray:
        return np.bincount(pair_of, weights=mask, minlength=npairs) > 0

    def covered_all(cov_mask: np.ndarray, cnt_idx: np.ndarray, cnt_counts: np.ndarray) -> np.ndarray:
        """All contained-side parts covered by SOME container part (the
        predicates.py covers formula); False when either part set is
        empty."""
        coffs = np.cumsum(cnt_counts) - cnt_counts
        ck = coffs[pair_of] + cnt_idx
        nck = int(cnt_counts.sum())
        if nck == 0:
            return np.zeros(npairs, dtype=bool)
        any_c = np.bincount(ck, weights=cov_mask, minlength=nck) > 0
        pair_of_ck = np.repeat(np.arange(npairs), cnt_counts)
        miss = np.bincount(pair_of_ck, weights=~any_c, minlength=npairs) > 0
        return ~miss & (cnt_counts > 0) & (m > 0)

    if predicate == "intersects":
        return any_reduce(_pair_mask_predicate(lsub, rsub, pli, pri, "intersects"))
    if predicate == "disjoint":
        return ~any_reduce(_pair_mask_predicate(lsub, rsub, pli, pri, "intersects"))
    if predicate == "touches":
        t = _pair_mask_predicate(lsub, rsub, pli, pri, "touches")
        i = _pair_mask_predicate(lsub, rsub, pli, pri, "intersects")
        return any_reduce(i) & ~any_reduce(i & ~t)
    if predicate in ("covers", "contains"):
        cov = _pair_mask_predicate(lsub, rsub, pli, pri, "covers")
        res = covered_all(cov, k % nr_p, nr)
        if predicate == "contains":
            res &= any_reduce(_pair_mask_predicate(lsub, rsub, pli, pri, "contains"))
        return res
    if predicate in ("within", "covered_by", "coveredby"):
        cov = _pair_mask_predicate(rsub, lsub, pri, pli, "covers")
        res = covered_all(cov, k // nr_p, nl)
        if predicate == "within":
            res &= any_reduce(_pair_mask_predicate(rsub, lsub, pri, pli, "contains"))
        return res
    if predicate == "equals":
        c1 = covered_all(
            _pair_mask_predicate(lsub, rsub, pli, pri, "covers"), k % nr_p, nr
        )
        c2 = covered_all(
            _pair_mask_predicate(rsub, lsub, pri, pli, "covers"), k // nr_p, nl
        )
        return c1 & c2
    raise AssertionError(predicate)


def _pair_mask_predicate(lt, rt, li, ri, predicate):
    n = len(li)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    l_pt = lt["ispt"][li]
    r_pt = rt["ispt"][ri]
    l_kind = lt["kind"][li]
    r_kind = rt["kind"][ri]

    # fast path A: polygonal-left x point-right, grouped by left geometry
    fa = ~l_pt & np.isin(l_kind, (3, 6)) & r_pt
    if fa.any() and predicate in ("contains", "covers", "intersects", "touches", "disjoint"):
        idx = np.nonzero(fa)[0]
        out[idx] = _locate_grouped(lt, rt, li[idx], ri[idx], predicate, container="l")
        fa_done = fa
    else:
        fa_done = np.zeros(n, dtype=bool)

    # fast path B: point-left x polygonal-right
    fb = ~fa_done & l_pt & ~r_pt & np.isin(r_kind, (3, 6))
    if fb.any() and predicate in ("within", "covered_by", "intersects", "touches", "disjoint"):
        idx = np.nonzero(fb)[0]
        out[idx] = _locate_grouped(lt, rt, li[idx], ri[idx], _flip(predicate), container="r")
        fb_done = fb
    else:
        fb_done = np.zeros(n, dtype=bool)

    # fast path C: point x point
    fc = ~fa_done & ~fb_done & l_pt & r_pt
    if fc.any():
        idx = np.nonzero(fc)[0]
        eq = (lt["x"][li[idx]] == rt["x"][ri[idx]]) & (lt["y"][li[idx]] == rt["y"][ri[idx]])
        if predicate in ("intersects", "equals", "contains", "covers", "within", "covered_by"):
            out[idx] = eq
        elif predicate == "disjoint":
            out[idx] = ~eq
        # touches/crosses/overlaps between points: always False
        fc_done = fc
    else:
        fc_done = np.zeros(n, dtype=bool)

    # fast path D: polygon x polygon intersects/disjoint — batch ring
    # extraction + vectorized vertex-locate / segment-crossing tests
    fd_done = np.zeros(n, dtype=bool)
    if predicate in ("intersects", "disjoint"):
        fd = (
            ~fa_done & ~fb_done & ~fc_done & ~l_pt & ~r_pt
            & np.isin(l_kind, (3, 6)) & np.isin(r_kind, (3, 6))
        )
        if fd.any():
            idx = np.nonzero(fd)[0]
            elig, res_d = _poly_poly_intersects(lt, rt, li[idx], ri[idx])
            done = idx[elig]
            out[done] = res_d if predicate == "intersects" else ~res_d
            fd_done[done] = True

    # fast path E: GeometryCollection operands — explode parts once per
    # distinct row, evaluate through this same kernel (parts are never
    # collections, so recursion bottoms out in paths A-D), reduce with
    # the decomposition formulas shared with geom/predicates.py. Only
    # crosses/overlaps still take the per-row generic evaluator.
    fe_done = np.zeros(n, dtype=bool)
    if predicate in _GC_DECOMPOSABLE:
        ge = (
            ~fa_done & ~fb_done & ~fc_done & ~fd_done
            & ((l_kind == 7) | (r_kind == 7))
        )
        if ge.any():
            idx = np.nonzero(ge)[0]
            out[idx] = _collection_pairs(lt, rt, li[idx], ri[idx], predicate)
            fe_done[idx] = True

    rest = ~fa_done & ~fb_done & ~fc_done & ~fd_done & ~fe_done
    if rest.any():
        # point-vs-non-point combos where the predicate is trivially False
        if predicate in _POINT_FALSE:
            if predicate in ("contains", "covers"):
                # only trivially false when the POINT is the container;
                # contains(LineString, Point) etc. must fall through to the
                # generic evaluator (lineal/collection containers are valid)
                triv = rest & (l_pt & ~r_pt)
            else:
                # equals/overlaps/crosses need equal dims (or, for crosses
                # with a single point, the point would be within) — false
                # for any point-vs-extended pair in either direction
                triv = rest & ((l_pt & ~r_pt) | (~l_pt & r_pt))
            rest = rest & ~triv
        lg = _geom_cache(lt)
        rg = _geom_cache(rt)
        fn = P.PREDICATES[predicate]
        for k in np.nonzero(rest)[0]:
            out[k] = fn(lg(int(li[k])), rg(int(ri[k])))
    return out


def _flip(predicate: str) -> str:
    return {"within": "contains", "covered_by": "covers"}.get(predicate, predicate)


def _poly_side_arrays(side):
    """Lazily batch-extract ring/vertex/segment arrays for a side's plain
    LE WKB polygons (cached on the side dict — computed once per batch):

    ``handled`` row mask, flat ``xy``, per-row vertex (vstart, vcount) and
    segment (sx1, sy1, sx2, sy2, sstart, scount) slices. Segment arrays are
    in row order, so a row's segments are the contiguous slice
    ``sstart[row] : sstart[row] + scount[row]``."""
    cached = side.get("_poly")
    if cached is not None:
        return cached
    n = len(side["ispt"])
    if side["wkb"] is None:
        handled = np.zeros(n, dtype=bool)
        xy = np.empty((0, 2))
        ring_row = ring_counts = part_row = part_first = np.empty(0, dtype=np.int64)
    else:
        handled, xy, ring_row, ring_counts, part_row, part_first = _wkb.polygon_rings_from_wkb(
            side["wkb"]
        )
    vcount = (
        np.bincount(ring_row, weights=ring_counts, minlength=n).astype(np.int64)
        if len(ring_row)
        else np.zeros(n, dtype=np.int64)
    )
    vstart = np.cumsum(vcount) - vcount
    if len(xy):
        ends = np.cumsum(ring_counts) - 1
        m = np.ones(len(xy), dtype=bool)
        m[ends] = False
        sidx = np.nonzero(m)[0]
        seg_a = xy[sidx]
        seg_b = xy[sidx + 1]
        seg_row = np.repeat(ring_row, ring_counts)[sidx]
        scount = np.bincount(seg_row, minlength=n).astype(np.int64)
    else:
        seg_a = seg_b = np.empty((0, 2))
        scount = np.zeros(n, dtype=np.int64)
    sstart = np.cumsum(scount) - scount
    pcount = (
        np.bincount(part_row, minlength=n).astype(np.int64)
        if len(part_row)
        else np.zeros(n, dtype=np.int64)
    )
    pstart = np.cumsum(pcount) - pcount
    cached = {
        "handled": handled, "xy": xy,
        "vstart": vstart, "vcount": vcount,
        "seg_a": seg_a, "seg_b": seg_b, "sstart": sstart, "scount": scount,
        "part_first": part_first, "pstart": pstart, "pcount": pcount,
    }
    side["_poly"] = cached
    return cached


def _expand_pair_slices(starts, counts):
    """Pair-local flat gather indices: for pair p with (starts[p],
    counts[p]) emit starts[p] + 0..counts[p]-1, concatenated; plus the
    reduceat boundaries (offsets) per pair."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    off = ends - counts
    idx = np.arange(total, dtype=np.int64) + np.repeat(starts - off, counts)
    return idx, off


def _any_reduceat(flags: np.ndarray, off: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-group ``any`` with possibly-empty groups."""
    out = np.zeros(len(off), dtype=bool)
    ne = counts > 0
    if flags.size and ne.any():
        s = np.add.reduceat(flags.astype(np.int64), off[ne])
        out[ne] = s > 0
    return out


def _segments_intersect_mask(a1, a2, b1, b2) -> np.ndarray:
    """Vectorized segment-pair intersection INCLUDING endpoint touches and
    collinear overlap (the JTS ``intersects`` convention)."""
    d1 = np.cross(b2 - b1, a1 - b1)
    d2 = np.cross(b2 - b1, a2 - b1)
    d3 = np.cross(a2 - a1, b1 - a1)
    d4 = np.cross(a2 - a1, b2 - a1)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )

    def on_seg(p, q, r):
        # r collinear with pq: is r within pq's bbox?
        return (
            (r[:, 0] <= np.maximum(p[:, 0], q[:, 0]))
            & (r[:, 0] >= np.minimum(p[:, 0], q[:, 0]))
            & (r[:, 1] <= np.maximum(p[:, 1], q[:, 1]))
            & (r[:, 1] >= np.minimum(p[:, 1], q[:, 1]))
        )

    touch = (
        ((d1 == 0) & on_seg(b1, b2, a1))
        | ((d2 == 0) & on_seg(b1, b2, a2))
        | ((d3 == 0) & on_seg(a1, a2, b1))
        | ((d4 == 0) & on_seg(a1, a2, b2))
    )
    return proper | touch


_SEG_CHUNK = 4_000_000  # max segment-pair expansion per vectorized chunk


def _poly_poly_intersects(lt, rt, li, ri):
    """Vectorized intersects for candidate pairs where BOTH sides are plain
    LE WKB polygons. Returns (eligible_mask, result_for_eligible).

    Matches JTS ``Geometry.intersects`` semantics over valid (multi)
    polygons (the reference refines candidate pairs per-pair through JTS,
    ``common/.../Predicates.java:19-24``; here the three exhaustive cases
    are each batch-vectorized): any A boundary vertex in/on B, any
    boundary segments crossing/touching, or some part of B lying entirely
    inside A (per-part probe vertices, envelope-prefiltered)."""
    pl = _poly_side_arrays(lt)
    pr = _poly_side_arrays(rt)
    elig = pl["handled"][li] & pr["handled"][ri]
    if not elig.any():
        return elig, np.empty(0, dtype=bool)
    li = li[elig]
    ri = ri[elig]
    np_pairs = len(li)
    res = np.zeros(np_pairs, dtype=bool)

    # --- test 1: any A vertex in/on B, one locate call per distinct B ---
    rg = _geom_cache(rt)
    order = np.argsort(ri, kind="stable")
    sorted_ri = ri[order]
    bounds = np.nonzero(np.diff(sorted_ri))[0] + 1
    for grp in np.split(order, bounds):
        b_geom = rg(int(ri[grp[0]]))
        idx, off = _expand_pair_slices(pl["vstart"][li[grp]], pl["vcount"][li[grp]])
        loc = P.locate_points_in_geometry(pl["xy"][idx, 0], pl["xy"][idx, 1], b_geom)
        res[grp] |= _any_reduceat(loc >= P.BOUNDARY, off, pl["vcount"][li[grp]])

    # --- test 2: any boundary segments cross/touch (pair-vectorized) ---
    pend = np.nonzero(~res)[0]
    na = pl["scount"][li[pend]]
    nb = pr["scount"][ri[pend]]
    m = na * nb
    cuts = np.cumsum(m)
    start = 0
    while start < len(pend):
        stop = int(np.searchsorted(cuts, (cuts[start - 1] if start else 0) + _SEG_CHUNK, side="left")) + 1
        stop = min(max(stop, start + 1), len(pend))
        sel = pend[start:stop]
        cna, cnb = na[start:stop], nb[start:stop]
        cm = cna * cnb
        total = int(cm.sum())
        if total:
            ends = np.cumsum(cm)
            off = ends - cm
            t = np.arange(total, dtype=np.int64) - np.repeat(off, cm)
            ai = np.repeat(pl["sstart"][li[sel]], cm) + t // np.repeat(cnb, cm)
            bi = np.repeat(pr["sstart"][ri[sel]], cm) + t % np.repeat(cnb, cm)
            hit = _segments_intersect_mask(
                pl["seg_a"][ai], pl["seg_b"][ai], pr["seg_a"][bi], pr["seg_b"][bi]
            )
            res[sel] |= _any_reduceat(hit, off, cm)
        start = stop

    # --- test 3: some part of B entirely inside A. With tests 1-2 false
    # there are no boundary contacts, so each B part is wholly inside or
    # wholly outside A — one probe vertex per part decides it. Pre-filter
    # parts by A's envelope (a part inside A must probe inside env(A));
    # a probe vertex in/on A is itself proof of intersection, so the
    # pre-filter only cuts cost, never changes the answer. ---
    pend = np.nonzero(~res)[0]
    if len(pend):
        pc = pr["pcount"][ri[pend]]
        idx, off = _expand_pair_slices(pr["pstart"][ri[pend]], pc)
        if len(idx):
            pf = pr["part_first"][idx]
            px = pr["xy"][pf, 0]
            py = pr["xy"][pf, 1]
            pair_of_part = np.repeat(np.arange(len(pend), dtype=np.int64), pc)
            envp = lt["e"][li[pend[pair_of_part]]]
            inenv = (px >= envp[:, 0]) & (px <= envp[:, 2]) & (py >= envp[:, 1]) & (py <= envp[:, 3])
            sel = np.nonzero(inenv)[0]
            if len(sel):
                lg = _geom_cache(lt)
                arow = li[pend[pair_of_part[sel]]]
                order = np.argsort(arow, kind="stable")
                sorted_a = arow[order]
                bounds = np.nonzero(np.diff(sorted_a))[0] + 1
                for grp in np.split(order, bounds):
                    s = sel[grp]
                    a_geom = lg(int(arow[grp[0]]))
                    loc = P.locate_points_in_geometry(px[s], py[s], a_geom)
                    hit = loc != P.EXTERIOR
                    if hit.any():
                        res[pend[pair_of_part[s[hit]]]] = True
    return elig, res


def _locate_grouped(lt, rt, li, ri, predicate, container: str):
    """Vectorized polygon-vs-points evaluation, grouping candidate pairs by
    the container geometry. ``predicate`` is expressed container-side
    (contains/covers/intersects/touches/disjoint)."""
    if container == "l":
        cont, cont_idx, px, py, pidx = lt, li, rt["x"], rt["y"], ri
    else:
        cont, cont_idx, px, py, pidx = rt, ri, lt["x"], lt["y"], li
    out = np.zeros(len(li), dtype=bool)
    cg = _geom_cache(cont)
    order = np.argsort(cont_idx, kind="stable")
    sorted_ci = cont_idx[order]
    bounds = np.nonzero(np.diff(sorted_ci))[0] + 1
    groups = np.split(order, bounds)
    for grp in groups:
        g = cg(int(cont_idx[grp[0]]))
        loc = P.locate_points_in_geometry(px[pidx[grp]], py[pidx[grp]], g)
        if predicate == "contains":
            out[grp] = loc == P.INTERIOR
        elif predicate in ("covers", "intersects"):
            out[grp] = loc >= P.BOUNDARY
        elif predicate == "touches":
            out[grp] = loc == P.BOUNDARY
        else:  # disjoint
            out[grp] = loc == P.EXTERIOR
    return out


def make_group_join_kernel(
    l_cols: list[str],
    r_cols: list[str],
    predicate: str,
    extents: np.ndarray,
    l_geom,
    r_geom,
    radius: float | None = None,
    inclusive: bool = True,
    circle: bool = False,
    metrics_actor=None,
):
    """The map_groups fn: one co-partitioned group -> joined rows.

    ``l_geom``/``r_geom`` are the PREFIXED geometry column specs; the group
    table carries only user columns (slim shuffle), so the kernel re-derives
    the geometry working arrays with :func:`_side_fields`."""

    def kernel(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lt_tbl = tbl.filter(pa.array(lmask))
        rt_tbl = tbl.filter(pa.array(~lmask))
        out_schema_cols = l_cols + r_cols

        def empty():
            arrays = [lt_tbl[c].take(pa.array([], type=pa.int64())) for c in l_cols] + [
                rt_tbl[c].take(pa.array([], type=pa.int64())) for c in r_cols
            ]
            return pa.table(dict(zip(out_schema_cols, arrays)))

        if lt_tbl.num_rows == 0 or rt_tbl.num_rows == 0:
            return empty()

        lt = _side_fields(lt_tbl, l_geom, radius=radius or 0.0, circle=circle)
        rt = _side_fields(rt_tbl, r_geom)
        lt["kind"] = _wkb_kinds(lt["wkb"], lt_tbl.num_rows)
        rt["kind"] = _wkb_kinds(rt["wkb"], rt_tbl.num_rows)

        # candidate generation: index the smaller side, probe with the larger
        # (auto build side; reference default is configurable, JoinQuery zips
        # stream side against build side's STRtree)
        if lt_tbl.num_rows <= rt_tbl.num_rows:
            tree = STRtree(lt["e"])
            ri_c, li_c = tree.query_batch(rt["e"])
        else:
            tree = STRtree(rt["e"])
            li_c, ri_c = tree.query_batch(lt["e"])

        # exact refine
        if radius is not None and circle:
            keep = _pair_mask_circle(lt, rt, li_c, ri_c, predicate)
        elif radius is not None:
            keep = _pair_mask_distance(lt, rt, li_c, ri_c, radius, inclusive)
        else:
            keep = _pair_mask_predicate(lt, rt, li_c, ri_c, predicate)
        li_c, ri_c = li_c[keep], ri_c[keep]

        # reference-point dedup (only non-point x non-point pairs can duplicate)
        if len(li_c):
            pid = int(tbl["part_id"][0].as_py())
            ext = extents[pid]
            both_ext = ~lt["ispt"][li_c] & ~rt["ispt"][ri_c]
            if both_ext.any():
                le, re_ = lt["e"][li_c], rt["e"][ri_c]
                ix = np.maximum(le[:, 0], re_[:, 0])
                iy = np.maximum(le[:, 1], re_[:, 1])
                ax = np.minimum(le[:, 2], re_[:, 2])
                ay = np.minimum(le[:, 3], re_[:, 3])
                env_disjoint = (ix > ax) | (iy > ay)
                in_extent = (ix >= ext[0]) & (ix < ext[2]) & (iy >= ext[1]) & (iy < ext[3])
                dup = both_ext & ~env_disjoint & ~in_extent
                li_c, ri_c = li_c[~dup], ri_c[~dup]

        if metrics_actor is not None:
            # per-partition accumulators (Metrics.scala:24-30 parity)
            metrics_actor.report.remote(
                int(tbl["part_id"][0].as_py()),
                min(lt_tbl.num_rows, rt_tbl.num_rows),
                max(lt_tbl.num_rows, rt_tbl.num_rows),
                int(len(keep)),
                int(len(li_c)),
            )
        arrays = [lt_tbl[c].take(pa.array(li_c)) for c in l_cols] + [
            rt_tbl[c].take(pa.array(ri_c)) for c in r_cols
        ]
        return pa.table(dict(zip(out_schema_cols, arrays)))

    return kernel


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def spatial_join(
    left,
    right,
    predicate: str = "intersects",
    *,
    left_geom=("lon", "lat"),
    right_geom=("lon", "lat"),
    lprefix: str = "l_",
    rprefix: str = "r_",
    num_partitions: int | None = None,
    conf: SpatialConf = DEFAULT_CONF,
    radius: float | None = None,
    inclusive: bool = True,
    circle: bool = False,
    metrics=None,
    boundary: tuple[float, float, float, float] | None = None,
    coalesce: bool | None = None,
):
    """Inner predicate/distance join of two Datasets.

    ``coalesce``: force (True) or suppress (False) the pre-groupby block
    coalesce; ``None`` (default) auto-detects. Ray 2.49 cannot report a
    lazy dataset's block count, so auto only coalesces when the row totals
    are small enough that near-empty-block sparsity is plausible — pass
    ``coalesce=True`` for a LARGE input whose upstream filters left
    thousands of near-empty blocks (the one case auto cannot see).

    Returns a Dataset whose columns are the left columns prefixed with
    ``lprefix`` followed by the right columns prefixed with ``rprefix``.
    ``predicate(left_geom_value, right_geom_value)`` must hold; with
    ``radius`` set, the condition is ``distance(l, r) <= radius`` instead
    (Sedona inner RangeJoinExec / DistanceJoinExec semantics — semi / anti /
    outer joins live on the broadcast path, as in the reference
    ``JoinQueryDetector.scala:317-318``).
    """
    self_join = right is left

    # ONE summary pass per distinct side (fused analyze + sample); a
    # self-join reuses the right summary, expanding envelopes by the radius.
    # FAST PATH: with caller-provided boundary + num_partitions, the fit
    # only needs SAMPLES — read a few random blocks instead of a full pass
    # (rows outside the given boundary would be dropped, so the caller's
    # boundary must genuinely cover both sides).
    rad = radius or 0.0
    cheap_fit = boundary is not None and num_partitions is not None

    def summarize(ds, geom, radius_=0.0, circle_=False):
        if cheap_fit:
            target = get_sample_count_safe(num_partitions, conf)
            sampled = ds.randomize_block_order(seed=conf.seed).limit(max(target, 4 * num_partitions))
            t, e, s, names = _summarize_side(sampled, geom, radius=radius_, circle=circle_)
            return max(t, 1), boundary, s, names
        return _summarize_side(ds, geom, radius=radius_, circle=circle_)

    if self_join and not circle:
        r_total, r_env, r_samples, r_names = summarize(right, right_geom)
        l_total = r_total
        l_names = r_names
        l_env = (r_env[0] - rad, r_env[1] - rad, r_env[2] + rad, r_env[3] + rad)
        l_samples = r_samples + np.array([-rad, -rad, rad, rad]) if rad else r_samples
    else:
        # the two summary passes are independent — run them concurrently
        # (each drives its own Dataset execution from a thread)
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
            lf = ex.submit(summarize, left, left_geom, rad, circle)
            rf = ex.submit(summarize, right, right_geom)
            l_total, l_env, l_samples, l_names = lf.result()
            r_total, r_env, r_samples, r_names = rf.result()
    # user-facing column lists come from the summary rows; a lazy chain only
    # pays a schema() probe execution if a side was empty
    l_user = [lprefix + c for c in (l_names if l_names is not None else left.schema().names)]
    r_user = [rprefix + c for c in (r_names if r_names is not None else right.schema().names)]
    if l_total == 0 or r_total == 0:
        # inner join with an empty side: emit an empty table with the
        # correct prefixed schema (an empty Dataset has no schema to union)
        fields = []
        for ds_, prefix in ((left, lprefix), (right, rprefix)):
            arrow = None
            try:
                s = ds_.limit(1).map_batches(lambda t: t, batch_format="pyarrow").schema()
                arrow = s.base_schema if s is not None else None
            except Exception:
                arrow = None
            if arrow is not None and hasattr(arrow, "field"):
                fields += [(prefix + f.name, f.type) for f in arrow]
            else:
                fields += [(prefix + n, pa.null()) for n in ds_.schema().names]
        return ray.data.from_arrow(pa.table({n: pa.nulls(0, type=t) for n, t in fields}))

    # auto-broadcast (JoinQueryDetector parity): a small-enough side skips
    # the shuffle entirely — same output schema and rows as the partitioned
    # plan (inner/non-circle only; metrics stay on the partitioned path)
    if (
        conf.auto_broadcast_rows > 0
        and not circle
        and not cheap_fit  # sampled totals can't drive the broadcast decision
        and metrics is None
        and min(l_total, r_total) <= conf.auto_broadcast_rows
    ):
        return _broadcast_fallback(
            left, right, predicate, left_geom, right_geom, lprefix, rprefix,
            radius, inclusive, small_side="left" if l_total <= r_total else "right",
        )

    env = (
        min(l_env[0], r_env[0]),
        min(l_env[1], r_env[1]),
        max(l_env[2], r_env[2]),
        max(l_env[3], r_env[3]),
    )
    if boundary is not None:
        env = (
            min(env[0], boundary[0]),
            min(env[1], boundary[1]),
            max(env[2], boundary[2]),
            max(env[3], boundary[3]),
        )
    boundary = env
    if num_partitions is None:
        num_partitions = conf.derive_num_partitions(max(l_total, r_total), 1)
    from ..partition.base import get_sample_count

    dom_total, dom_samples = (
        (l_total, l_samples) if conf.partition_side == "left" else (r_total, r_samples)
    )
    n_samples = get_sample_count(num_partitions, max(dom_total, 2 * num_partitions), conf.sample_number)
    if len(dom_samples) > n_samples:
        # deterministic thinning of the per-batch subsamples to the policy count
        keep = np.unique(np.linspace(0, len(dom_samples) - 1, n_samples).astype(np.int64))
        samples = dom_samples[keep]
    else:
        samples = dom_samples

    part = _fit(samples, boundary, num_partitions, conf.grid_type)

    # explicit skew handling: salt hot leaves when safe (requires a side
    # whose rows stay single-salt points — pairs of two replicated extended
    # geometries would duplicate across salts)
    salt_safe = isinstance(right_geom, (tuple, list)) or (
        isinstance(left_geom, (tuple, list)) and not radius and not circle
    )
    if conf.salt_threshold > 0 and salt_safe and len(samples):
        from ..partition.salt import SaltedPartitioner, leaf_sample_counts

        counts = leaf_sample_counts(part, samples)
        if (counts > conf.salt_threshold * max(counts.mean(), 1e-9)).any():
            part = SaltedPartitioner(part, counts, conf.salt_threshold, conf.salt_max)
    part_ref = ray.put(part)

    if self_join:
        # ONE pass over the shared upstream emits BOTH tagged sides —
        # assigning each side separately would re-execute the whole input
        # chain twice (measured: the dominant cost of distance self-joins
        # whose upstream includes read + transform stages)
        unioned = _assign_self_union(
            left, left_geom, right_geom, lprefix, rprefix, part_ref,
            l_user, r_user, radius=rad, circle=circle,
        )
    else:
        la = _assign(left, left_geom, lprefix, part_ref, radius=rad, circle=circle)
        ra = _assign(right, right_geom, rprefix, part_ref)

        l_arrow = la.schema().base_schema
        r_arrow = ra.schema().base_schema
        l_schema = pa.schema([(n, l_arrow.field(n).type) for n in l_user])
        r_schema = pa.schema([(n, r_arrow.field(n).type) for n in r_user])
        unioned = _pad_union(la, ra, l_user, r_user, l_schema, r_schema)
    # the union carries BOTH sides' block lists; heavy upstream filters can
    # leave thousands of near-empty blocks, and the sort-based groupby pays
    # per-block costs (measured 7x on sparse joins) — coalesce first when
    # that pathology is plausible. Ray 2.49's num_blocks() raises on every
    # lazy dataset, so the old "unknown -> always coalesce" fallback paid a
    # ~2 s repartition exchange on EVERY dense join; instead gate on the
    # row totals the summary passes already computed: near-empty-block
    # sparsity only arises when the joined rows are FEW (the measured 7x
    # case was 40k rows spread over ~1300 filter-emptied blocks), and for
    # few rows the coalesce is cheap anyway. Dense inputs skip the exchange.
    target_blocks = max(2 * num_partitions, 64)
    if coalesce is None:
        if cheap_fit:
            # sampled fit: l_total/r_total are SAMPLE counts, not row
            # totals — the sparsity heuristic below would always fire and
            # pay a repartition exchange on dense inputs (measured ~83 MB
            # x2 extra all-to-all on the 2M-point bench join). The caller
            # who knows the boundary also knows the input is dense; pass
            # coalesce=True explicitly for sparse filtered upstreams.
            coalesce = False
        else:
            try:
                n_blocks = left.num_blocks() + right.num_blocks()
            except Exception:
                n_blocks = None
            if n_blocks is not None:
                avg_rows = (l_total + r_total) / max(n_blocks, 1)
                coalesce = n_blocks > 2 * target_blocks and avg_rows < 10_000
            else:
                coalesce = (l_total + r_total) < 10_000 * target_blocks
    if coalesce:
        unioned = unioned.repartition(target_blocks)

    def _prefixed(geom, prefix):
        return (
            tuple(prefix + c for c in geom)
            if isinstance(geom, (tuple, list))
            else prefix + geom
        )

    kernel = make_group_join_kernel(
        l_user,
        r_user,
        predicate,
        part.dedup_extents(),
        _prefixed(left_geom, lprefix),
        _prefixed(right_geom, rprefix),
        radius=radius,
        inclusive=inclusive,
        circle=circle,
        metrics_actor=metrics.actor if metrics is not None else None,
    )
    return unioned.groupby("part_id").map_groups(kernel, batch_format="pyarrow")


def _broadcast_fallback(left, right, predicate, left_geom, right_geom, lprefix, rprefix, radius, inclusive, small_side):
    """Delegate a small-side join to the broadcast path, preserving the
    partitioned join's output schema (lprefix/rprefix columns)."""
    from .broadcast import broadcast_spatial_join

    def _collect(ds):
        return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])

    def _rename(ds, prefix):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([prefix + c for c in batch.column_names])

        return ds.map_batches(fn, batch_format="pyarrow")

    if small_side == "right":
        small_tbl = _collect(right)
        out = broadcast_spatial_join(
            _rename(left, lprefix),
            small_tbl,
            predicate,
            big_geom=(
                (lprefix + left_geom[0], lprefix + left_geom[1])
                if isinstance(left_geom, (tuple, list))
                else lprefix + left_geom
            ),
            small_geom=right_geom,
            how="inner",
            big_side="left",
            small_prefix=rprefix,
            radius=radius,
            inclusive=inclusive,
        )
    else:
        small_tbl = _collect(left)
        out = broadcast_spatial_join(
            _rename(right, rprefix),
            small_tbl,
            predicate,
            big_geom=(
                (rprefix + right_geom[0], rprefix + right_geom[1])
                if isinstance(right_geom, (tuple, list))
                else rprefix + right_geom
            ),
            small_geom=left_geom,
            how="inner",
            big_side="right",
            small_prefix=lprefix,
            radius=radius,
            inclusive=inclusive,
        )
    return out


def distance_join(left, right, radius: float, *, inclusive: bool = True, **kw):
    """Pairs with ``distance(l, r) <= radius`` (JoinQuery.DistanceJoinQueryFlat)."""
    return spatial_join(left, right, radius=radius, inclusive=inclusive, **kw)


def spatial_join_count(left, right, predicate: str = "intersects", *, left_key: str, **kw):
    """(window, count) per left row — JoinQuery.SpatialJoinQueryCountByKey
    (``JoinQuery.java:273-279``): groupby the window key over the flat join."""
    joined = spatial_join(left, right, predicate, **kw)
    lprefix = kw.get("lprefix", "l_")
    return joined.groupby(lprefix + left_key).count()


def spatial_join_outer(
    left,
    right,
    predicate: str = "intersects",
    *,
    left_id: str,
    how: str = "left_outer",
    lprefix: str = "l_",
    rprefix: str = "r_",
    num_partitions: int | None = None,
    **kw,
):
    """Left-outer / left-semi / left-anti on the PARTITIONED join path — an
    extension beyond the reference, whose non-inner joins are broadcast-only
    (``JoinQueryDetector.scala:317-318``).

    Because boundary duplication spreads one left row over several
    partitions, "unmatched" is a GLOBAL property: the inner join runs
    first, then the distinct matched ``left_id`` values drive a hash
    semi/anti join back against ``left`` (tiny key-only shuffle).

    ``left_id`` must uniquely identify left rows."""
    import pyarrow.compute as pc

    from ..dedup.minhash import _default_join_partitions

    if how not in ("left_outer", "left_semi", "left_anti"):
        raise ValueError(f"how={how!r}")
    inner = spatial_join(
        left, right, predicate, lprefix=lprefix, rprefix=rprefix,
        num_partitions=num_partitions, **kw,
    )
    np_join = _default_join_partitions()
    lid = lprefix + left_id
    matched = (
        inner.groupby(lid).count()
        .map_batches(lambda t: t.select([lid]), batch_format="pyarrow")
        .materialize()
    )
    if matched.count() == 0:
        # nothing matched anywhere: semi = empty, anti = left, outer = all-left padded
        if how == "left_semi":
            return left.limit(0)
        if how == "left_anti":
            return left
        inner_schema = inner.schema()
        schema = inner_schema.base_schema
        l_cols = [lprefix + c for c in left.schema().names]
        r_cols = [n for n in schema.names if n not in l_cols]

        def pad_all(batch: pa.Table) -> pa.Table:
            cols = {lprefix + c: batch[c] for c in batch.column_names}
            for name in r_cols:
                cols[name] = pa.nulls(batch.num_rows, type=schema.field(name).type)
            return pa.table({n: cols[n] for n in schema.names})

        return left.map_batches(pad_all, batch_format="pyarrow")
    if how == "left_semi":
        return _safe_hash_join(left, matched, "left_semi", np_join, on=(left_id,), right_on=(lid,))
    if how == "left_anti":
        return _safe_hash_join(left, matched, "left_anti", np_join, on=(left_id,), right_on=(lid,))
    # left_outer: inner rows + unmatched left rows padded with null rights
    unmatched = _safe_hash_join(left, matched, "left_anti", np_join, on=(left_id,), right_on=(lid,))
    inner_mat = inner.materialize()
    l_cols = [lprefix + c for c in left.schema().names]
    inner_schema = inner_mat.schema()
    if inner_schema is not None and getattr(inner_schema, "base_schema", None) is not None and hasattr(inner_schema.base_schema, "field"):
        schema = inner_schema.base_schema
    else:
        # zero matches anywhere (e.g. empty right side): no inner schema to
        # copy — synthesize it from the sides' declared schemas
        r_names = [rprefix + c for c in right.schema().names]
        try:
            r_arrow = right.limit(1).map_batches(lambda t: t, batch_format="pyarrow").schema().base_schema
            r_fields = [(rprefix + f.name, f.type) for f in r_arrow]
        except Exception:
            r_fields = [(n, pa.null()) for n in r_names]
        l_arrow = left.limit(1).map_batches(lambda t: t, batch_format="pyarrow").schema().base_schema
        schema = pa.schema([(lprefix + f.name, f.type) for f in l_arrow] + r_fields)
    r_cols = [n for n in schema.names if n not in l_cols]

    def pad(batch: pa.Table) -> pa.Table:
        cols = {lprefix + c: batch[c] for c in batch.column_names}
        for name in r_cols:
            cols[name] = pa.nulls(batch.num_rows, type=schema.field(name).type)
        return pa.table({n: cols[n] for n in schema.names})

    return inner_mat.union(unmatched.map_batches(pad, batch_format="pyarrow"))
