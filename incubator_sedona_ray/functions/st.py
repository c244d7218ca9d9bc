"""ST_ scalar functions over WKB columns.

Mirrors the reference catalog (``sql/common/.../UDF/Catalog.scala:37-204``;
kernels in ``common/.../Functions.java``, ``Constructors.java``,
``Predicates.java``) as column functions: each takes pyarrow arrays /
python lists of WKB (or scalars) and returns an arrow array. Use
:func:`st_apply` to lift one into a ``map_batches`` stage.

Coverage notes:
* constructors: point, pointz(2D-projected), geomFromWKT/WKB/GeoHash,
  polygonFromEnvelope, makePolygon, makeLine
* predicates: the full Predicates.java set via geom.predicates
* measures/accessors: area, length, distance, x/y, envelope bounds,
  npoints, numGeometries, geometryType, isEmpty, isClosed, isRing, isSimple
* transformers: translate, affine, flipCoordinates, reverse, reducePrecision,
  normalize-lite, setSRID/srid
* topology: centroid, envelope, boundary, convexHull, simplify, buffer
  (point-exact/convex approx), pointOnSurface, geometricMedian, dump,
  collectionExtract, subdivide-lite (envelope quartering), boundingDiagonal
* serializers: asText/asWKT, asWKB/asEWKB, asGeoJSON
* spherical: ST_DistanceSphere (haversine), ST_AreaSpheroid-lite
* boolean ops: intersection/union/difference/symDifference of simple
  polygons (incl. holes) via the piecewise triangulation kernel
  (geom/triangulate.py); concaveHull/split/buildArea/subdivide are real;
  makeValid repairs bowties via ring noding + cycle extraction (geom/ops.py)
* markup constructors: geomFromGML/geomFromKML (geom/markup.py)
"""

from __future__ import annotations

import json
import math

import numpy as np
import pyarrow as pa

from ..geom import ops as _ops
from ..geom import predicates as _pred
from ..geom import wkb as _wkb
from ..geom import wkt as _wkt
from ..geom.core import Geometry, GeometryType
from ..encoders import geohash as _geohash


def _geoms(col) -> list[Geometry]:
    return [_wkb.from_wkb(b) if b is not None else None for b in _to_list(col)]


def _to_list(col):
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        return col.to_pylist()
    return list(col)


def _wkb_arr(geoms) -> pa.Array:
    return pa.array([None if g is None else _wkb.to_wkb(g) for g in geoms], type=pa.binary())


# -- constructors -----------------------------------------------------------

def st_point(x, y) -> pa.Array:
    return pa.array(list(_wkb.points_to_wkb(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))), type=pa.binary())


def st_geomfromwkt(col) -> pa.Array:
    return _wkb_arr([_wkt.from_wkt(s) if s is not None else None for s in _to_list(col)])


def st_geomfromwkb(col) -> pa.Array:
    return pa.array([bytes(b) if b is not None else None for b in _to_list(col)], type=pa.binary())


def st_geomfromgeohash(col, precision: int | None = None) -> pa.Array:
    out = []
    for gh in _to_list(col):
        if gh is None:
            out.append(None)
            continue
        gh2 = gh[:precision] if precision else gh
        minlon, minlat, maxlon, maxlat = _geohash.decode_bbox(gh2)
        out.append(Geometry.box(minlon, minlat, maxlon, maxlat))
    return _wkb_arr(out)


def st_polygonfromenvelope(minx, miny, maxx, maxy) -> pa.Array:
    return _wkb_arr(
        [Geometry.box(a, b, c, d) for a, b, c, d in zip(_np(minx), _np(miny), _np(maxx), _np(maxy))]
    )


def st_makeline(col_a, col_b) -> pa.Array:
    out = []
    for ga, gb in zip(_geoms(col_a), _geoms(col_b)):
        pts = np.vstack([ga.all_coords(), gb.all_coords()])
        out.append(Geometry(GeometryType.LINESTRING, pts))
    return _wkb_arr(out)


def st_makepolygon(col) -> pa.Array:
    out = []
    for g in _geoms(col):
        out.append(None if g is None else Geometry.polygon(np.asarray(g.coords, dtype=np.float64)))
    return _wkb_arr(out)


def _np(v):
    return np.asarray(v, dtype=np.float64)


# -- accessors / measures ---------------------------------------------------

def st_area(col) -> pa.Array:
    return pa.array([_ops.area(g) if g is not None else None for g in _geoms(col)], type=pa.float64())


def st_length(col) -> pa.Array:
    return pa.array([_ops.length(g) if g is not None else None for g in _geoms(col)], type=pa.float64())


def st_x(col) -> pa.Array:
    vals = [float(g.coords[0]) if g is not None and g.kind == "Point" else None for g in _geoms(col)]
    return pa.array(vals, type=pa.float64())


def st_y(col) -> pa.Array:
    vals = [float(g.coords[1]) if g is not None and g.kind == "Point" else None for g in _geoms(col)]
    return pa.array(vals, type=pa.float64())


def _env_part(col, i):
    env = _wkb.envelopes_from_wkb(col)  # zero-copy batch scan
    return pa.array(env[:, i], type=pa.float64())


def st_xmin(col):
    return _env_part(col, 0)


def st_ymin(col):
    return _env_part(col, 1)


def st_xmax(col):
    return _env_part(col, 2)


def st_ymax(col):
    return _env_part(col, 3)


def st_npoints(col) -> pa.Array:
    return pa.array([g.num_points() if g is not None else None for g in _geoms(col)], type=pa.int64())


def st_numgeometries(col) -> pa.Array:
    return pa.array([g.num_geometries() if g is not None else None for g in _geoms(col)], type=pa.int64())


def st_geometrytype(col) -> pa.Array:
    return pa.array(["ST_" + g.kind if g is not None else None for g in _geoms(col)], type=pa.string())


def st_isempty(col) -> pa.Array:
    return pa.array([g.is_empty if g is not None else None for g in _geoms(col)], type=pa.bool_())


def st_isclosed(col) -> pa.Array:
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
        elif g.kind in ("LineString", "MultiLineString"):
            closed = all(
                len(l) > 0 and np.array_equal(np.asarray(l)[0], np.asarray(l)[-1])
                for l in ([g.coords] if g.kind == "LineString" else g.coords)
            )
            out.append(closed)
        else:
            out.append(True)
    return pa.array(out, type=pa.bool_())


def st_isring(col) -> pa.Array:
    out = []
    for g in _geoms(col):
        if g is None or g.kind != "LineString":
            out.append(None if g is None else False)
        else:
            arr = np.asarray(g.coords)
            closed = len(arr) >= 4 and np.array_equal(arr[0], arr[-1])
            simple = len(np.unique(arr[:-1], axis=0)) == len(arr) - 1
            out.append(bool(closed and simple))
    return pa.array(out, type=pa.bool_())


def st_issimple(col) -> pa.Array:
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        e = _pred._edges(g)
        if len(e) <= 1:
            out.append(True)
            continue
        _, proper = _pred.segments_intersect_any(e, e, proper_only=True)
        out.append(not proper)
    return pa.array(out, type=pa.bool_())


def st_distance(col_a, col_b) -> pa.Array:
    ga, gb = _geoms(col_a), _geoms(col_b)
    return pa.array(
        [None if a is None or b is None else _ops.distance(a, b) for a, b in zip(ga, gb)],
        type=pa.float64(),
    )


def st_distancesphere(col_a, col_b, radius: float = 6371008.0) -> pa.Array:
    """Haversine great-circle distance between point geometries
    (``common/.../sphere/Haversine.java`` semantics, mean earth radius)."""
    ga, gb = _geoms(col_a), _geoms(col_b)
    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(None)
            continue
        lon1, lat1 = math.radians(a.coords[0]), math.radians(a.coords[1])
        lon2, lat2 = math.radians(b.coords[0]), math.radians(b.coords[1])
        h = math.sin((lat2 - lat1) / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2
        out.append(2 * radius * math.asin(min(1.0, math.sqrt(h))))
    return pa.array(out, type=pa.float64())


def st_hausdorffdistance(col_a, col_b) -> pa.Array:
    ga, gb = _geoms(col_a), _geoms(col_b)
    return pa.array(
        [None if a is None or b is None else _ops.hausdorff_distance(a, b) for a, b in zip(ga, gb)],
        type=pa.float64(),
    )


def st_angle(col_a, col_b) -> pa.Array:
    """Azimuth-style angle between two points (``Functions.java:63`` azimuth)."""
    ga, gb = _geoms(col_a), _geoms(col_b)
    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(None)
        else:
            dx, dy = b.coords[0] - a.coords[0], b.coords[1] - a.coords[1]
            out.append(math.atan2(dx, dy) % (2 * math.pi))
    return pa.array(out, type=pa.float64())


# -- transformers / topology -----------------------------------------------

def _lift(fn):
    def wrapped(col, *args):
        return _wkb_arr([None if g is None else fn(g, *args) for g in _geoms(col)])

    return wrapped


st_centroid = _lift(_ops.centroid)
st_envelope = _lift(_ops.envelope_geom)
st_boundary = _lift(_ops.boundary)
st_convexhull = _lift(_ops.convex_hull)
st_buffer = _lift(_ops.buffer)
st_simplifypreservetopology = _lift(_ops.simplify)
st_translate = _lift(_ops.translate)
st_affine = _lift(_ops.affine)
st_flipcoordinates = _lift(_ops.flip_coordinates)
st_boundingdiagonal = _lift(_ops.bounding_diagonal)
st_geometricmedian = _lift(_ops.geometric_median)
st_makevalid = _lift(_ops.make_valid)


def st_reverse(col) -> pa.Array:
    def rev(g: Geometry) -> Geometry:
        k, c = g.kind, g.coords
        if k in ("LineString", "MultiPoint"):
            return Geometry(k, np.asarray(c)[::-1].copy(), g.srid)
        if k in ("Polygon", "MultiLineString"):
            return Geometry(k, [np.asarray(r)[::-1].copy() for r in c], g.srid)
        if k == "MultiPolygon":
            return Geometry(k, [[np.asarray(r)[::-1].copy() for r in p] for p in c], g.srid)
        return g

    return _wkb_arr([None if g is None else rev(g) for g in _geoms(col)])


def st_reduceprecision(col, digits: int) -> pa.Array:
    def red(g: Geometry) -> Geometry:
        return _map_coords(g, lambda a: np.round(a, digits))

    return _wkb_arr([None if g is None else red(g) for g in _geoms(col)])


def _map_coords(g: Geometry, fn):
    k, c = g.kind, g.coords
    if k == "Point":
        return Geometry(k, fn(np.asarray(c, dtype=np.float64)), g.srid)
    if k in ("LineString", "MultiPoint"):
        return Geometry(k, fn(np.asarray(c, dtype=np.float64)), g.srid)
    if k in ("Polygon", "MultiLineString"):
        return Geometry(k, [fn(np.asarray(r, dtype=np.float64)) for r in c], g.srid)
    if k == "MultiPolygon":
        return Geometry(k, [[fn(np.asarray(r, dtype=np.float64)) for r in p] for p in c], g.srid)
    return Geometry(k, [_map_coords(s, fn) for s in c], g.srid)


def st_pointonsurface(col) -> pa.Array:
    def pos(g: Geometry) -> Geometry:
        c = _ops.centroid(g)
        if g.kind in ("Polygon", "MultiPolygon"):
            if _pred.locate_points_in_geometry(np.array([c.coords[0]]), np.array([c.coords[1]]), g)[0] > 0:
                return c
            pts = g.all_coords()
            return Geometry.point(float(pts[0, 0]), float(pts[0, 1]), g.srid)
        return c

    return _wkb_arr([None if g is None else pos(g) for g in _geoms(col)])


def st_dump(col) -> pa.Array:
    """geometry -> list of part WKBs (ST_Dump, ``Functions.java:620``)."""
    out = []
    for g in _geoms(col):
        out.append(None if g is None else [_wkb.to_wkb(p) for p in g.parts()])
    return pa.array(out, type=pa.list_(pa.binary()))


def st_collectionextract(col, dim: int = 2) -> pa.Array:
    kinds = {0: ("Point", "MultiPoint"), 1: ("LineString", "MultiLineString"), 2: ("Polygon", "MultiPolygon")}[dim]
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        parts = [p for p in g.parts() if p.kind in kinds]
        if not parts:
            out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid))
        elif len(parts) == 1:
            out.append(parts[0])
        else:
            mk = {"Point": GeometryType.MULTIPOINT, "LineString": GeometryType.MULTILINESTRING, "Polygon": GeometryType.MULTIPOLYGON}[parts[0].kind]
            if mk == GeometryType.MULTIPOINT:
                out.append(Geometry(mk, np.vstack([p.coords for p in parts]), g.srid))
            else:
                out.append(Geometry(mk, [p.coords for p in parts], g.srid))
    return _wkb_arr(out)


def st_subdivide(col, max_vertices: int = 256) -> pa.Array:
    """Envelope-quartering subdivision (GeometrySubDivider-lite): recursively
    split a geometry's envelope until each part has <= max_vertices."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        parts = [_wkb.to_wkb(Geometry.box(*p)) for p in _quarter(g, max_vertices)]
        out.append(parts)
    return pa.array(out, type=pa.list_(pa.binary()))


def _quarter(g: Geometry, max_vertices: int, depth: int = 0):
    env = g.envelope()
    if g.num_points() <= max_vertices or depth >= 8:
        return [env]
    minx, miny, maxx, maxy = env
    mx, my = (minx + maxx) / 2, (miny + maxy) / 2
    return [
        (minx, miny, mx, my),
        (mx, miny, maxx, my),
        (minx, my, mx, maxy),
        (mx, my, maxx, maxy),
    ]


def st_setsrid(col, srid: int) -> pa.Array:
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
        else:
            g2 = Geometry(g.kind, g.coords, srid)
            out.append(g2)
    return pa.array([None if g is None else _wkb.to_wkb(g, include_srid=True) for g in out], type=pa.binary())


def st_srid(col) -> pa.Array:
    return pa.array([g.srid if g is not None else None for g in _geoms(col)], type=pa.int32())


# -- serializers ------------------------------------------------------------

def st_astext(col) -> pa.Array:
    return pa.array([_wkt.to_wkt(g) if g is not None else None for g in _geoms(col)], type=pa.string())


def st_asbinary(col) -> pa.Array:
    return pa.array([bytes(b) if b is not None else None for b in _to_list(col)], type=pa.binary())


def st_asgeojson(col) -> pa.Array:
    def gj(g: Geometry):
        k, c = g.kind, g.coords
        if k == "Point":
            coords = list(map(float, c))
        elif k in ("LineString", "MultiPoint"):
            coords = np.asarray(c).tolist()
        elif k in ("Polygon", "MultiLineString"):
            coords = [np.asarray(r).tolist() for r in c]
        elif k == "MultiPolygon":
            coords = [[np.asarray(r).tolist() for r in p] for p in c]
        else:
            return json.dumps(
                {"type": "GeometryCollection", "geometries": [json.loads(gj(s)) for s in c]}
            )
        return json.dumps({"type": k, "coordinates": coords})

    return pa.array([gj(g) if g is not None else None for g in _geoms(col)], type=pa.string())


def st_geomfromgeojson(col) -> pa.Array:
    def parse(s: str) -> Geometry:
        doc = json.loads(s)
        if doc.get("type") == "Feature":
            doc = doc["geometry"]
        k = doc["type"]
        c = doc.get("coordinates")
        if k == "Point":
            return Geometry.point(c[0], c[1])
        if k in ("LineString", "MultiPoint"):
            return Geometry(k, np.asarray(c, dtype=np.float64))
        if k in ("Polygon", "MultiLineString"):
            return Geometry(k, [np.asarray(r, dtype=np.float64) for r in c])
        if k == "MultiPolygon":
            return Geometry(k, [[np.asarray(r, dtype=np.float64) for r in p] for p in c])
        if k == "GeometryCollection":
            return Geometry(k, [parse(json.dumps(s)) for s in doc["geometries"]])
        raise ValueError(k)

    return _wkb_arr([parse(s) if s is not None else None for s in _to_list(col)])


# -- predicates over columns -----------------------------------------------

def _pred_cols(name):
    fn = _pred.PREDICATES[name]

    def wrapped(col_a, col_b) -> pa.Array:
        ga, gb = _geoms(col_a), _geoms(col_b)
        return pa.array(
            [None if a is None or b is None else fn(a, b) for a, b in zip(ga, gb)],
            type=pa.bool_(),
        )

    return wrapped


st_contains = _pred_cols("contains")
st_intersects = _pred_cols("intersects")
st_within = _pred_cols("within")
st_covers = _pred_cols("covers")
st_coveredby = _pred_cols("covered_by")
st_crosses = _pred_cols("crosses")
st_overlaps = _pred_cols("overlaps")
st_touches = _pred_cols("touches")
st_disjoint = _pred_cols("disjoint")
st_equals = _pred_cols("equals")


FUNCTIONS = {
    name[3:]: fn
    for name, fn in list(globals().items())
    if name.startswith("st_") and callable(fn)
}


def st_apply(func_name: str, out_col: str, *in_cols, args=()):
    """Lift an ST_ function into a map_batches stage:
    ``ds.map_batches(st_apply("area", "area", "geom"), batch_format="pyarrow")``."""
    fn = FUNCTIONS[func_name.lower().removeprefix("st_")]

    def stage(batch: pa.Table) -> pa.Table:
        cols = [batch[c] for c in in_cols]
        return batch.append_column(out_col, fn(*cols, *args))

    return stage


# -- linear referencing + extras (geom/linear.py kernels) -------------------

from ..geom import linear as _lin  # noqa: E402


def st_lineinterpolatepoint(col, fraction: float) -> pa.Array:
    return _wkb_arr([None if g is None else _lin.line_interpolate_point(g, fraction) for g in _geoms(col)])


def st_linesubstring(col, start: float, end: float) -> pa.Array:
    return _wkb_arr([None if g is None else _lin.line_substring(g, start, end) for g in _geoms(col)])


def st_linemerge(col) -> pa.Array:
    return _wkb_arr([None if g is None else _lin.line_merge(g) for g in _geoms(col)])


def st_frechetdistance(col_a, col_b) -> pa.Array:
    ga, gb = _geoms(col_a), _geoms(col_b)
    return pa.array(
        [None if a is None or b is None else _lin.frechet_distance(a, b) for a, b in zip(ga, gb)],
        type=pa.float64(),
    )


def st_addpoint(col, point_col, index: int = -1) -> pa.Array:
    ga, gp = _geoms(col), _geoms(point_col)
    return _wkb_arr([_lin.add_point(a, p, index) for a, p in zip(ga, gp)])


def st_removepoint(col, index: int = -1) -> pa.Array:
    return _wkb_arr([_lin.remove_point(g, index) for g in _geoms(col)])


def st_setpoint(col, index: int, point_col) -> pa.Array:
    ga, gp = _geoms(col), _geoms(point_col)
    return _wkb_arr([_lin.set_point(a, index, p) for a, p in zip(ga, gp)])


def st_linefrommultipoint(col) -> pa.Array:
    return _wkb_arr([_lin.line_from_multipoint(g) for g in _geoms(col)])


def st_normalize(col) -> pa.Array:
    return _wkb_arr([None if g is None else _lin.normalize(g) for g in _geoms(col)])


def st_minimumboundingcircle(col, quad_segs: int = 8) -> pa.Array:
    from ..geom.ops import buffer_point

    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        cx, cy, r = _lin.minimum_bounding_circle(g)
        out.append(buffer_point(cx, cy, r, quad_segs, g.srid) if r > 0 else Geometry.point(cx, cy, g.srid))
    return _wkb_arr(out)


def st_intersection(col_a, col_b) -> pa.Array:
    """General polygon intersection: direct Sutherland–Hodgman when one
    operand is convex; otherwise ear-clip triangulation + pairwise convex
    clips (geom/triangulate.py), dissolved to boundary rings with holes
    (geom/dissolve.py) to match the reference's JTS overlayOp output
    (``Functions.java:466``)."""
    from ..geom import triangulate as _tri
    from ..geom.overlay import _is_pure_polygonal, overlay

    out = []
    for a, b in zip(_geoms(col_a), _geoms(col_b)):
        if a is None or b is None:
            out.append(None)
            continue
        if not (_is_pure_polygonal(a) and _is_pure_polygonal(b)):
            # mixed-dimension / collection operands: dimension-dispatch
            # overlay (geom/overlay.py)
            out.append(overlay(a, b, "intersection"))
        elif _is_convex(b):
            out.append(_lin.clip_convex(a, b))
        elif _is_convex(a):
            out.append(_lin.clip_convex(b, a))
        else:
            from ..geom.dissolve import dissolve as _dis

            out.append(_dis(_tri.intersection(a, b)))
    return _wkb_arr(out)


def _is_convex(g: Geometry) -> bool:
    if g.kind != GeometryType.POLYGON or len(g.coords) != 1:
        return False
    r = np.asarray(g.coords[0], dtype=np.float64)
    v = np.diff(r, axis=0)
    cross = v[:-1, 0] * v[1:, 1] - v[:-1, 1] * v[1:, 0]
    nz = cross[cross != 0]
    return bool(len(nz) == 0 or (nz > 0).all() or (nz < 0).all())


def st_azimuth(col_a, col_b) -> pa.Array:
    return st_angle(col_a, col_b)


FUNCTIONS.update(
    {
        name[3:]: fn
        for name, fn in list(globals().items())
        if name.startswith("st_") and callable(fn) and name[3:] not in FUNCTIONS and name != "st_apply"
    }
)


# -- boolean ops (geom/triangulate.py piecewise kernels, dissolved to
#    boundary rings like the reference's JTS overlayOp; geom/dissolve.py) ---

def _dissolved(g: Geometry) -> Geometry:
    """Dissolve a piecewise boolean result into shells+holes. Single-ring
    polygons (the convex-clip fast path) skip the planar overlay."""
    if g.kind == GeometryType.POLYGON and len(g.coords) == 1:
        return g
    from ..geom.dissolve import dissolve

    return dissolve(g)


def _binary_overlay(col_a, col_b, op: str, tri_fn) -> pa.Array:
    """Pure-polygon pairs keep the triangulate+dissolve kernel; any
    mixed-dimension / collection operand routes through geom/overlay.py
    (Functions.java:466,641 — JTS overlay accepts any geometry pair)."""
    from ..geom.overlay import _is_pure_polygonal, overlay

    out = []
    for a, b in zip(_geoms(col_a), _geoms(col_b)):
        if a is None or b is None:
            out.append(None)
        elif _is_pure_polygonal(a) and _is_pure_polygonal(b):
            out.append(_dissolved(tri_fn(a, b)))
        else:
            out.append(overlay(a, b, op))
    return _wkb_arr(out)


def st_difference(col_a, col_b) -> pa.Array:
    from ..geom import triangulate as _tri

    return _binary_overlay(col_a, col_b, "difference", _tri.difference)


def st_union(col_a, col_b) -> pa.Array:
    from ..geom import triangulate as _tri

    return _binary_overlay(col_a, col_b, "union", _tri.union)


def st_symdifference(col_a, col_b) -> pa.Array:
    from ..geom import triangulate as _tri

    return _binary_overlay(col_a, col_b, "sym_difference", _tri.sym_difference)


FUNCTIONS.update(
    {
        name[3:]: fn
        for name, fn in list(globals().items())
        if name.startswith("st_") and callable(fn) and name[3:] not in FUNCTIONS and name != "st_apply"
    }
)


# -- accessor family (reference Functions.java:291-330,384-439,511,692;
#    Predicates.java:47-52) --------------------------------------------------

def _line_coords(g: Geometry):
    return np.asarray(g.coords, dtype=np.float64) if g.kind == GeometryType.LINESTRING else None


def st_pointn(col, n: int) -> pa.Array:
    """N-th point of a LineString, 1-based; negative counts from the end;
    null when out of range or not a LineString (Functions.java:304-318)."""
    out = []
    for g in _geoms(col):
        c = None if g is None else _line_coords(g)
        if c is None:
            out.append(None)
            continue
        i = n - 1 if n > 0 else len(c) + n
        if 0 <= i < len(c):
            out.append(Geometry.point(float(c[i, 0]), float(c[i, 1]), g.srid))
        else:
            out.append(None)
    return _wkb_arr(out)


def st_startpoint(col) -> pa.Array:
    """First point of a LineString, null otherwise (Functions.java:291)."""
    return st_pointn(col, 1)


def st_endpoint(col) -> pa.Array:
    """Last point of a LineString, null otherwise (Functions.java:296)."""
    return st_pointn(col, -1)


def st_exteriorring(col) -> pa.Array:
    """Shell of a Polygon as a LineString; null for other types
    (Functions.java:384)."""
    out = []
    for g in _geoms(col):
        if g is not None and g.kind == GeometryType.POLYGON:
            out.append(Geometry(GeometryType.LINESTRING, np.asarray(g.coords[0], dtype=np.float64), g.srid))
        else:
            out.append(None)
    return _wkb_arr(out)


def st_interiorringn(col, n: int) -> pa.Array:
    """N-th interior ring of a Polygon, 0-based like the reference's JTS
    getInteriorRingN (Functions.java:396); null when out of range."""
    out = []
    for g in _geoms(col):
        if g is not None and g.kind == GeometryType.POLYGON and 0 <= n < len(g.coords) - 1:
            out.append(Geometry(GeometryType.LINESTRING, np.asarray(g.coords[n + 1], dtype=np.float64), g.srid))
        else:
            out.append(None)
    return _wkb_arr(out)


def st_numinteriorrings(col) -> pa.Array:
    """Hole count of a Polygon; null for other types (Functions.java:414)."""
    out = []
    for g in _geoms(col):
        out.append(len(g.coords) - 1 if g is not None and g.kind == GeometryType.POLYGON else None)
    return pa.array(out, type=pa.int32())


def st_geometryn(col, n: int) -> pa.Array:
    """N-th part of a geometry, 0-based like JTS getGeometryN
    (Functions.java:404): the geometry itself for n=0 on simple types."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        parts = list(g.parts())
        out.append(parts[n] if 0 <= n < len(parts) else None)
    return _wkb_arr(out)


def st_dimension(col) -> pa.Array:
    """Topological dimension: 0 points, 1 lines, 2 polygons; collections
    take the max over parts (Functions.java:290-ish semantics)."""
    out = []
    for g in _geoms(col):
        out.append(None if g is None else max(_pred._dim(g), 0))
    return pa.array(out, type=pa.int32())


def st_ndims(col) -> pa.Array:
    """Coordinate dimension — the engine is 2D end-to-end (SURVEY §1.2)."""
    return pa.array([None if g is None else 2 for g in _geoms(col)], type=pa.int32())


def st_collect(*cols) -> pa.Array:
    """Row-wise collect of 2+ geometry columns into MultiPoint /
    MultiLineString / MultiPolygon when homogeneous, else
    GeometryCollection (Functions.java:692 ST_Collect)."""
    geom_cols = [_geoms(c) for c in cols]
    out = []
    for row in zip(*geom_cols):
        parts = [g for g in row if g is not None]
        if not parts:
            out.append(None)
            continue
        out.append(_collect_geoms(parts))
    return _wkb_arr(out)


def _collect_geoms(parts: list[Geometry]) -> Geometry:
    kinds = {p.kind for p in parts}
    srid = parts[0].srid
    if kinds == {GeometryType.POINT}:
        return Geometry(GeometryType.MULTIPOINT, [np.asarray(p.coords, dtype=np.float64) for p in parts], srid)
    if kinds == {GeometryType.LINESTRING}:
        return Geometry(GeometryType.MULTILINESTRING, [np.asarray(p.coords, dtype=np.float64) for p in parts], srid)
    if kinds == {GeometryType.POLYGON}:
        return Geometry(GeometryType.MULTIPOLYGON, [p.coords for p in parts], srid)
    return Geometry(GeometryType.GEOMETRYCOLLECTION, parts, srid)


def st_multi(col) -> pa.Array:
    """Wrap a single geometry into its Multi* variant (Functions.java:689
    ST_Multi); Multi/collection inputs pass through."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
        elif g.kind in (GeometryType.POINT, GeometryType.LINESTRING, GeometryType.POLYGON):
            out.append(_collect_geoms([g]))
        else:
            out.append(g)
    return _wkb_arr(out)


def st_orderingequals(col_a, col_b) -> pa.Array:
    """Exact structural equality: same type, same coordinates in the same
    order (Predicates.java:47-52 ST_OrderingEquals)."""
    out = []
    for a, b in zip(_geoms(col_a), _geoms(col_b)):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(a.kind == b.kind and _coords_equal(a, b))
    return pa.array(out, type=pa.bool_())


def _coords_equal(a: Geometry, b: Geometry) -> bool:
    ca, cb = a.all_coords(), b.all_coords()
    return ca.shape == cb.shape and bool(np.array_equal(ca, cb))


def st_minimumboundingradius(col) -> pa.Array:
    """Struct (center WKB, radius) of the Welzl minimum enclosing circle
    (Functions.java:511 ST_MinimumBoundingRadius)."""
    centers, radii = [], []
    for g in _geoms(col):
        if g is None:
            centers.append(None)
            radii.append(None)
            continue
        cx, cy, r = _lin.minimum_bounding_circle(g)
        centers.append(_wkb.to_wkb(Geometry.point(cx, cy, g.srid)))
        radii.append(float(r))
    return pa.StructArray.from_arrays(
        [pa.array(centers, type=pa.binary()), pa.array(radii, type=pa.float64())],
        names=["center", "radius"],
    )


FUNCTIONS.update(
    {
        name[3:]: fn
        for name, fn in list(globals().items())
        if name.startswith("st_") and callable(fn) and name[3:] not in FUNCTIONS and name != "st_apply"
    }
)


def st_force2d(col) -> pa.Array:
    """Drop Z/M (Functions.java ST_Force_2D) — the engine stores 2D, and
    the WKB reader already projects Z inputs, so this re-encodes as 2D."""
    return _wkb_arr(_geoms(col))


def st_nrings(col) -> pa.Array:
    """Total ring count over all polygon parts (shell + holes;
    Functions.java ST_NRings)."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        n = 0
        for part in g.parts():
            if part.kind == GeometryType.POLYGON:
                n += len(part.coords)
        out.append(n)
    return pa.array(out, type=pa.int32())


def st_points(col) -> pa.Array:
    """Every vertex as a MultiPoint (Functions.java ST_Points)."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        c = g.all_coords()
        out.append(Geometry(GeometryType.MULTIPOINT, [c[i] for i in range(len(c))], g.srid))
    return _wkb_arr(out)


FUNCTIONS.update(
    {
        name[3:]: fn
        for name, fn in list(globals().items())
        if name.startswith("st_") and callable(fn) and name[3:] not in FUNCTIONS and name != "st_apply"
    }
)


# -- Z / 3D family (reference Constructors.java:94 ST_PointZ;
#    Functions.java:92-180 ST_Z/ZMax/ZMin/3DDistance) ------------------------

def st_pointz(x, y, z, srid: int = 0) -> pa.Array:
    """3D point constructor; Z round-trips through ISO-Z WKB."""
    xs, ys, zs = _np(x), _np(y), _np(z)
    return _wkb_arr(
        [Geometry(GeometryType.POINT, np.array([xi, yi], dtype=np.float64), srid, z=float(zi))
         for xi, yi, zi in zip(xs, ys, zs)]
    )


def _z_values(g: Geometry) -> np.ndarray:
    if g is None or getattr(g, "z", None) is None:
        return np.empty(0)
    if g.kind == GeometryType.POINT:
        return np.array([g.z], dtype=np.float64)
    return np.asarray(g.z, dtype=np.float64)


def st_z(col) -> pa.Array:
    """Z of a Point (null for 2D points or other types)."""
    out = []
    for g in _geoms(col):
        out.append(float(g.z) if g is not None and g.kind == GeometryType.POINT and g.z is not None else None)
    return pa.array(out, type=pa.float64())


def st_zmax(col) -> pa.Array:
    out = []
    for g in _geoms(col):
        zs = _z_values(g) if g is not None else np.empty(0)
        out.append(float(zs.max()) if zs.size else None)
    return pa.array(out, type=pa.float64())


def st_zmin(col) -> pa.Array:
    out = []
    for g in _geoms(col):
        zs = _z_values(g) if g is not None else np.empty(0)
        out.append(float(zs.min()) if zs.size else None)
    return pa.array(out, type=pa.float64())


def st_3ddistance(col_a, col_b) -> pa.Array:
    """Euclidean 3D distance between points; a missing Z counts as 0
    (2D inputs therefore degrade to planar distance)."""
    out = []
    for a, b in zip(_geoms(col_a), _geoms(col_b)):
        if a is None or b is None:
            out.append(None)
            continue
        if a.kind == GeometryType.POINT and b.kind == GeometryType.POINT:
            za = a.z if a.z is not None else 0.0
            zb = b.z if b.z is not None else 0.0
            dx, dy, dz = a.coords[0] - b.coords[0], a.coords[1] - b.coords[1], za - zb
            out.append(float(math.sqrt(dx * dx + dy * dy + dz * dz)))
        else:
            out.append(float(_ops.distance(a, b)))
    return pa.array(out, type=pa.float64())


FUNCTIONS.update(
    {
        name[3:]: fn
        for name, fn in list(globals().items())
        if name.startswith("st_") and callable(fn) and name[3:] not in FUNCTIONS and name != "st_apply"
    }
)


# -- hull / split / build-area family (reference Functions.java:450 concave
#    hull, :552 split + utils/GeometrySplitter.java, :340 buildArea,
#    :661 subDivideExplode) ---------------------------------------------------

def st_concavehull(col, k: int = 3, allow_holes: bool = False) -> pa.Array:
    """Concave hull via the Moreira-Santos (2007) k-nearest-neighbors
    algorithm (public): walk the boundary choosing, among the k nearest
    unused points, the largest clockwise turn that does not self-intersect;
    k escalates on failure. Falls back to the convex hull when the point
    set is tiny or the walk cannot close."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        pts = np.unique(g.all_coords(), axis=0)
        out.append(_concave_hull_points(pts, max(3, k), g.srid))
    return _wkb_arr(out)


def _concave_hull_points(pts: np.ndarray, k: int, srid: int) -> Geometry:
    from ..geom.ops import convex_hull

    n = len(pts)
    if n < 4:
        return convex_hull(Geometry(GeometryType.MULTIPOINT, [p for p in pts], srid))
    while k < n:
        hull = _ms_hull(pts, k)
        if hull is not None:
            ring = np.vstack([hull, hull[:1]])
            # every input point must be covered, else escalate k
            from ..geom import predicates as _p

            loc = _p.locate_points_in_ring(pts[:, 0], pts[:, 1], ring)
            if (loc >= _p.BOUNDARY).all():
                return Geometry(GeometryType.POLYGON, [ring], srid)
        k += 1
    return convex_hull(Geometry(GeometryType.MULTIPOINT, [p for p in pts], srid))


def _ms_hull(pts: np.ndarray, k: int):
    """One Moreira-Santos walk attempt; None if the ring cannot close."""
    used = np.zeros(len(pts), dtype=bool)
    start = int(np.lexsort((pts[:, 0], pts[:, 1]))[0])  # lowest y, then x
    hull = [pts[start]]
    used[start] = True
    cur = pts[start]
    prev_angle = 0.0
    for step in range(len(pts) * 2):
        if step >= 3:
            used[start] = False  # allow closing back to start
        cand_idx = np.nonzero(~used)[0]
        if len(cand_idx) == 0:
            return None
        d = np.hypot(pts[cand_idx, 0] - cur[0], pts[cand_idx, 1] - cur[1])
        near = cand_idx[np.argsort(d, kind="stable")[:k]]
        ang = np.arctan2(pts[near, 1] - cur[1], pts[near, 0] - cur[0])
        rel = (prev_angle - ang + 2 * np.pi) % (2 * np.pi)  # largest right turn first
        order = near[np.argsort(-rel, kind="stable")]
        nxt = None
        for cand in order:
            p = pts[cand]
            if len(hull) >= 2 and _segment_hits_chain(hull, cur, p, closing=(cand == start)):
                continue
            nxt = cand
            break
        if nxt is None:
            return None
        if nxt == start:
            return np.array(hull)
        prev_angle = np.arctan2(cur[1] - pts[nxt, 1], cur[0] - pts[nxt, 0])
        cur = pts[nxt]
        hull.append(cur)
        used[nxt] = True
    return None


def _segment_hits_chain(hull, a, b, closing: bool) -> bool:
    from ..geom.predicates import segments_intersect_any

    chain = np.array(hull)
    segs = np.hstack([chain[:-1], chain[1:]])
    if len(segs) == 0:
        return False
    # skip the edge incident to ``a`` (and to the start vertex when closing)
    skip_last = 1
    segs = segs[:-skip_last] if len(segs) > skip_last else np.empty((0, 4))
    if closing and len(segs) > 0:
        segs = segs[1:]
    if len(segs) == 0:
        return False
    hit, _ = segments_intersect_any(np.array([[a[0], a[1], b[0], b[1]]]), segs, proper_only=True)
    return hit


def st_buildarea(col) -> pa.Array:
    """Assemble polygons from the CLOSED rings of a lineal geometry
    (Polygonizer-lite): even-odd nesting — outermost rings become shells,
    rings directly inside a shell become its holes (Functions.java:340)."""
    from ..geom import predicates as _p

    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        rings = []
        for part in g.parts():
            if part.kind != GeometryType.LINESTRING:
                continue
            c = np.asarray(part.coords, dtype=np.float64)
            if len(c) >= 4 and np.array_equal(c[0], c[-1]):
                rings.append(c)
        if not rings:
            out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid))
            continue
        # nesting depth of each ring = number of OTHER rings strictly
        # containing one of its vertices (rings never cross in valid input,
        # so any vertex works; a vertex mean could fall inside a sibling)
        depth = []
        for i, r in enumerate(rings):
            d = 0
            for j, other in enumerate(rings):
                if i != j and _p.locate_points_in_ring(
                    np.array([r[0, 0]]), np.array([r[0, 1]]), other
                )[0] == _p.INTERIOR:
                    d += 1
            depth.append(d)
        polys = []
        for i, r in enumerate(rings):
            if depth[i] % 2 == 0:  # shell
                holes = [rings[j] for j in range(len(rings)) if depth[j] == depth[i] + 1 and _p.locate_points_in_ring(np.array([rings[j][0, 0]]), np.array([rings[j][0, 1]]), r)[0] != _p.EXTERIOR]
                polys.append([r] + holes)
        if not polys:
            out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, [], g.srid))
        elif len(polys) == 1:
            out.append(Geometry(GeometryType.POLYGON, polys[0], g.srid))
        else:
            out.append(Geometry(GeometryType.MULTIPOLYGON, polys, g.srid))
    return _wkb_arr(out)


def st_split(col, blade_col) -> pa.Array:
    """Split by a blade (GeometrySplitter.java semantics, scoped):
    * LineString split by Point(s) ON the line -> GeometryCollection of
      sub-linestrings
    * Polygon split by a STRAIGHT LineString (first-last vertices define
      the cut line) -> GeometryCollection of the two sides' pieces
    Returns the input unchanged when the blade misses."""
    from ..geom import triangulate as _tri
    from ..geom.linear import split_line_at_points

    out = []
    for g, blade in zip(_geoms(col), _geoms(blade_col)):
        if g is None or blade is None:
            out.append(None)
            continue
        if g.kind == GeometryType.LINESTRING and blade.kind in (GeometryType.POINT, GeometryType.MULTIPOINT):
            pts = blade.all_coords()
            parts = split_line_at_points(g, pts)
            out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, parts, g.srid))
        elif g.kind in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON) and blade.kind == GeometryType.LINESTRING:
            bc = np.asarray(blade.coords, dtype=np.float64)
            a, b = bc[0], bc[-1]
            left, right = [], []
            for piece in _tri._convex_pieces(g):
                ring = np.asarray(piece.coords[0], dtype=np.float64)[:-1]
                lp = _tri._clip_halfplane(ring, a, b, keep_left=True)
                rp = _tri._clip_halfplane(ring, a, b, keep_left=False)
                if len(lp) >= 3:
                    left.append(Geometry.polygon(lp))
                if len(rp) >= 3:
                    right.append(Geometry.polygon(rp))
            if not left or not right:  # blade misses: return input unchanged
                out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, [g], g.srid))
            else:
                out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, left + right, g.srid))
        else:
            out.append(Geometry(GeometryType.GEOMETRYCOLLECTION, [g], g.srid))
    return _wkb_arr(out)


def st_subdivideexplode_fn(geom_col: str = "geom", max_vertices: int = 256):
    """flat_map-style map_batches stage for ST_SubDivideExplode
    (Functions.java:661): one output ROW per subdivision part, other
    columns replicated."""

    def fn(batch: pa.Table) -> pa.Table:
        parts_col = st_subdivide(batch[geom_col], max_vertices)
        lengths = np.array([len(v) if v is not None else 0 for v in parts_col.to_pylist()])
        idx = np.repeat(np.arange(batch.num_rows), lengths)
        flat = [p for v in parts_col.to_pylist() if v for p in v]
        out = batch.take(pa.array(idx))
        out = out.set_column(out.schema.get_field_index(geom_col), geom_col, pa.array(flat, type=pa.binary()))
        return out

    return fn


# -- GML / KML constructors (Constructors.java:160-164) ----------------------

def st_geomfromgml(col) -> pa.Array:
    from ..geom import markup as _markup

    return _wkb_arr([None if s is None else _markup.from_gml(s) for s in _to_list(col)])


def st_geomfromkml(col) -> pa.Array:
    from ..geom import markup as _markup

    return _wkb_arr([None if s is None else _markup.from_kml(s) for s in _to_list(col)])


# -- catalog completion: aliases, typed FromText, spheroid, misc
#    (Constructors.java:50-138, Functions.java spheroid/force/dump family) --

st_aswkb = st_asbinary
st_aswkt = st_astext
st_geomfromtext = st_geomfromwkt
st_precisionreduce = st_reduceprecision


def _coords2(a: np.ndarray, fn):
    """Apply an (n,2)->(n,2) transform to coords of any stored shape."""
    arr = np.asarray(a, dtype=np.float64)
    flat = arr.reshape(-1, 2)
    return fn(flat).reshape(arr.shape)


_SPLITTERS = {"csv": ",", "tsv": "\t"}


def _from_text_one(s: str, fmt: str, want: str | None):
    """Constructors.geomFromText semantics: fmt 'wkt' parses WKT; 'csv'/'tsv'
    parse a delimited coordinate sequence as the wanted type; a parsed
    geometry of the wrong type -> None (reference returns null)."""
    if fmt.lower() == "wkt":
        g = _wkt.from_wkt(s)
    else:
        delim = _SPLITTERS[fmt.lower()]
        vals = [float(v) for v in s.strip().split(delim)]
        pts = np.asarray(vals, dtype=np.float64).reshape(-1, 2)
        if want == "Point":
            g = Geometry.point(pts[0, 0], pts[0, 1])
        elif want == "LineString":
            g = Geometry(GeometryType.LINESTRING, pts)
        elif want == "Polygon":
            g = Geometry.polygon(pts)
        else:
            raise ValueError(f"csv/tsv parse needs a target type, got {want}")
    if want is not None and str(g.kind) not in (want, f"Multi{want}"):
        return None
    return g


def st_pointfromtext(col, fmt: str = "csv") -> pa.Array:
    return _wkb_arr([None if s is None else _from_text_one(s, fmt, "Point") for s in _to_list(col)])


def st_linefromtext(col, fmt: str = "wkt") -> pa.Array:
    return _wkb_arr([None if s is None else _from_text_one(s, fmt, "LineString") for s in _to_list(col)])


def st_linestringfromtext(col, fmt: str = "csv") -> pa.Array:
    return _wkb_arr([None if s is None else _from_text_one(s, fmt, "LineString") for s in _to_list(col)])


def st_polygonfromtext(col, fmt: str = "csv") -> pa.Array:
    return _wkb_arr([None if s is None else _from_text_one(s, fmt, "Polygon") for s in _to_list(col)])


def _prefixed_wkt(col, prefix: str, srid: int) -> pa.Array:
    out = []
    for s in _to_list(col):
        if s is None or not s.lstrip().upper().startswith(prefix):
            out.append(None)
            continue
        g = _wkt.from_wkt(s)
        g.srid = srid
        out.append(g)
    return _wkb_arr(out)


def st_mlinefromtext(col, srid: int = 0) -> pa.Array:
    """null unless the text starts with MULTILINESTRING (Constructors.java:50)."""
    return _prefixed_wkt(col, "MULTILINESTRING", srid)


def st_mpolyfromtext(col, srid: int = 0) -> pa.Array:
    """null unless the text starts with MULTIPOLYGON (Constructors.java:58)."""
    return _prefixed_wkt(col, "MULTIPOLYGON", srid)


def st_asewkb(col) -> pa.Array:
    return pa.array(
        [None if g is None else _wkb.to_wkb(g, include_srid=True) for g in _geoms(col)],
        type=pa.binary(),
    )


def st_asewkt(col) -> pa.Array:
    def ewkt(g: Geometry) -> str:
        t = _wkt.to_wkt(g)
        return f"SRID={g.srid};{t}" if g.srid else t

    return pa.array([None if g is None else ewkt(g) for g in _geoms(col)], type=pa.string())


def st_degrees(col) -> pa.Array:
    """radians -> degrees over a NUMERIC column (Functions.java degrees)."""
    vals = np.asarray(_to_list(col), dtype=np.float64)
    return pa.array(np.degrees(vals))


def st_dumppoints(col) -> pa.Array:
    """Every vertex as a Point WKB, one list per input geometry
    (Functions.java dumpPoints)."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        pts = np.asarray(g.all_coords(), dtype=np.float64).reshape(-1, 2)
        out.append([_wkb.to_wkb(Geometry.point(x, y)) for x, y in pts])
    return pa.array(out, type=pa.list_(pa.binary()))


def st_numpoints(col) -> pa.Array:
    """Vertex count of a LINESTRING; None for other types (the reference
    throws — Functions.java numPoints accepts only LineString)."""
    return pa.array(
        [
            None if g is None or g.kind != GeometryType.LINESTRING else len(np.asarray(g.coords))
            for g in _geoms(col)
        ],
        type=pa.int64(),
    )


def st_force3d(col, z: float = 0.0) -> pa.Array:
    """Add a constant Z to points/linestrings (the kinds whose Z survives
    our WKB writer, geom/wkb.py _write_geom); other kinds pass through
    unchanged (Functions.java force3D)."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        if g.kind in (GeometryType.POINT, GeometryType.LINESTRING) and getattr(g, "z", None) is None:
            g2 = Geometry(g.kind, g.coords, g.srid)
            # z storage convention (core.py): float for Point, (n,) for LineString
            g2.z = float(z) if g.kind == GeometryType.POINT else np.full(len(np.asarray(g.coords)), float(z))
            out.append(g2)
        else:
            out.append(g)
    return _wkb_arr(out)


def st_force_2d(col) -> pa.Array:
    """Drop Z (Functions.java force2D)."""
    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        if getattr(g, "z", None) is not None:
            g2 = Geometry(g.kind, g.coords, g.srid)
            g2.z = None
            out.append(g2)
        else:
            out.append(g)
    return _wkb_arr(out)


def st_force2d(col) -> pa.Array:
    return st_force_2d(col)


def st_isvalid(col) -> pa.Array:
    """OGC-style validity for the kinds we model: polygon rings closed with
    >= 4 points and no PROPER self-intersection (bowtie crossing; adjacent
    segments touching at shared vertices are fine); a linestring needs
    >= 2 points; points need finite coords."""
    from ..geom.predicates import segments_intersect_any

    def ring_ok(r: np.ndarray) -> bool:
        if len(r) < 4 or not np.array_equal(r[0], r[-1]):
            return False
        segs = np.column_stack([r[:-1], r[1:]])
        _, proper = segments_intersect_any(segs, segs, proper_only=True)
        return not proper

    def valid(g: Geometry) -> bool:
        if g.kind == GeometryType.POINT:
            return bool(np.all(np.isfinite(np.asarray(g.all_coords(), dtype=np.float64))))
        if g.kind == GeometryType.LINESTRING:
            return len(np.asarray(g.coords)) >= 2
        if g.kind == GeometryType.POLYGON:
            rings = g.coords if isinstance(g.coords, list) else [g.coords]
            return all(ring_ok(np.asarray(r, dtype=np.float64)) for r in rings)
        return all(valid(p) for p in g.parts())

    return pa.array([None if g is None else valid(g) for g in _geoms(col)], type=pa.bool_())


def st_geohash(col, precision: int = 12) -> pa.Array:
    """Point geometry -> geohash string (Functions.java geohash)."""
    gs = _geoms(col)
    out = []
    for g in gs:
        if g is None or g.kind != GeometryType.POINT:
            out.append(None)
            continue
        x, y = np.asarray(g.all_coords(), dtype=np.float64).reshape(-1, 2)[0]
        out.append(_geohash.encode(float(x), float(y), precision))
    return pa.array(out, type=pa.string())


def st_s2cellids(col, level: int = 10) -> pa.Array:
    """S2 cell cover of each geometry at ``level`` (Functions.java
    s2CellIDs), via the same cover the cell-join plan uses."""
    from ..encoders.s2 import cover_geometry

    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        out.append([int(c) for c in cover_geometry(g, level)])
    return pa.array(out, type=pa.list_(pa.uint64()))


def st_transform(col, src: str, dst: str) -> pa.Array:
    """Reproject every coordinate of each geometry (Functions.java:184-212
    ST_Transform; supported CRSs per functions/transform.py)."""
    from .transform import transform_xy

    def tx(flat: np.ndarray) -> np.ndarray:
        x, y = transform_xy(src, dst, flat[:, 0], flat[:, 1])
        return np.column_stack([x, y])

    return _wkb_arr(
        [None if g is None else _map_coords(g, lambda a: _coords2(a, tx)) for g in _geoms(col)]
    )


def st_distancespheroid(col_a, col_b) -> pa.Array:
    """WGS84 spheroid distance between point pairs (Vincenty inverse;
    sphere/Spheroid.java semantics). All-point batches take the
    vectorized path (batch WKB extract + one array Vincenty pass); mixed
    or null rows fall back to the per-row kernel."""
    from .transform import vincenty_distance, vincenty_distance_arr

    def _blob(v):
        return v if isinstance(v, (bytes, bytearray)) or v is None else v.as_py()

    a_vals = [_blob(v) for v in col_a]
    b_vals = [_blob(v) for v in col_b]
    if a_vals and all(
        v is not None and len(v) == 21 and v[0] == 1 for v in a_vals
    ) and all(v is not None and len(v) == 21 and v[0] == 1 for v in b_vals):
        from ..geom.wkb import points_from_wkb

        x1, y1 = points_from_wkb(a_vals)
        x2, y2 = points_from_wkb(b_vals)
        return pa.array(vincenty_distance_arr(x1, y1, x2, y2), type=pa.float64())
    out = []
    for a, b in zip(_geoms(col_a), _geoms(col_b)):
        if a is None or b is None:
            out.append(None)
            continue
        pa_, pb = a.all_coords()[0], b.all_coords()[0]
        out.append(vincenty_distance(pa_[0], pa_[1], pb[0], pb[1]))
    return pa.array(out, type=pa.float64())


def st_lengthspheroid(col) -> pa.Array:
    """Sum of Vincenty segment lengths along a linestring (meters)."""
    from .transform import vincenty_distance

    out = []
    for g in _geoms(col):
        if g is None:
            out.append(None)
            continue
        c = np.asarray(g.all_coords(), dtype=np.float64).reshape(-1, 2)
        out.append(
            float(sum(vincenty_distance(c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]) for i in range(len(c) - 1)))
        )
    return pa.array(out, type=pa.float64())


_AUTHALIC_R = 6371007.1809  # WGS84 authalic sphere radius (public constant)


def st_areaspheroid(col) -> pa.Array:
    """Polygon area in m^2 on the WGS84 AUTHALIC sphere (l'Huilier
    spherical-excess sum) — a documented approximation of the reference's
    GeographicLib spheroid area (relative error < ~0.3%)."""
    def ring_area(r: np.ndarray) -> float:
        lon = np.radians(r[:, 0])
        lat = np.radians(r[:, 1])
        # spherical excess via the shoelace-on-sphere formula
        s = np.sum((lon[1:] - lon[:-1]) * (2.0 + np.sin(lat[1:]) + np.sin(lat[:-1])))
        return abs(s) * _AUTHALIC_R * _AUTHALIC_R / 2.0

    def area(g: Geometry) -> float:
        if g.kind == GeometryType.POLYGON:
            rings = g.coords if isinstance(g.coords, list) else [g.coords]
            a = ring_area(np.asarray(rings[0], dtype=np.float64))
            for h in rings[1:]:
                a -= ring_area(np.asarray(h, dtype=np.float64))
            return a
        if g.kind == GeometryType.MULTIPOLYGON:
            return float(sum(area(p) for p in g.parts()))
        return 0.0

    return pa.array([None if g is None else area(g) for g in _geoms(col)], type=pa.float64())


def st_asgml(col) -> pa.Array:
    from ..geom import markup as _markup

    return pa.array(
        [None if g is None else _markup.to_gml(g) for g in _geoms(col)], type=pa.string()
    )


def st_askml(col) -> pa.Array:
    from ..geom import markup as _markup

    return pa.array(
        [None if g is None else _markup.to_kml(g) for g in _geoms(col)], type=pa.string()
    )


FUNCTIONS.update(
    {
        name[3:]: fn
        for name, fn in list(globals().items())
        if name.startswith("st_") and callable(fn) and name[3:] not in FUNCTIONS and name != "st_apply"
    }
)
