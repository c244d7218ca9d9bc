"""Linear referencing, Fréchet, normalize, min bounding circle, convex clip."""

import numpy as np
import pytest

from incubator_sedona_ray.functions import st as S
from incubator_sedona_ray.geom import Geometry, GeometryType
from incubator_sedona_ray.geom.linear import (
    clip_convex,
    frechet_distance,
    line_interpolate_point,
    line_merge,
    line_substring,
    minimum_bounding_circle,
    normalize,
)
from incubator_sedona_ray.geom import ops
from incubator_sedona_ray.geom.wkb import from_wkb, to_wkb


def test_line_interpolate_and_substring():
    line = Geometry.linestring([[0, 0], [10, 0], [10, 10]])
    p = line_interpolate_point(line, 0.5)
    np.testing.assert_allclose(p.coords, [10, 0])  # half of 20 = at the corner
    p = line_interpolate_point(line, 0.25)
    np.testing.assert_allclose(p.coords, [5, 0])
    sub = line_substring(line, 0.25, 0.75)
    np.testing.assert_allclose(sub.coords, [[5, 0], [10, 0], [10, 5]])
    assert abs(ops.length(sub) - 10) < 1e-12


def test_line_merge():
    ml = Geometry(GeometryType.MULTILINESTRING, [
        np.array([[0.0, 0], [1, 0]]),
        np.array([[2.0, 0], [1, 0]]),       # reversed connection
        np.array([[2.0, 0], [3, 0]]),
    ])
    m = line_merge(ml)
    assert m.kind == "LineString"
    assert ops.length(m) == 3.0
    # disconnected parts stay multi
    ml2 = Geometry(GeometryType.MULTILINESTRING, [np.array([[0.0, 0], [1, 0]]), np.array([[5.0, 5], [6, 5]])])
    assert line_merge(ml2).kind == "MultiLineString"


def test_frechet():
    a = Geometry.linestring([[0, 0], [1, 0], [2, 0]])
    b = Geometry.linestring([[0, 1], [1, 1], [2, 1]])
    assert frechet_distance(a, b) == 1.0
    assert frechet_distance(a, a) == 0.0


def test_normalize():
    # CW and CCW squares normalize to the same bytes
    ccw = Geometry.polygon([[0, 0], [2, 0], [2, 2], [0, 2]])
    cw = Geometry.polygon([[0, 0], [0, 2], [2, 2], [2, 0]])
    assert to_wkb(normalize(ccw)) == to_wkb(normalize(cw))
    # rotation-invariant
    rot = Geometry.polygon([[2, 2], [0, 2], [0, 0], [2, 0]])
    assert to_wkb(normalize(rot)) == to_wkb(normalize(ccw))


def test_minimum_bounding_circle():
    g = Geometry(GeometryType.MULTIPOINT, np.array([[0.0, 0], [2, 0], [1, 1]]))
    cx, cy, r = minimum_bounding_circle(g)
    np.testing.assert_allclose([cx, cy, r], [1.0, 0.0, 1.0])
    # square: circumscribed circle
    sq = Geometry.box(0, 0, 2, 2)
    cx, cy, r = minimum_bounding_circle(sq)
    np.testing.assert_allclose([cx, cy], [1, 1])
    np.testing.assert_allclose(r, np.sqrt(2))


def test_clip_convex():
    subj = Geometry.box(0, 0, 4, 4)
    clip = Geometry.box(2, 2, 6, 6)
    inter = clip_convex(subj, clip)
    assert ops.area(inter) == 4.0
    assert inter.envelope() == (2, 2, 4, 4)
    # disjoint -> empty
    assert clip_convex(Geometry.box(0, 0, 1, 1), Geometry.box(5, 5, 6, 6)).is_empty
    # triangle x+y<=8 covers the whole 4x4 square -> clip returns the square
    tri = Geometry.polygon([[0, 0], [8, 0], [0, 8]])
    out = clip_convex(tri, Geometry.box(0, 0, 4, 4))
    assert ops.area(out) == 16.0
    # and a genuinely cut case: triangle x+y<=4 within the square -> half
    tri2 = Geometry.polygon([[0, 0], [4, 0], [0, 4]])
    out2 = clip_convex(Geometry.box(0, 0, 4, 4), tri2)
    assert ops.area(out2) == 8.0


def test_st_wrappers():
    line = to_wkb(Geometry.linestring([[0, 0], [10, 0]]))
    p = S.st_lineinterpolatepoint([line], 0.3)
    assert from_wkb(p[0].as_py()) == Geometry.point(3, 0)
    sub = S.st_linesubstring([line], 0.1, 0.2)
    assert ops.length(from_wkb(sub[0].as_py())) == 1.0
    f = S.st_frechetdistance([line], [to_wkb(Geometry.linestring([[0, 2], [10, 2]]))])
    assert f.to_pylist() == [2.0]
    mbc = S.st_minimumboundingcircle([to_wkb(Geometry.box(0, 0, 2, 2))])
    g = from_wkb(mbc[0].as_py())
    assert abs(ops.area(g) - np.pi * 2) < 0.3  # area of r=sqrt(2) circle approx (32-gon)
    added = S.st_addpoint([line], [to_wkb(Geometry.point(20, 0))])
    assert from_wkb(added[0].as_py()).num_points() == 3
    inter = S.st_intersection([to_wkb(Geometry.box(0, 0, 4, 4))], [to_wkb(Geometry.box(2, 2, 6, 6))])
    assert ops.area(from_wkb(inter[0].as_py())) == 4.0
    az = S.st_azimuth([to_wkb(Geometry.point(0, 0))], [to_wkb(Geometry.point(1, 1))])
    assert abs(az.to_pylist()[0] - np.pi / 4) < 1e-12


def test_triangulation_and_general_intersection():
    from incubator_sedona_ray.geom.triangulate import intersection, intersection_aggr, triangulate

    # L-shape: area 3 (unit squares at (0,0),(1,0),(0,1))
    L = Geometry.polygon([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]])
    tris = triangulate(L)
    assert abs(sum(ops.area(Geometry.polygon(t)) for t in tris) - 3.0) < 1e-9
    # L ∩ L = L (area 3)
    assert abs(ops.area(intersection(L, L)) - 3.0) < 1e-9
    # two L-shapes rotated into a plus-like overlap
    from incubator_sedona_ray.geom.ops import translate

    L2 = translate(L, 0.5, 0.5)
    inter = intersection(L, L2)
    # closed form: overlap of the two L's = 1.75
    # verify against a fine-grid Monte-Carlo-free rasterization
    import numpy as np
    xs, ys = np.meshgrid(np.arange(0.005, 2.6, 0.01), np.arange(0.005, 2.6, 0.01))
    import incubator_sedona_ray.geom.predicates as P2
    in1 = P2.locate_points_in_geometry(xs.ravel(), ys.ravel(), L) > 0
    in2 = P2.locate_points_in_geometry(xs.ravel(), ys.ravel(), L2) > 0
    grid_area = (in1 & in2).sum() * 0.01 * 0.01
    assert abs(ops.area(inter) - grid_area) < 0.02
    # concave ∩ concave disjoint -> empty
    far = translate(L, 10, 10)
    assert intersection(L, far).is_empty
    # fold aggregate: three boxes
    boxes = [Geometry.box(0, 0, 4, 4), Geometry.box(1, 1, 5, 5), Geometry.box(2, 0, 6, 6)]
    agg = intersection_aggr(boxes)
    assert abs(ops.area(agg) - ops.area(Geometry.box(2, 1, 4, 4))) < 1e-9


def test_st_intersection_concave():
    L = Geometry.polygon([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]])
    Lw = to_wkb(L)
    out = S.st_intersection([Lw], [Lw])
    assert abs(ops.area(from_wkb(out[0].as_py())) - 3.0) < 1e-9


def test_boolean_ops_piecewise():
    from incubator_sedona_ray.geom.triangulate import difference, sym_difference, union, union_aggr_general

    A = Geometry.box(0, 0, 4, 4)
    B = Geometry.box(2, 2, 6, 6)
    assert abs(ops.area(difference(A, B)) - 12.0) < 1e-9   # 16 - 4 overlap
    assert abs(ops.area(union(A, B)) - 28.0) < 1e-9        # 16 + 16 - 4
    assert abs(ops.area(sym_difference(A, B)) - 24.0) < 1e-9
    # disjoint
    C = Geometry.box(10, 10, 11, 11)
    assert abs(ops.area(union(A, C)) - 17.0) < 1e-9
    assert abs(ops.area(difference(A, C)) - 16.0) < 1e-9
    # contained
    D = Geometry.box(1, 1, 2, 2)
    assert ops.area(difference(D, A)) < 1e-12
    assert abs(ops.area(difference(A, D)) - 15.0) < 1e-9
    # concave operand
    L = Geometry.polygon([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]])
    assert abs(ops.area(union(L, Geometry.box(0, 0, 2, 2))) - 4.0) < 1e-9
    assert abs(ops.area(difference(Geometry.box(0, 0, 2, 2), L)) - 1.0) < 1e-9
    # overlapping union aggregate (previously NotImplemented)
    agg = union_aggr_general([Geometry.box(0, 0, 4, 4), Geometry.box(2, 2, 6, 6), Geometry.box(10, 0, 11, 1)])
    assert abs(ops.area(agg) - 29.0) < 1e-9
