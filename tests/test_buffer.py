"""ST_Buffer: round-join Minkowski buffer over the convex-piece union fold
(geom/ops.py buffer), dissolved to boundary rings. Reference semantics:
JTS BufferOp via ``Functions.java:80`` (same 4*quad_segs discretization;
the inscribed arc polygon's area is slightly below the true circle's).
"""

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.functions import st
from incubator_sedona_ray.geom import ops
from incubator_sedona_ray.geom.core import Geometry, GeometryType
from incubator_sedona_ray.geom.wkb import from_wkb, to_wkb


SQ = Geometry.polygon([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])


def n32_area(r):
    # area of the inscribed 32-gon "disc" used by quad_segs=8
    return 32 * 0.5 * r * r * np.sin(2 * np.pi / 32)


class TestLineBuffer:
    def test_capsule(self):
        b = ops.buffer(Geometry.linestring([[0, 0], [10, 0]]), 1.0)
        assert b.kind == GeometryType.POLYGON
        assert len(b.coords) == 1
        assert ops.area(b) == pytest.approx(20 + n32_area(1.0), rel=1e-9)

    def test_bend_join(self):
        # right-angle bend: area = two rects + disc wedges - inner overlap,
        # bounded between the union lower bound and rect-sum upper bound
        b = ops.buffer(Geometry.linestring([[0, 0], [10, 0], [10, 10]]), 1.0)
        assert b.kind == GeometryType.POLYGON
        a = ops.area(b)
        assert 38 < a < 40 + np.pi + 1

    def test_negative_is_empty(self):
        assert ops.buffer(Geometry.linestring([[0, 0], [1, 0]]), -0.5).is_empty

    def test_covers_path_points(self):
        from incubator_sedona_ray.geom import predicates as P

        path = np.array([[0.0, 0], [3, 1], [6, -1], [9, 0]])
        b = ops.buffer(Geometry.linestring(path), 0.5)
        for p in path:
            assert P.covers(b, Geometry.point(float(p[0]), float(p[1])))


class TestPolygonBuffer:
    def test_expand_square(self):
        b = ops.buffer(SQ, 1.0)
        assert b.kind == GeometryType.POLYGON
        assert len(b.coords) == 1
        assert ops.area(b) == pytest.approx(100 + 40 + n32_area(1.0), rel=1e-9)

    def test_erode_square(self):
        b = ops.buffer(SQ, -1.0)
        assert b.kind == GeometryType.POLYGON
        assert ops.area(b) == pytest.approx(64.0, rel=1e-9)

    def test_erode_away_entirely(self):
        small = Geometry.polygon([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
        assert ops.buffer(small, -2.0).is_empty

    def test_donut_buffer_keeps_hole(self):
        donut = Geometry.polygon(
            [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
            holes=[[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]],
        )
        b = ops.buffer(donut, 0.5)
        assert b.kind == GeometryType.POLYGON
        assert len(b.coords) == 2  # hole shrinks but survives
        # outer boundary gains rounded corners; the hole ERODES to a sharp
        # 3x3 square (erosion of a convex region keeps corners sharp)
        exact = (100 + 20 + n32_area(0.5)) - 9.0
        assert ops.area(b) == pytest.approx(exact, rel=1e-9)

    def test_concave_buffer(self):
        u = Geometry.polygon(
            [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10], [0, 0]]
        )
        area_in = ops.area(u)
        b = ops.buffer(u, 0.25)
        assert ops.area(b) > area_in
        # erosion strictly shrinks
        e = ops.buffer(u, -0.25)
        assert 0 < ops.area(e) < area_in

    def test_srid_preserved(self):
        g = Geometry.polygon([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], srid=3857)
        assert ops.buffer(g, 0.5).srid == 3857


class TestMultiAndPoint:
    def test_point_unchanged_fast_path(self):
        b = ops.buffer(Geometry.point(2, 3), 1.0)
        assert b.kind == GeometryType.POLYGON
        assert ops.area(b) == pytest.approx(n32_area(1.0))

    def test_multipoint_disjoint_discs(self):
        mp = Geometry(GeometryType.MULTIPOINT, np.array([[0.0, 0], [10, 0]]))
        b = ops.buffer(mp, 1.0)
        assert b.kind == GeometryType.MULTIPOLYGON
        assert ops.area(b) == pytest.approx(2 * n32_area(1.0), rel=1e-9)

    def test_multipoint_merging_discs(self):
        mp = Geometry(GeometryType.MULTIPOINT, np.array([[0.0, 0], [1.0, 0]]))
        b = ops.buffer(mp, 1.0)
        assert b.kind == GeometryType.POLYGON  # overlapping discs dissolve


class TestSTSurface:
    def test_st_buffer_wkb_roundtrip(self):
        arr = pa.array([to_wkb(SQ), to_wkb(Geometry.linestring([[0, 0], [5, 0]])), None])
        out = st.st_buffer(arr, 1.0)
        g0 = from_wkb(out[0].as_py())
        g1 = from_wkb(out[1].as_py())
        assert g0.kind == GeometryType.POLYGON
        assert ops.area(g0) == pytest.approx(140 + n32_area(1.0), rel=1e-9)
        assert ops.area(g1) == pytest.approx(10 + n32_area(1.0), rel=1e-9)
        assert not out[2].is_valid
