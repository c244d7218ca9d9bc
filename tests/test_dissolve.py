"""Dissolve piecewise boolean results into shells + holes (geom/dissolve.py).

The triangulated boolean kernel returns exact convex-piece tilings; the
reference (JTS overlayOp, common/.../Functions.java:466,541) returns
dissolved rings. These tests pin ring-level parity: area preserved,
interior edges removed, holes reattached, and the ST_ surface emitting
proper Polygon/MultiPolygon WKB.
"""

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.geom.core import Geometry, GeometryType
from incubator_sedona_ray.geom.dissolve import dissolve, dissolve_rings
from incubator_sedona_ray.geom.ops import ring_area
from incubator_sedona_ray.geom import triangulate as tri
from incubator_sedona_ray.geom.wkb import from_wkb, to_wkb
from incubator_sedona_ray.functions import st


def Poly(*rings):
    return Geometry(GeometryType.POLYGON, [np.asarray(r, float) for r in rings])


def poly_area(g: Geometry) -> float:
    tot = 0.0
    for part in g.parts():
        if part.kind != GeometryType.POLYGON:
            continue
        for i, ring in enumerate(part.coords):
            r = np.asarray(ring, float)
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            a = abs(ring_area(r))
            tot += a if i == 0 else -a
    return tot


def ring_count(g: Geometry) -> int:
    return sum(len(p.coords) for p in g.parts() if p.kind == GeometryType.POLYGON)


SQ = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
U_SHAPE = Poly([[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10], [0, 0]])


class TestDissolveRings:
    def test_two_triangles_make_square(self):
        out = dissolve_rings(
            [np.array([[0.0, 0], [1, 0], [1, 1]]), np.array([[0.0, 0], [1, 1], [0, 1]])]
        )
        assert out.kind == GeometryType.POLYGON
        assert len(out.coords) == 1
        ring = np.asarray(out.coords[0], float)
        # 4 corners, diagonal gone
        assert len(ring) - 1 == 4
        assert poly_area(out) == pytest.approx(1.0)

    def test_frame_pieces_make_donut(self):
        # four rectangles tiling a square frame around a 4x4 hole
        pieces = [
            np.array([[0.0, 0], [10, 0], [10, 3], [0, 3]]),
            np.array([[0.0, 7], [10, 7], [10, 10], [0, 10]]),
            np.array([[0.0, 3], [3, 3], [3, 7], [0, 7]]),
            np.array([[7.0, 3], [10, 3], [10, 7], [7, 7]]),
        ]
        out = dissolve_rings(pieces)
        assert out.kind == GeometryType.POLYGON
        assert len(out.coords) == 2  # shell + hole
        assert poly_area(out) == pytest.approx(100 - 16)
        hole = np.asarray(out.coords[1], float)
        assert ring_area(hole if np.array_equal(hole[0], hole[-1]) else np.vstack([hole, hole[:1]])) < 0

    def test_disjoint_pieces_make_multipolygon(self):
        out = dissolve_rings(
            [np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]]), np.array([[5.0, 5], [6, 5], [6, 6], [5, 6]])]
        )
        assert out.kind == GeometryType.MULTIPOLYGON
        assert poly_area(out) == pytest.approx(2.0)

    def test_t_junction_noding(self):
        # left piece's edge at x=1 spans y 0..2; right pieces stack two 1x1
        # squares against it — T-junction vertices at (1,1) must node.
        pieces = [
            np.array([[0.0, 0], [1, 0], [1, 2], [0, 2]]),
            np.array([[1.0, 0], [2, 0], [2, 1], [1, 1]]),
            np.array([[1.0, 1], [2, 1], [2, 2], [1, 2]]),
        ]
        out = dissolve_rings(pieces)
        assert out.kind == GeometryType.POLYGON
        assert len(out.coords) == 1
        assert poly_area(out) == pytest.approx(4.0)


class TestDissolveBooleans:
    def test_union_of_overlapping_squares(self):
        a = Poly(SQ)
        b = Poly([[5.0, 5], [15, 5], [15, 15], [5, 15], [5, 5]])
        out = dissolve(tri.union(a, b))
        assert out.kind == GeometryType.POLYGON
        assert len(out.coords) == 1
        assert poly_area(out) == pytest.approx(100 + 100 - 25)
        # L-shaped union boundary has 8 corners
        assert len(np.asarray(out.coords[0])) - 1 == 8

    def test_difference_creates_hole(self):
        outer = Poly(SQ)
        inner = Poly([[3.0, 3], [7, 3], [7, 7], [3, 7], [3, 3]])
        out = dissolve(tri.difference(outer, inner))
        assert out.kind == GeometryType.POLYGON
        assert len(out.coords) == 2
        assert poly_area(out) == pytest.approx(100 - 16)

    def test_sym_difference_concave(self):
        b = Poly([[2.0, -1], [8, -1], [8, 4], [2, 4], [2, -1]])
        piece = tri.sym_difference(U_SHAPE, b)
        out = dissolve(piece)
        assert poly_area(out) == pytest.approx(poly_area(piece), rel=1e-9)
        # piecewise tiling has many more rings than the dissolved result
        assert ring_count(out) < ring_count(piece)

    def test_area_self_check_fallback_returns_input(self):
        # genuinely overlapping pieces (not a tiling): dissolved area would
        # not match the piece-area sum, so dissolve returns input unchanged
        g = Geometry(
            GeometryType.MULTIPOLYGON,
            [
                [np.array([[0.0, 0], [2, 0], [2, 2], [0, 2], [0, 0]])],
                [np.array([[1.0, 0], [3, 0], [3, 2], [1, 2], [1, 0]])],
            ],
        )
        assert dissolve(g) is g

    def test_passthrough_non_areal(self):
        pt = Geometry.point(1.0, 2.0)
        assert dissolve(pt) is pt


class TestSTSurface:
    def _one(self, arr: pa.Array) -> Geometry:
        return from_wkb(arr[0].as_py())

    def test_st_union_dissolved_wkb(self):
        a = pa.array([to_wkb(Poly(SQ))])
        b = pa.array([to_wkb(Poly([[5.0, 5], [15, 5], [15, 15], [5, 15], [5, 5]]))])
        g = self._one(st.st_union(a, b))
        assert g.kind == GeometryType.POLYGON
        assert poly_area(g) == pytest.approx(175.0)

    def test_st_difference_hole_wkb(self):
        a = pa.array([to_wkb(Poly(SQ))])
        b = pa.array([to_wkb(Poly([[3.0, 3], [7, 3], [7, 7], [3, 7], [3, 3]]))])
        g = self._one(st.st_difference(a, b))
        assert g.kind == GeometryType.POLYGON
        assert len(g.coords) == 2
        assert poly_area(g) == pytest.approx(84.0)

    def test_st_intersection_concave_pair_dissolved(self):
        # concave ∩ concave → triangulated piecewise → dissolved
        v = Poly([[0.0, -5], [10, -5], [10, 12], [5, 1], [0, 12], [0, -5]])
        a = pa.array([to_wkb(U_SHAPE)])
        b = pa.array([to_wkb(v)])
        g = self._one(st.st_intersection(a, b))
        piece = tri.intersection(U_SHAPE, v)
        assert poly_area(g) == pytest.approx(poly_area(piece), rel=1e-9)
        assert g.kind in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON)
        assert ring_count(g) <= ring_count(piece)

    @pytest.mark.parametrize("seed", range(6))
    def test_random_union_area_parity(self, seed):
        rng = np.random.default_rng(seed)

        def rand_simple(n, cx, cy):
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(1.0, 4.0, n)
            return Poly(
                np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
            )

        a = rand_simple(8, 0.0, 0.0)
        b = rand_simple(8, rng.uniform(-2, 2), rng.uniform(-2, 2))
        piece = tri.union(a, b)
        out = dissolve(piece)
        assert poly_area(out) == pytest.approx(poly_area(piece), rel=1e-6, abs=1e-9)
