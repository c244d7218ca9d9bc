"""Mixed-dimension / GeometryCollection boolean overlay (geom/overlay.py).

Reference parity: JTS overlay accepts any geometry pair, including
heterogeneous collections (common/.../Functions.java:466,641)."""

import numpy as np
import pytest

from incubator_sedona_ray.functions.st import (
    st_astext,
    st_difference,
    st_geomfromtext,
    st_intersection,
    st_symdifference,
    st_union,
)
from incubator_sedona_ray.geom.wkt import from_wkt
from incubator_sedona_ray.geom import ops as gops

B = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"


def run(fn, a, b):
    return st_astext(fn(st_geomfromtext([a]), st_geomfromtext([b]))).to_pylist()[0]


def geom_of(wkt):
    return from_wkt(wkt)


def total_area(wkt):
    return gops.area(geom_of(wkt))


def total_length(wkt):
    return gops.length(geom_of(wkt))


class TestPointOperand:
    def test_point_in_polygon(self):
        assert run(st_intersection, "POINT (3 3)", B) == "POINT (3 3)"
        assert run(st_difference, "POINT (3 3)", B) == "GEOMETRYCOLLECTION EMPTY"
        assert run(st_union, "POINT (3 3)", B) == B

    def test_point_outside_polygon(self):
        assert run(st_intersection, "POINT (10 10)", B) == "GEOMETRYCOLLECTION EMPTY"
        assert run(st_difference, "POINT (10 10)", B) == "POINT (10 10)"
        u = run(st_union, "POINT (10 10)", B)
        assert u.startswith("GEOMETRYCOLLECTION") and "POINT (10 10)" in u

    def test_multipoint_split(self):
        assert run(st_intersection, "MULTIPOINT ((3 3), (10 10))", B) == "POINT (3 3)"
        assert run(st_difference, "MULTIPOINT ((3 3), (10 10))", B) == "POINT (10 10)"

    def test_point_point(self):
        assert run(st_intersection, "POINT (7 7)", "POINT (7 7)") == "POINT (7 7)"
        assert run(st_intersection, "POINT (7 7)", "POINT (8 8)") == "GEOMETRYCOLLECTION EMPTY"
        assert run(st_difference, "POINT (7 7)", "POINT (7 7)") == "GEOMETRYCOLLECTION EMPTY"

    def test_point_on_line(self):
        assert run(st_intersection, "POINT (5 5)", "LINESTRING (0 0, 10 10)") == "POINT (5 5)"
        assert run(st_difference, "POINT (5 5)", "LINESTRING (0 0, 10 10)") == "GEOMETRYCOLLECTION EMPTY"


class TestLineOperand:
    def test_line_clipped_by_polygon(self):
        assert run(st_intersection, "LINESTRING (0 0, 5 5)", B) == "LINESTRING (2 2, 5 5)"
        assert run(st_difference, "LINESTRING (0 0, 5 5)", B) == "LINESTRING (0 0, 2 2)"

    def test_line_through_polygon_both_sides(self):
        got = run(st_difference, "LINESTRING (0 4, 10 4)", B)
        assert got == "MULTILINESTRING ((0 4, 2 4), (6 4, 10 4))"
        assert run(st_intersection, "LINESTRING (0 4, 10 4)", B) == "LINESTRING (2 4, 6 4)"

    def test_line_clip_respects_holes(self):
        holed = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
        got = run(st_intersection, "LINESTRING (2 5, 8 5)", holed)
        assert got == "MULTILINESTRING ((2 5, 4 5), (6 5, 8 5))"

    def test_union_line_polygon(self):
        got = run(st_union, "LINESTRING (0 0, 5 5)", B)
        assert got == f"GEOMETRYCOLLECTION ({B}, LINESTRING (0 0, 2 2))"

    def test_crossing_lines(self):
        assert run(st_intersection, "LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)") == "POINT (5 0)"
        assert run(st_difference, "LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)") == "LINESTRING (0 0, 10 0)"

    def test_collinear_lines(self):
        assert run(st_intersection, "LINESTRING (0 0, 10 0)", "LINESTRING (3 0, 7 0)") == "LINESTRING (3 0, 7 0)"
        assert (
            run(st_difference, "LINESTRING (0 0, 10 0)", "LINESTRING (3 0, 7 0)")
            == "MULTILINESTRING ((0 0, 3 0), (7 0, 10 0))"
        )
        # union dedups the shared interval: total length stays 10
        assert abs(total_length(run(st_union, "LINESTRING (0 0, 10 0)", "LINESTRING (3 0, 7 0)")) - 10.0) < 1e-9


class TestCollectionOperand:
    GC = "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), POINT (10 10), LINESTRING (0 0, 5 5))"

    def test_gc_intersection_keeps_uncovered_line_tail(self):
        got = run(st_intersection, self.GC, B)
        # polygon overlap (2 2)-(4 4) square, plus the diagonal line tail
        # (4 4)-(5 5) that the result polygon does not cover
        assert "POLYGON" in got
        assert "LINESTRING (4 4, 5 5)" in got
        assert abs(total_area(got) - 4.0) < 1e-9

    def test_gc_difference(self):
        got = run(st_difference, self.GC, B)
        assert "POINT (10 10)" in got
        # the line remainder (0 0, 2 2) is covered by the kept L-shaped
        # polygon, so homogenization merges it away (OverlayNG rule)
        assert "LINESTRING" not in got
        assert abs(total_area(got) - (16.0 - 4.0)) < 1e-9

    def test_gc_union_area(self):
        got = run(st_union, self.GC, B)
        assert "POINT (10 10)" in got
        assert abs(total_area(got) - (16.0 + 16.0 - 4.0)) < 1e-9

    def test_gc_sym_difference_area(self):
        got = run(st_symdifference, self.GC, B)
        assert abs(total_area(got) - (16.0 + 16.0 - 8.0)) < 1e-9
        assert "POINT (10 10)" in got

    def test_nested_collection(self):
        nested = "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION (POINT (3 3), POINT (10 10)))"
        assert run(st_intersection, nested, B) == "POINT (3 3)"

    def test_pure_polygon_pairs_unchanged(self):
        """The polygon fast paths must still produce the same result the
        oracle-green queries pinned (dispatch only diverts non-polygonal
        operands)."""
        a = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        got = run(st_intersection, a, B)
        assert abs(total_area(got) - 4.0) < 1e-12
        got = run(st_union, a, B)
        assert abs(total_area(got) - 28.0) < 1e-9
