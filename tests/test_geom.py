"""Geometry kernel tests: WKB/WKT round-trip, predicates, measures, STRtree.

Predicate cases mirror the reference's synthetic join world semantics
(inside / overlapping / outside / on-boundary objects,
core/src/test/.../JoinQueryCorrectnessChecker.java:139-183).
"""

import numpy as np
import pytest

from incubator_sedona_ray.geom import Geometry, GeometryType
from incubator_sedona_ray.geom import ops, predicates as P, wkb, wkt
from incubator_sedona_ray.geom.strtree import STRtree


# ---------------------------------------------------------------------------
# WKB / WKT
# ---------------------------------------------------------------------------

SAMPLES = [
    Geometry.point(1.5, -2.25),
    Geometry.linestring([[0, 0], [1, 1], [2, 0]]),
    Geometry.polygon([[0, 0], [4, 0], [4, 4], [0, 4]]),
    Geometry.polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[2, 2], [4, 2], [4, 4], [2, 4]]]),
    Geometry(GeometryType.MULTIPOINT, np.array([[0.0, 0.0], [2.0, 3.0]])),
    Geometry(GeometryType.MULTILINESTRING, [np.array([[0.0, 0.0], [1.0, 1.0]]), np.array([[2.0, 2.0], [3.0, 3.0]])]),
    Geometry(
        GeometryType.MULTIPOLYGON,
        [
            [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])],
            [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]])],
        ],
    ),
    Geometry(GeometryType.GEOMETRYCOLLECTION, [Geometry.point(1, 2), Geometry.linestring([[0, 0], [1, 0]])]),
]


@pytest.mark.parametrize("g", SAMPLES, ids=[g.kind for g in SAMPLES])
def test_wkb_roundtrip(g):
    assert wkb.from_wkb(wkb.to_wkb(g)) == g


@pytest.mark.parametrize("g", SAMPLES, ids=[g.kind for g in SAMPLES])
def test_wkt_roundtrip(g):
    assert wkt.from_wkt(wkt.to_wkt(g)) == g


def test_wkt_known_forms():
    g = wkt.from_wkt("POINT (30 10)")
    assert g.kind == "Point" and g.coords[0] == 30 and g.coords[1] == 10
    g = wkt.from_wkt("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))")
    assert g.kind == "Polygon" and len(g.coords[0]) == 5
    g = wkt.from_wkt("MULTIPOINT ((10 40), (40 30))")
    assert g.num_geometries() == 2
    g = wkt.from_wkt("SRID=4326;POINT (1 2)")
    assert g.srid == 4326


def test_point_wkb_vectorized():
    x = np.array([1.0, 2.5, -3.0])
    y = np.array([4.0, -5.5, 6.0])
    col = wkb.points_to_wkb(x, y)
    assert all(len(b) == 21 for b in col)
    x2, y2 = wkb.points_from_wkb(col)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    # cross-check one against the general parser
    g = wkb.from_wkb(col[1])
    assert g == Geometry.point(2.5, -5.5)


def test_ewkb_z_and_srid_read():
    import struct
    # EWKB point with SRID + Z: type = 1 | 0x80000000 | 0x20000000
    buf = b"\x01" + struct.pack("<I", 1 | 0x80000000 | 0x20000000) + struct.pack("<i", 4326) + struct.pack("<3d", 1.0, 2.0, 9.0)
    g = wkb.from_wkb(buf)
    assert g.kind == "Point" and g.srid == 4326
    np.testing.assert_array_equal(g.coords, [1.0, 2.0])
    # ISO Z point: type 1001
    buf = b"\x01" + struct.pack("<I", 1001) + struct.pack("<3d", 3.0, 4.0, 9.0)
    g = wkb.from_wkb(buf)
    np.testing.assert_array_equal(g.coords, [3.0, 4.0])


def test_envelopes_from_wkb():
    col = [wkb.to_wkb(Geometry.polygon([[0, 0], [4, 0], [4, 4], [0, 4]])), wkb.to_wkb(Geometry.point(7, 8))]
    env = wkb.envelopes_from_wkb(col)
    np.testing.assert_array_equal(env[0], [0, 0, 4, 4])
    np.testing.assert_array_equal(env[1], [7, 8, 7, 8])


def test_envelopes_from_wkb_batch_paths_agree():
    """The vectorized batch scanner (list / arrow / large / chunked / sliced
    inputs) must agree with the per-row _env_scan walk over a mixed-kind,
    mixed-layout column — including the exotic rows that fall back."""
    import struct

    import pyarrow as pa

    rng = np.random.default_rng(7)
    geoms = []
    for i in range(60):
        k = i % 6
        if k == 0:
            geoms.append(Geometry.point(*rng.uniform(-90, 90, 2)))
        elif k == 1:
            geoms.append(Geometry(GeometryType.LINESTRING, rng.uniform(-90, 90, (4, 2))))
        elif k == 2:
            x, y = rng.uniform(-90, 90, 2)
            geoms.append(Geometry.polygon([[x, y], [x + 2, y], [x + 2, y + 2], [x, y + 2]]))
        elif k == 3:  # polygon with a hole: env still spans all rings
            geoms.append(
                Geometry.polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]])
            )
        elif k == 4:
            x, y = rng.uniform(-90, 90, 2)
            geoms.append(
                Geometry(
                    GeometryType.MULTIPOLYGON,
                    [
                        np.array([[x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]]),
                        np.array([[x + 5, y], [x + 6, y], [x + 6, y + 1], [x + 5, y + 1], [x + 5, y]]),
                    ],
                )
            )
        else:
            geoms.append(Geometry(GeometryType.MULTIPOINT, [rng.uniform(-90, 90, 2) for _ in range(3)]))
    blobs = [wkb.to_wkb(g) for g in geoms]
    # exotic fallback rows: big-endian point, EWKB-Z point, ISO-Z point
    blobs.append(struct.pack(">BIdd", 0, 1, 3.0, 4.0))
    blobs.append(struct.pack("<BIddd", 1, 0x80000001, 5.0, 6.0, 7.0))
    blobs.append(struct.pack("<BIddd", 1, 1001, 8.0, 9.0, 7.0))
    ref = np.empty((len(blobs), 4))
    for i, b in enumerate(blobs):
        ref[i, 0], ref[i, 1], ref[i, 2], ref[i, 3], _ = wkb._env_scan(memoryview(b), 0)
    arr = pa.array(blobs, type=pa.binary())
    for col in (
        blobs,
        arr,
        pa.array(blobs, type=pa.large_binary()),
        pa.chunked_array([arr.slice(0, 20), arr.slice(20)]),
    ):
        np.testing.assert_allclose(wkb.envelopes_from_wkb(col), ref)
    np.testing.assert_allclose(wkb.envelopes_from_wkb(arr.slice(5, 40)), ref[5:45])


def test_kinds_from_wkb():
    import struct

    import pyarrow as pa

    blobs = [
        wkb.to_wkb(Geometry.point(1, 2)),
        wkb.to_wkb(Geometry(GeometryType.LINESTRING, np.array([[0.0, 0.0], [1.0, 1.0]]))),
        wkb.to_wkb(Geometry.polygon([[0, 0], [1, 0], [1, 1]])),
        struct.pack(">BIdd", 0, 1, 3.0, 4.0),  # big-endian point
        struct.pack("<BIddd", 1, 0x80000001, 5.0, 6.0, 7.0),  # EWKB Z point
    ]
    for col in (blobs, pa.array(blobs, type=pa.binary())):
        assert list(wkb.kinds_from_wkb(col)) == [1, 2, 3, 1, 1]
    assert list(wkb.kinds_from_wkb([blobs[0], None])) == [1, -1]


# ---------------------------------------------------------------------------
# point locate / predicates — the reference world semantics
# ---------------------------------------------------------------------------

WINDOW = Geometry.box(0, 0, 5, 5)  # 5x5 window like the checker world


def test_locate_inside_boundary_outside():
    xs = np.array([2.5, 5.0, 6.0, 0.0, 2.5])
    ys = np.array([2.5, 5.0, 6.0, 2.5, 0.0])
    loc = P.locate_points_in_geometry(xs, ys, WINDOW)
    assert list(loc) == [P.INTERIOR, P.BOUNDARY, P.EXTERIOR, P.BOUNDARY, P.BOUNDARY]


def test_locate_with_hole():
    poly = Geometry.polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]])
    xs = np.array([5.0, 4.0, 1.0, 5.0])
    ys = np.array([5.0, 5.0, 1.0, 4.0])
    loc = P.locate_points_in_geometry(xs, ys, poly)
    assert list(loc) == [P.EXTERIOR, P.BOUNDARY, P.INTERIOR, P.BOUNDARY]


def test_point_predicates_boundary_semantics():
    on_b = Geometry.point(5, 5)
    inside = Geometry.point(2.5, 2.5)
    outside = Geometry.point(6, 6)
    # JTS: contains is false for boundary, covers/intersects true
    assert not P.contains(WINDOW, on_b)
    assert P.covers(WINDOW, on_b)
    assert P.intersects(WINDOW, on_b)
    assert P.touches(WINDOW, on_b)
    assert P.contains(WINDOW, inside) and P.covers(WINDOW, inside)
    assert P.within(inside, WINDOW) and P.covered_by(on_b, WINDOW)
    assert not P.intersects(WINDOW, outside) and P.disjoint(WINDOW, outside)


def test_polygon_polygon_checker_world_cases():
    base = WINDOW
    inside = Geometry.box(2, 2, 4, 4)       # 2x2 at base+2 -> always matches
    overlapping = Geometry.box(3, 3, 6, 6)  # 3x3 at base+3 -> intersects, not covered
    outside = Geometry.box(6, 6, 9, 9)      # never matches
    assert P.contains(base, inside) and P.covers(base, inside) and P.intersects(base, inside)
    assert P.intersects(base, overlapping) and not P.covers(base, overlapping)
    assert P.overlaps(base, overlapping)
    assert not P.intersects(base, outside)
    assert P.within(inside, base) and P.covered_by(inside, base)
    # shared-corner-only squares touch, don't overlap
    corner = Geometry.box(5, 5, 8, 8)
    assert P.intersects(base, corner) and P.touches(base, corner) and not P.overlaps(base, corner)
    # equal squares
    assert P.equals(base, Geometry.box(0, 0, 5, 5))
    assert not P.equals(base, inside)
    # edge-flush inside square: covered but also contained (interior overlaps)
    flush = Geometry.box(0, 0, 2, 2)
    assert P.covers(base, flush) and P.contains(base, flush)


def test_linestring_predicates():
    line_in = Geometry.linestring([[1, 1], [4, 4]])
    line_cross = Geometry.linestring([[-1, 2], [6, 2]])
    line_out = Geometry.linestring([[6, 0], [8, 2]])
    assert P.contains(WINDOW, line_in)
    assert P.intersects(WINDOW, line_cross) and not P.covers(WINDOW, line_cross)
    assert P.crosses(line_cross, WINDOW)
    assert not P.intersects(WINDOW, line_out)
    assert P.intersects(line_cross, Geometry.linestring([[2, 0], [2, 4]]))
    assert not P.intersects(line_in, line_out)


def test_diamond_inscribed_contains():
    diamond = Geometry.polygon([[2.5, 0], [5, 2.5], [2.5, 5], [0, 2.5]])
    assert P.covers(WINDOW, diamond)
    assert P.contains(WINDOW, diamond)


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------

def test_area_length_centroid():
    assert ops.area(WINDOW) == 25.0
    holed = Geometry.polygon([[0, 0], [10, 0], [10, 10], [0, 10]], holes=[[[2, 2], [4, 2], [4, 4], [2, 4]]])
    assert ops.area(holed) == 100.0 - 4.0
    assert ops.length(WINDOW) == 20.0
    c = ops.centroid(WINDOW)
    np.testing.assert_allclose(c.coords, [2.5, 2.5])
    line = Geometry.linestring([[0, 0], [10, 0]])
    np.testing.assert_allclose(ops.centroid(line).coords, [5, 0])
    assert ops.length(line) == 10.0


def test_distance():
    a = Geometry.point(0, 0)
    b = Geometry.point(3, 4)
    assert ops.distance(a, b) == 5.0
    assert ops.distance(a, WINDOW) == 0.0  # boundary point
    assert ops.distance(Geometry.point(7, 5), WINDOW) == 2.0
    assert ops.distance(Geometry.point(2, 2), WINDOW) == 0.0  # inside
    d = ops.points_to_geometry_distance(np.array([7.0, 2.0]), np.array([5.0, 2.0]), WINDOW)
    np.testing.assert_allclose(d, [2.0, 0.0])
    l1 = Geometry.linestring([[0, 0], [1, 0]])
    l2 = Geometry.linestring([[0, 2], [1, 2]])
    assert ops.distance(l1, l2) == 2.0


def test_convex_hull_and_buffer():
    mp = Geometry(GeometryType.MULTIPOINT, np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [2, 2]]))
    h = ops.convex_hull(mp)
    assert h.kind == "Polygon"
    assert ops.area(h) == 16.0
    circ = ops.buffer(Geometry.point(0, 0), 1.0)
    assert circ.kind == "Polygon"
    assert 3.0 < ops.area(circ) < np.pi  # inscribed polygon area < pi
    assert P.covers(circ, Geometry.point(0.5, 0.5))


def test_simplify_translate_flip():
    line = Geometry.linestring([[0, 0], [1, 0.001], [2, 0], [3, 5], [4, 0]])
    s = ops.simplify(line, 0.01)
    assert len(s.coords) == 4  # middle near-collinear vertex dropped
    t = ops.translate(Geometry.point(1, 2), 10, 20)
    np.testing.assert_allclose(t.coords, [11, 22])
    f = ops.flip_coordinates(Geometry.point(1, 2))
    np.testing.assert_allclose(f.coords, [2, 1])


def test_geometric_median():
    mp = Geometry(GeometryType.MULTIPOINT, np.array([[0.0, 0], [0, 0], [0, 0], [10, 10]]))
    m = ops.geometric_median(mp)
    assert np.hypot(*m.coords) < 0.1  # pulled to the cluster, unlike mean


# ---------------------------------------------------------------------------
# STRtree
# ---------------------------------------------------------------------------

def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(42)
    n, m = 500, 200
    mins = rng.uniform(0, 100, size=(n, 2))
    sizes = rng.uniform(0.1, 5, size=(n, 2))
    envs = np.hstack([mins, mins + sizes])
    tree = STRtree(envs)
    qmins = rng.uniform(0, 100, size=(m, 2))
    qsizes = rng.uniform(0.1, 8, size=(m, 2))
    q = np.hstack([qmins, qmins + qsizes])
    pi, ii = tree.query_batch(q)
    got = set(zip(pi.tolist(), ii.tolist()))
    expect = set()
    for j in range(m):
        hit = ~(
            (envs[:, 2] < q[j, 0]) | (q[j, 2] < envs[:, 0]) | (envs[:, 3] < q[j, 1]) | (q[j, 3] < envs[:, 1])
        )
        for i in np.nonzero(hit)[0]:
            expect.add((j, int(i)))
    assert got == expect


def test_strtree_points_and_empty():
    envs = np.array([[0, 0, 1, 1], [2, 2, 3, 3]])
    tree = STRtree(envs)
    pi, ii = tree.query_points(np.array([0.5, 2.5, 10.0]), np.array([0.5, 2.5, 10.0]))
    assert set(zip(pi.tolist(), ii.tolist())) == {(0, 0), (1, 1)}
    empty = STRtree(np.empty((0, 4)))
    pi, ii = empty.query_batch(np.array([[0, 0, 1, 1]]))
    assert len(pi) == 0
    single = STRtree(np.array([[0, 0, 1, 1]]))
    assert list(single.query((0.5, 0.5, 0.6, 0.6))) == [0]


class TestMakeValidBowtie:
    def test_bowtie_splits_into_lobes(self):
        from incubator_sedona_ray.geom import ops
        from incubator_sedona_ray.geom.core import Geometry, GeometryType

        bowtie = Geometry(
            GeometryType.POLYGON,
            [np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]])],
        )
        fixed = ops.make_valid(bowtie)
        assert fixed.kind == GeometryType.MULTIPOLYGON
        parts = fixed.parts()
        assert len(parts) == 2
        areas = sorted(abs(ops.area(p)) for p in parts)
        # two congruent triangular lobes (base 2, height 1 -> area 1 each)
        assert areas[0] == pytest.approx(1.0) and areas[1] == pytest.approx(1.0)

    def test_valid_polygon_unchanged(self):
        from incubator_sedona_ray.geom import ops
        from incubator_sedona_ray.geom.core import Geometry, GeometryType

        sq = Geometry.box(0, 0, 4, 4)
        fixed = ops.make_valid(sq)
        assert fixed.kind == GeometryType.POLYGON
        assert abs(ops.area(fixed)) == 16.0

    def test_open_ring_closed(self):
        from incubator_sedona_ray.geom import ops
        from incubator_sedona_ray.geom.core import Geometry, GeometryType

        open_ring = Geometry(
            GeometryType.POLYGON,
            [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])],
        )
        fixed = ops.make_valid(open_ring)
        r = fixed.coords[0]
        assert np.array_equal(r[0], r[-1])

    def test_pentagram_five_crossings(self):
        from incubator_sedona_ray.geom import ops
        from incubator_sedona_ray.geom.core import Geometry, GeometryType

        # 5-point star chain: 5 proper self-crossings -> 5 point lobes +
        # the central pentagon, all simple
        ang = np.radians(90 + 144 * np.arange(5))
        pts = np.column_stack([np.cos(ang), np.sin(ang)])
        ring = np.vstack([pts, pts[:1]])
        fixed = ops.make_valid(Geometry(GeometryType.POLYGON, [ring]))
        # interleaved crossings: repaired via the union-dissolve fallback —
        # result covers the full star (pentagon + 5 lobes), area exact:
        # star area for circumradius R=1 is 5*cos(72°)*(3−√5)*tan(36°)…
        # assert against a numeric even-odd-free reference: the union of the
        # extracted overlapping cycles must exceed the largest single cycle
        total = ops.area(fixed)
        assert total > 0.82  # the largest single extracted cycle was ~0.81
        assert total < 1.47  # strictly less than the sum (they overlap)
