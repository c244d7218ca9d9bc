"""Property-based tests (hypothesis) for the geometry kernel: predicate
algebra invariants that hold for ALL inputs — catches edge cases example
tests miss."""

import numpy as np
from hypothesis import given, settings, strategies as st

from incubator_sedona_ray.geom import Geometry, ops
from incubator_sedona_ray.geom import predicates as P
from incubator_sedona_ray.geom.wkb import from_wkb, to_wkb
from incubator_sedona_ray.geom.wkt import from_wkt, to_wkt

# dyadic coordinates: exact in float64, no denormal pathology (a point at
# y=1e-38 on a hull edge is a float-representation puzzle, not a geometry one)
coord = st.integers(min_value=-8000, max_value=8000).map(lambda v: v / 8.0)


@st.composite
def boxes(draw):
    x0, y0 = draw(coord), draw(coord)
    w = draw(st.floats(min_value=0.125, max_value=100, allow_nan=False))
    h = draw(st.floats(min_value=0.125, max_value=100, allow_nan=False))
    return Geometry.box(x0, y0, x0 + w, y0 + h)


@st.composite
def points(draw):
    return Geometry.point(draw(coord), draw(coord))


@settings(max_examples=200, deadline=None)
@given(boxes(), boxes())
def test_predicate_algebra_boxes(a, b):
    inter = P.intersects(a, b)
    assert inter == P.intersects(b, a)  # symmetry
    assert P.disjoint(a, b) == (not inter)
    if P.contains(a, b):
        assert P.covers(a, b) and inter
        assert P.within(b, a)
    if P.covers(a, b) and P.covers(b, a):
        assert P.equals(a, b)
    if P.touches(a, b):
        assert inter and not P.overlaps(a, b)
    # envelope-based truth for axis-aligned boxes
    ae, be = a.envelope(), b.envelope()
    env_inter = not (ae[2] < be[0] or be[2] < ae[0] or ae[3] < be[1] or be[3] < ae[1])
    assert inter == env_inter


@settings(max_examples=200, deadline=None)
@given(boxes(), points())
def test_point_in_box_consistency(box, p):
    e = box.envelope()
    x, y = float(p.coords[0]), float(p.coords[1])
    inside_closed = e[0] <= x <= e[2] and e[1] <= y <= e[3]
    inside_open = e[0] < x < e[2] and e[1] < y < e[3]
    assert P.covers(box, p) == inside_closed
    assert P.contains(box, p) == inside_open or (inside_closed and not inside_open and not P.contains(box, p))
    loc = P.locate_points_in_geometry(np.array([x]), np.array([y]), box)[0]
    assert (loc >= P.BOUNDARY) == inside_closed
    assert (loc == P.INTERIOR) == inside_open


@settings(max_examples=150, deadline=None)
@given(boxes())
def test_roundtrips_and_measures(g):
    assert from_wkb(to_wkb(g)) == g
    assert from_wkt(to_wkt(g)) == g
    e = g.envelope()
    assert abs(ops.area(g) - (e[2] - e[0]) * (e[3] - e[1])) < 1e-6 * max(1.0, ops.area(g))
    assert ops.length(g) > 0
    c = ops.centroid(g)
    assert e[0] <= c.coords[0] <= e[2] and e[1] <= c.coords[1] <= e[3]
    # translation invariance of area (up to shoelace float cancellation)
    t = ops.translate(g, 13.25, -7.5)
    assert abs(ops.area(t) - ops.area(g)) <= 1e-9 * max(1.0, abs(ops.area(g)))


@settings(max_examples=100, deadline=None)
@given(points(), points())
def test_distance_metric_axioms(p, q):
    d = ops.distance(p, q)
    assert d >= 0
    assert d == ops.distance(q, p)
    assert (d == 0) == (tuple(p.coords) == tuple(q.coords))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=20, unique=True))
def test_convex_hull_properties(pts):
    mp = Geometry("MultiPoint", np.array(pts, dtype=np.float64))
    h = ops.convex_hull(mp)
    if h.kind != "Polygon":
        return  # collinear input
    for x, y in pts:
        assert P.covers(h, Geometry.point(x, y)), (x, y)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=0.5, max_value=10, allow_nan=False), min_size=4, max_size=16))
def test_triangulation_area_star_polygons(radii):
    """Star-shaped polygons (random radius per angle) are simple — the
    triangle areas must sum exactly to the shoelace area."""
    from incubator_sedona_ray.geom.triangulate import triangulate

    n = len(radii)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.column_stack([np.array(radii) * np.cos(ang), np.array(radii) * np.sin(ang)])
    poly = Geometry.polygon(ring)
    tris = triangulate(poly)
    tri_area = sum(ops.area(Geometry.polygon(t)) for t in tris)
    assert abs(tri_area - ops.area(poly)) < 1e-9 * max(1.0, ops.area(poly))


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=2, max_value=12), st.integers(min_value=0, max_value=10_000))
def test_partitioner_point_invariants(n_parts, seed):
    """For ANY fitted KDB tree: every in-boundary point lands in exactly one
    leaf, and leaf extents tile the padded boundary."""
    from incubator_sedona_ray.partition import KDBTree
    from incubator_sedona_ray.partition.base import pad_boundary

    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 50, size=(max(2 * n_parts, 64), 2))
    env = np.hstack([pts, pts])
    part = KDBTree(env, pad_boundary((0, 0, 50, 50)), n_parts)
    probe = rng.uniform(0, 50, size=(256, 2))
    pid = part.place_points(probe[:, 0], probe[:, 1])
    assert (pid >= 0).all()
    areas = (part.leaves[:, 2] - part.leaves[:, 0]) * (part.leaves[:, 3] - part.leaves[:, 1])
    assert abs(areas.sum() - 50.01 * 50.01) < 1e-6


# -- GML/KML markup round-trip (geom/markup.py) -----------------------------

@settings(max_examples=150, deadline=None)
@given(boxes())
def test_markup_roundtrip_box(g):
    from incubator_sedona_ray.geom.markup import from_gml, from_kml, to_gml, to_kml

    assert from_gml(to_gml(g)) == g
    assert from_kml(to_kml(g)) == g


@settings(max_examples=150, deadline=None)
@given(points())
def test_markup_roundtrip_point(g):
    from incubator_sedona_ray.geom.markup import from_gml, from_kml, to_gml, to_kml

    assert from_gml(to_gml(g)) == g
    assert from_kml(to_kml(g)) == g


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=12, unique=True))
def test_markup_roundtrip_linestring(pts):
    from incubator_sedona_ray.geom.markup import from_gml, from_kml, to_gml, to_kml

    g = Geometry.linestring(np.asarray(pts, dtype=np.float64))
    assert from_gml(to_gml(g)) == g
    assert from_kml(to_kml(g)) == g


@settings(max_examples=60, deadline=None)
@given(boxes())
def test_box_fill_is_strict_interior_of_pixel_rect(g):
    """Polygon fill == integer points strictly inside the vertex-truncated
    pixel rectangle (the reference's JTS-contains rule), for random boxes."""
    from incubator_sedona_ray.raster.rasterize import geometry_pixels
    from incubator_sedona_ray.raster.tile import world_to_pixel

    B, RX, RY = (-1100.0, -1100.0, 1100.0, 1100.0), 64, 64
    fx, fy = geometry_pixels(g, B, RX, RY, fill=True)
    e = g.envelope()
    px, py = world_to_pixel(np.array([e[0], e[2]]), np.array([e[1], e[3]]), B, RX, RY)
    expect = {
        (x, y)
        for x in range(int(px[0]) + 1, int(px[1]))
        for y in range(int(py[0]) + 1, int(py[1]))
        if 0 <= x < RX and 0 <= y < RY
    }
    assert set(zip(fx, fy)) == expect


# -- codec round-trips over random arrays -----------------------------------

_dtypes = st.sampled_from(["f8", "f4", "i2", "u1", "i4"])


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    _dtypes,
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_arcgrid_hdf4_roundtrip_random(h, w, dt, seed):
    from incubator_sedona_ray.raster.raster import Raster, as_arc_grid, from_arc_grid
    from incubator_sedona_ray.sources.earthdata import decode_hdf4_sds, encode_hdf4_sds

    rng = np.random.default_rng(seed)
    arr = (rng.integers(-100, 100, size=(h, w))).astype(dt)
    # HDF4 DFSD: exact round-trip for every supported dtype
    back = decode_hdf4_sds(encode_hdf4_sds({"g/x": arr}))["g/x"]
    assert back.dtype == arr.dtype
    np.testing.assert_array_equal(back, arr)
    # ArcGrid: float64 text grid round-trip
    r = Raster(arr.astype(np.float64)[None], 1.5, -2.5, 0.25, 0.25)
    r2 = from_arc_grid(as_arc_grid(r))
    np.testing.assert_array_equal(r2.data, r.data)
    assert (r2.x0, r2.y0, r2.pixel_w) == (1.5, -2.5, 0.25)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_geotiff_roundtrip_random(h, w, bands, seed):
    from incubator_sedona_ray.raster.raster import Raster, as_geotiff, from_geotiff

    rng = np.random.default_rng(seed)
    r = Raster(rng.normal(size=(bands, h, w)), -10.0, 5.0, 0.5, 0.5)
    r2 = from_geotiff(as_geotiff(r))
    np.testing.assert_array_equal(r2.data, r.data)


# ---------------------------------------------------------------------------
# round-3 codec property fuzz: WAV, AVI, bilinear resize
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=3),
    st.sampled_from(["u8", "i16", "i32", "f32"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_fuzz(n, ch, kind, seed):
    import numpy as np

    from incubator_sedona_ray.sources.wav import wav_decode, wav_encode

    rng = np.random.default_rng(seed)
    if kind == "u8":
        s = rng.integers(0, 256, size=(n, ch), dtype=np.uint8)
    elif kind == "i16":
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    elif kind == "i32":
        s = rng.integers(-(1 << 31), 1 << 31, size=(n, ch), dtype=np.int64).astype(np.int32)
    else:
        s = rng.random(size=(n, ch), dtype=np.float32) * 2 - 1
    out, sr = wav_decode(wav_encode(s, sample_rate=12345))
    assert sr == 12345 and out.shape == (n, ch)
    assert np.array_equal(out, s)


@given(
    st.lists(st.binary(min_size=0, max_size=300), min_size=0, max_size=8),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_fuzz(frames, w, h):
    from incubator_sedona_ray.sources.avi import avi_decode_frames, avi_encode

    assert avi_decode_frames(avi_encode(frames, w, h)) == frames


@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_resize_bilinear_bounds_fuzz(h, w, oh, ow, seed):
    import numpy as np

    from incubator_sedona_ray.raster.resize import resize_bilinear

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_bilinear(img, oh, ow)
    assert out.shape == (oh, ow, 3) and out.dtype == np.uint8
    # interpolation convexity: outputs stay inside the input value range
    assert out.min() >= img.min() and out.max() <= img.max()
    # constant images are exactly preserved at any size
    const = np.full((h, w), 7, dtype=np.uint8)
    assert np.array_equal(resize_bilinear(const, oh, ow), np.full((oh, ow), 7, dtype=np.uint8))
