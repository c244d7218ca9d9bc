"""Encoder tests: S2 structural invariants, geohash known vectors, grid, hex."""

import numpy as np

from incubator_sedona_ray.encoders import geohash, grid, h3lite, s2
from incubator_sedona_ray.geom import Geometry


# ---------------------------------------------------------------------------
# S2
# ---------------------------------------------------------------------------

def test_s2_face_selection():
    # (0,0) -> face 0 (+x); (90E,0) -> face 1 (+y); (0,90N) -> face 2 (+z)
    # (180,0) -> face 3 (-x); (90W,0) -> face 4 (-y); (0,90S) -> face 5 (-z)
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    ids = s2.leaf_cell_ids(lons, lats)
    faces = (ids >> np.uint64(61)).astype(int)
    assert list(faces) == [0, 1, 2, 3, 4, 5]


def test_s2_leaf_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-89, 89, 200)
    ids = s2.leaf_cell_ids(lon, lat)
    # all leaf ids are odd (trailing one at position 0)
    assert bool(np.all(ids & np.uint64(1) == 1))
    clon, clat = s2.cell_center_lonlat(ids)
    # center of the leaf cell quantizes back to the same leaf
    ids2 = s2.leaf_cell_ids(clon, clat)
    assert bool(np.all(ids == ids2))
    # and the center is within a leaf-cell diagonal of the input (~1e-8 deg)
    np.testing.assert_allclose(clon, lon, atol=1e-6)
    np.testing.assert_allclose(clat, lat, atol=1e-6)


def test_s2_parent_level_structure():
    lon = np.array([13.4050])  # Berlin-ish
    lat = np.array([52.5200])
    for level in [0, 5, 10, 20, 29]:
        cid = s2.cells_for_points(lon, lat, level).view(np.uint64)
        assert int(s2.cell_level(cid)[0]) == level
        # parent of a finer cell at this level == this cell
        finer = s2.cells_for_points(lon, lat, level + 1).view(np.uint64)
        assert int(s2.parent(finer, level)[0]) == int(cid[0])
        # cell center is inside the cell: its ancestor at `level` is the cell
        clon, clat = s2.cell_center_lonlat(cid)
        again = s2.cells_for_points(clon, clat, level).view(np.uint64)
        assert int(again[0]) == int(cid[0])


def test_s2_locality():
    # nearby points share coarse parents; antipodal points never do
    a = s2.cells_for_points(np.array([10.0]), np.array([50.0]), 8)[0]
    b = s2.cells_for_points(np.array([10.001]), np.array([50.001]), 8)[0]
    far = s2.cells_for_points(np.array([-170.0]), np.array([-50.0]), 8)[0]
    assert a == b
    assert a != far


def test_s2_children_partition_parent():
    cid = int(s2.cells_for_points(np.array([10.0]), np.array([50.0]), 6).view(np.uint64)[0])
    kids = s2.children(cid)
    assert len(kids) == 4
    lv = s2.cell_level(np.array(kids, dtype=np.uint64))
    assert list(lv) == [7, 7, 7, 7]
    for k in kids:
        assert int(s2.parent(np.array([k], dtype=np.uint64), 6)[0]) == cid


def test_s2_cover_box():
    box = Geometry.box(10.0, 50.0, 10.5, 50.4)
    cells = s2.cover_geometry(box, 8)
    assert len(cells) >= 1
    assert bool(np.all(s2.cell_level(cells.view(np.uint64)) == 8))
    # the cell of an interior point must be in the covering
    inner = s2.cells_for_points(np.array([10.25]), np.array([50.2]), 8)[0]
    assert inner in set(cells.tolist())
    # a covering of a larger box is a superset
    cells_big = s2.cover_geometry(Geometry.box(9.5, 49.5, 11.0, 51.0), 8)
    assert set(cells.tolist()) <= set(cells_big.tolist())


def test_s2_token():
    cid = int(s2.cells_for_points(np.array([0.0]), np.array([0.0]), 0).view(np.uint64)[0])
    assert s2.token(cid) == "1"  # face 0 cell at level 0 = 0x1000000000000000


# ---------------------------------------------------------------------------
# geohash
# ---------------------------------------------------------------------------

def test_geohash_known_vectors():
    # canonical example: (57.64911 N, 10.40744 E) -> u4pruydqqvj
    assert geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert geohash.encode(10.40744, 57.64911, 6) == "u4pruy"
    # ezs42 decodes near (42.605, -5.603)
    lon, lat = geohash.decode("ezs42")
    assert abs(lat - 42.605) < 0.03 and abs(lon + 5.603) < 0.03


def test_geohash_roundtrip_bbox():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 50)
    lat = rng.uniform(-90, 90, 50)
    ghs = geohash.encode_many(lon, lat, 7)
    for x, y, gh in zip(lon, lat, ghs):
        minlon, minlat, maxlon, maxlat = geohash.decode_bbox(gh)
        assert minlon <= x <= maxlon and minlat <= y <= maxlat


# ---------------------------------------------------------------------------
# grid
# ---------------------------------------------------------------------------

def test_grid_cells_and_sql_parity():
    import duckdb

    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    level = 6
    ids = grid.cell_ids(lon, lat, level)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    sql_ids = con.sql(f"SELECT {grid.sql_expr('lon', 'lat', level)} AS c FROM t").fetchnumpy()["c"]
    np.testing.assert_array_equal(ids, sql_ids)
    # bounds invert the id
    for cid, x, y in list(zip(ids, lon, lat))[:20]:
        minx, miny, maxx, maxy = grid.cell_bounds(cid, level)
        assert minx <= x <= maxx and miny <= y <= maxy


# ---------------------------------------------------------------------------
# h3lite
# ---------------------------------------------------------------------------

def test_h3lite_center_and_res():
    rng = np.random.default_rng(9)
    lon = rng.uniform(-170, 170, 100)
    lat = rng.uniform(-80, 80, 100)
    for res in [2, 5]:
        ids = h3lite.cell_ids(lon, lat, res)
        # same point -> same id; center requantizes to same cell
        assert bool(np.all(h3lite.cell_ids(lon, lat, res) == ids))
        for cid in ids[:10]:
            cx, cy = h3lite.cell_center(int(cid))
            assert int(h3lite.cell_ids(np.array([cx]), np.array([cy]), res)[0]) == int(cid)
    # finer res -> more distinct cells
    c2 = len(set(h3lite.cell_ids(lon, lat, 2).tolist()))
    c5 = len(set(h3lite.cell_ids(lon, lat, 5).tolist()))
    assert c5 >= c2
