"""Pure-python shapefile reader vs hand-encoded .shp/.dbf fixtures (the
encoder below follows the public ESRI Shapefile Technical Description, so
the test is an independent cross-check of the parser)."""

import struct

import numpy as np
import pytest
import ray

from incubator_sedona_ray.geom.core import GeometryType
from incubator_sedona_ray.geom.wkb import from_wkb
from incubator_sedona_ray.sources.shapefile import (
    parse_dbf,
    parse_shp,
    read_shapefile_ds,
    shapefile_to_table,
)


def _shp(records: list[bytes]) -> bytes:
    body = b""
    for i, rec in enumerate(records):
        body += struct.pack(">2i", i + 1, len(rec) // 2) + rec
    flen = (100 + len(body)) // 2
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(">i", flen)
    header += struct.pack("<2i", 1000, 1) + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    assert len(header) == 100
    return header + body


def _point(x, y) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def _poly(rings, shape_type=5) -> bytes:
    pts = np.vstack(rings)
    parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    return (
        struct.pack("<i4d", shape_type, 0, 0, 0, 0)
        + struct.pack("<2i", len(rings), len(pts))
        + parts.tobytes()
        + pts.astype("<f8").tobytes()
    )


def _dbf(fields, rows) -> bytes:
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    head = struct.pack("<4BIHH20x", 3, 24, 1, 1, len(rows), hsize, rsize)
    for name, ftype, flen, fdec in fields:
        head += name.encode().ljust(11, b"\0") + ftype.encode() + b"\0" * 4 + bytes([flen, fdec]) + b"\0" * 14
    head += b"\x0d"
    body = b""
    for row in rows:
        body += b" "
        for (name, ftype, flen, fdec), val in zip(fields, row):
            body += str(val).encode("latin-1")[:flen].ljust(flen)
    return head + body


def test_points_and_attributes():
    shp = _shp([_point(1.5, 2.5), _point(-3.0, 4.0)])
    dbf = _dbf([("name", "C", 8, 0), ("pop", "N", 6, 0)], [("alpha", 100), ("beta", 2500)])
    tbl = shapefile_to_table(shp, dbf)
    assert tbl.num_rows == 2
    g = from_wkb(tbl["geom"][0].as_py())
    assert g.kind == GeometryType.POINT and g.coords.tolist() == [1.5, 2.5]
    assert tbl["name"].to_pylist() == ["alpha", "beta"]
    assert tbl["pop"].to_pylist() == [100, 2500]


def test_polygon_with_hole_ring_grouping():
    # shapefile convention: shell CW (in y-up math coords = negative area),
    # hole CCW
    shell = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], float)  # CW
    hole = np.array([[2, 2], [5, 2], [5, 5], [2, 5], [2, 2]], float)       # CCW
    shp = _shp([_poly([shell, hole])])
    [g] = [from_wkb(b) for b in shapefile_to_table(shp)["geom"].to_pylist()]
    assert g.kind == GeometryType.POLYGON and len(g.coords) == 2
    from incubator_sedona_ray.geom.ops import area

    assert area(g) == pytest.approx(100 - 9)


def test_multipolygon_two_shells():
    s1 = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], float)
    s2 = np.array([[10, 10], [10, 12], [12, 12], [12, 10], [10, 10]], float)
    shp = _shp([_poly([s1, s2])])
    [g] = [from_wkb(b) for b in shapefile_to_table(shp)["geom"].to_pylist()]
    assert g.kind == GeometryType.MULTIPOLYGON


def test_polyline_and_null():
    line = (
        struct.pack("<i4d", 3, 0, 0, 0, 0)
        + struct.pack("<2i", 1, 2)
        + struct.pack("<i", 0)
        + np.array([[0, 0], [3, 4]], dtype="<f8").tobytes()
    )
    null = struct.pack("<i", 0)
    geoms = parse_shp(_shp([line, null]))
    assert geoms[0].kind == GeometryType.LINESTRING
    assert geoms[1] is None


@pytest.mark.usefixtures("ray_session")
def test_read_shapefile_ds(tmp_path):
    shp = _shp([_point(1.0, 2.0), _point(3.0, 4.0)])
    dbf = _dbf([("tag", "C", 4, 0)], [("aa",), ("bb",)])
    (tmp_path / "layer.shp").write_bytes(shp)
    (tmp_path / "layer.dbf").write_bytes(dbf)
    out = read_shapefile_ds(str(tmp_path)).to_pandas()
    assert len(out) == 2
    assert sorted(out.tag) == ["aa", "bb"]
    assert from_wkb(out.geom.iloc[0]).kind == GeometryType.POINT
