"""Tile/pixel assignment + raster RS_Value + zonal stats + heatmap
(F5 fixture semantics from FIXTURES.md)."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.raster import (
    Raster,
    RasterValueLookup,
    pixel_to_tile,
    rs_value,
    tile_assign_batch_fn,
    world_to_pixel,
)
from incubator_sedona_ray.raster.raster import fake_checkerboard_raster, zonal_stats
from incubator_sedona_ray.raster.tile import encode_pixel_id, heatmap_counts


def test_world_to_pixel_formula():
    # 256x256 raster over [0,256)^2: pixel = floor coordinate; max edge clamps
    b = (0.0, 0.0, 256.0, 256.0)
    x = np.array([0.0, 0.5, 1.0, 255.9, 256.0, 100.25])
    y = np.array([0.0, 0.5, 2.0, 0.1, 256.0, 200.75])
    px, py = world_to_pixel(x, y, b, 256, 256)
    # remainder rule applies to the FULL boundary width: only the global max
    # edge (x=256) clamps down; interior pixel boundaries floor normally
    assert list(px) == [0, 0, 1, 255, 255, 100]
    assert list(py) == [0, 0, 2, 0, 255, 200]


def test_pixel_to_tile_y_flip():
    # 256x256 split 4x4 (64px tiles); tile row 0 is the TOP row
    px = np.array([0, 63, 64, 255, 0])
    py = np.array([0, 0, 0, 255, 255])
    tid = pixel_to_tile(px, py, 256, 256, 4, 4)
    # bottom-left pixel -> tile row 3 (flipped) col 0 -> id 12
    assert list(tid) == [12, 12, 13, 3, 0]
    pid = encode_pixel_id(px, py, 256)
    assert list(pid) == [0, 63, 64, 255 + 255 * 256, 255 * 256]


def test_rs_value_closed_form():
    r = fake_checkerboard_raster(256, 256)
    xs = np.array([0.5, 10.2, 255.9, 300.0, -1.0])
    ys = np.array([0.5, 20.7, 255.1, 10.0, 10.0])
    v = rs_value(r, xs, ys)
    assert v[0] == 0.0
    assert v[1] == 20 * 256 + 10
    assert v[2] == 255 * 256 + 255
    assert np.isnan(v[3]) and np.isnan(v[4])
    # band out of range -> all NaN
    assert np.isnan(rs_value(r, xs, ys, band=2)).all()


def test_raster_affine_anchor():
    r = Raster(np.arange(12, dtype=np.float64).reshape(1, 3, 4), x0=100.0, y0=50.0, pixel_w=0.5, pixel_h=2.0)
    v = rs_value(r, np.array([100.6, 101.9]), np.array([50.5, 55.9]))
    assert v[0] == 1.0  # col floor(0.6/0.5)=1, row floor(0.5/2)=0
    assert v[1] == 2 * 4 + 3


@pytest.mark.usefixtures("ray_session")
def test_tile_assign_and_zonal_stats():
    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame({"pid": np.arange(n), "lon": rng.uniform(0, 256, n), "lat": rng.uniform(0, 256, n)})
    ds = ray.data.from_pandas(df)
    b = (0.0, 0.0, 256.0, 256.0)
    out = ds.map_batches(tile_assign_batch_fn(b, 256, 256, 4, 4), batch_format="pyarrow").to_pandas()
    assert len(out) == n
    # cross-check a sample against the closed form (floor semantics; random
    # floats are never exactly integral)
    for _, row in out.head(50).iterrows():
        assert row.pixel_x == int(row.lon)
        assert 0 <= row.tile_id < 16

    raster_ref = ray.put(fake_checkerboard_raster(256, 256))
    zs = zonal_stats(ds, raster_ref).to_pandas()
    # every pixel zone count sums back to n (all points inside)
    assert zs["n"].sum() == n
    # zone value equals the pixel formula for a probe point
    probe = ray.data.from_pandas(pd.DataFrame({"lon": [10.5], "lat": [20.5]}))
    looked = probe.map_batches(
        RasterValueLookup,
        fn_constructor_kwargs={"raster_ref": raster_ref},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    assert looked.band_value[0] == 20 * 256 + 10


@pytest.mark.usefixtures("ray_session")
def test_heatmap_counts_match_bruteforce():
    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({"lon": rng.uniform(0, 64, n), "lat": rng.uniform(0, 64, n)})
    b = (0.0, 0.0, 64.0, 64.0)
    ds = ray.data.from_pandas(df).repartition(4)
    hm = heatmap_counts(ds, b, 64, 64, 4, 4).to_pandas()
    assert hm.weight.sum() == n
    px, py = world_to_pixel(df.lon.to_numpy(), df.lat.to_numpy(), b, 64, 64)
    pid = encode_pixel_id(px, py, 64)
    expect = pd.Series(pid).value_counts()
    got = hm.set_index("pixel_id").weight
    assert got.sort_index().equals(expect.sort_index().astype(float))


class TestGeoTiffCodec:
    """Pure-numpy GeoTIFF decode/encode (raster/geotiff.py) — the former
    GDAL-blocked stub is now real."""

    def test_roundtrip_multiband_geo(self):
        from incubator_sedona_ray.raster.raster import Raster, from_geotiff, as_geotiff

        r = Raster(
            np.arange(2 * 20 * 30, dtype=np.float64).reshape(2, 20, 30),
            x0=100.0, y0=40.0, pixel_w=0.5, pixel_h=0.25, nodata=-9999.0,
        )
        r2 = from_geotiff(as_geotiff(r))
        assert np.array_equal(r.data, r2.data)
        assert (r2.x0, r2.y0, r2.pixel_w, r2.pixel_h, r2.nodata) == (100.0, 40.0, 0.5, 0.25, -9999.0)

    def test_deflate_predictor_strip(self):
        import struct, zlib
        from incubator_sedona_ray.raster.raster import from_geotiff

        H, W = 7, 11
        img = (np.arange(H * W, dtype=np.uint16).reshape(H, W) * 3 % 251).astype(np.uint16)
        diff = np.empty_like(img)
        diff[:, 0] = img[:, 0]
        diff[:, 1:] = (img[:, 1:].astype(np.int32) - img[:, :-1].astype(np.int32)).astype(np.uint16)
        payload = zlib.compress(diff.astype("<u2").tobytes())

        def entry(tag, typ, cnt, val):
            return struct.pack("<HHI", tag, typ, cnt) + val.ljust(4, b"\0")

        tags = [
            entry(256, 4, 1, struct.pack("<I", W)), entry(257, 4, 1, struct.pack("<I", H)),
            entry(258, 3, 1, struct.pack("<H", 16)), entry(259, 3, 1, struct.pack("<H", 8)),
            entry(277, 3, 1, struct.pack("<H", 1)), entry(278, 4, 1, struct.pack("<I", H)),
            entry(317, 3, 1, struct.pack("<H", 2)), entry(339, 3, 1, struct.pack("<H", 1)),
        ]
        n = len(tags) + 2
        data_off = 8 + 2 + n * 12 + 4
        tags += [entry(273, 4, 1, struct.pack("<I", data_off)), entry(279, 4, 1, struct.pack("<I", len(payload)))]
        tags.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
        tiff = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n) + b"".join(tags) + struct.pack("<I", 0) + payload
        r = from_geotiff(tiff)
        assert np.array_equal(r.data[0, ::-1, :], img.astype(np.float64))

    def test_tiled_layout(self):
        import struct
        from incubator_sedona_ray.raster.raster import from_geotiff

        H, W, T = 10, 13, 8  # 2x2 tiles with ragged edges
        img = np.arange(H * W, dtype=np.float32).reshape(H, W)
        tiles, offsets, counts = [], [], []
        def entry(tag, typ, cnt, val):
            return struct.pack("<HHI", tag, typ, cnt) + val.ljust(4, b"\0")
        for ty in range(2):
            for tx in range(2):
                tile = np.zeros((T, T), dtype="<f4")
                sub = img[ty * T : min((ty + 1) * T, H), tx * T : min((tx + 1) * T, W)]
                tile[: sub.shape[0], : sub.shape[1]] = sub
                tiles.append(tile.tobytes())
        base_tags = [
            entry(256, 4, 1, struct.pack("<I", W)), entry(257, 4, 1, struct.pack("<I", H)),
            entry(258, 3, 1, struct.pack("<H", 32)), entry(259, 3, 1, struct.pack("<H", 1)),
            entry(277, 3, 1, struct.pack("<H", 1)), entry(339, 3, 1, struct.pack("<H", 3)),
            entry(322, 4, 1, struct.pack("<I", T)), entry(323, 4, 1, struct.pack("<I", T)),
        ]
        n = len(base_tags) + 2
        ifd_size = 2 + n * 12 + 4
        ext_off = 8 + ifd_size
        data_off = ext_off + 2 * 4 * 4  # two external arrays of 4 longs
        offs = [data_off + i * len(tiles[0]) for i in range(4)]
        tags = base_tags + [
            entry(324, 4, 4, struct.pack("<I", ext_off)),
            entry(325, 4, 4, struct.pack("<I", ext_off + 16)),
        ]
        tags.sort(key=lambda b: struct.unpack("<H", b[:2])[0])
        ext = struct.pack("<4I", *offs) + struct.pack("<4I", *[len(tiles[0])] * 4)
        tiff = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", n) + b"".join(tags) + struct.pack("<I", 0) + ext + b"".join(tiles)
        r = from_geotiff(tiff)
        assert np.array_equal(r.data[0, ::-1, :], img.astype(np.float64))


class TestArcGrid:
    def test_roundtrip(self):
        from incubator_sedona_ray.raster.raster import Raster, as_arc_grid, from_arc_grid, rs_value

        data = np.arange(12, dtype=np.float64).reshape(1, 3, 4)
        r = Raster(data, x0=10.0, y0=20.0, pixel_w=0.5, pixel_h=0.5, nodata=-9999.0)
        txt = as_arc_grid(r)
        assert txt.splitlines()[0] == "ncols 4"
        r2 = from_arc_grid(txt)
        assert np.array_equal(r2.data, r.data)
        assert (r2.x0, r2.y0, r2.pixel_w, r2.nodata) == (10.0, 20.0, 0.5, -9999.0)
        # top file row is the TOP of the grid: row index 2 (row 0 at bottom)
        assert float(txt.splitlines()[6].split()[0]) == data[0, 2, 0]
        # value lookup parity after round-trip
        assert rs_value(r2, np.array([10.25]), np.array([20.25]))[0] == data[0, 0, 0]

    def test_llcenter_and_nodata(self):
        from incubator_sedona_ray.raster.raster import from_arc_grid, rs_value

        txt = "ncols 2\nnrows 2\nxllcenter 0.5\nyllcenter 0.5\ncellsize 1.0\nNODATA_value -1\n-1 4\n1 2\n"
        r = from_arc_grid(txt)
        assert (r.x0, r.y0) == (0.0, 0.0)
        assert np.isnan(rs_value(r, np.array([0.5]), np.array([1.5]))[0])  # nodata cell
        assert rs_value(r, np.array([1.5]), np.array([1.5]))[0] == 4.0


class TestRasterize:
    B = (0.0, 0.0, 8.0, 8.0)

    def test_bresenham_diagonal(self):
        from incubator_sedona_ray.raster.rasterize import bresenham

        xs, ys = bresenham(0, 0, 3, 3)
        assert list(zip(xs, ys)) == [(0, 0), (1, 1), (2, 2), (3, 3)]

    def test_box_outline_and_fill(self):
        from incubator_sedona_ray.geom import Geometry
        from incubator_sedona_ray.raster.rasterize import geometry_pixels

        g = Geometry.box(0, 0, 4, 4)
        px, py = geometry_pixels(g, self.B, 8, 8, fill=False)
        # pixel-space shell corners (0,0)-(4,4): border of the 5x5 square
        assert len(px) == 16
        assert set(zip(px, py)) == {
            (x, y) for x in range(5) for y in range(5) if x in (0, 4) or y in (0, 4)
        }
        fx, fy = geometry_pixels(g, self.B, 8, 8, fill=True)
        assert set(zip(fx, fy)) == {(x, y) for x in range(1, 4) for y in range(1, 4)}

    def test_line_and_point(self):
        from incubator_sedona_ray.geom import Geometry
        from incubator_sedona_ray.raster.rasterize import geometry_pixels

        px, py = geometry_pixels(Geometry.point(2.5, 3.5), self.B, 8, 8)
        assert list(zip(px, py)) == [(2, 3)]
        px, py = geometry_pixels(Geometry.linestring([[0, 0], [3, 3]]), self.B, 8, 8)
        assert set(zip(px, py)) == {(0, 0), (1, 1), (2, 2), (3, 3)}

    def test_choropleth_pixel_sums(self, ray_session):
        import ray

        from incubator_sedona_ray.geom import Geometry
        from incubator_sedona_ray.geom.wkb import to_wkb
        from incubator_sedona_ray.raster.rasterize import _pixel_sum, rasterize_batch_fn

        rows = [
            {"geom": to_wkb(Geometry.box(0, 0, 4, 4)), "value": 10.0},
            {"geom": to_wkb(Geometry.box(2, 2, 6, 6)), "value": 5.0},
        ]
        ds = ray.data.from_items(rows)
        pix = _pixel_sum(
            ds.map_batches(
                rasterize_batch_fn(self.B, 8, 8, weight_col="value", fill=True),
                batch_format="pyarrow",
            )
        ).to_pandas()
        by_pix = {(int(r.pixel_x), int(r.pixel_y)): r.weight for r in pix.itertuples()}
        assert by_pix[(1, 1)] == 10.0      # only first box interior
        assert by_pix[(3, 3)] == 15.0      # strict interior of both
        assert by_pix[(5, 5)] == 5.0       # only second box
        assert (2, 2) not in by_pix or by_pix[(2, 2)] == 10.0  # on 2nd box's boundary

    def test_scatter_plot_end_to_end(self, ray_session):
        import ray

        from incubator_sedona_ray.geom import Geometry
        from incubator_sedona_ray.geom.wkb import to_wkb
        from incubator_sedona_ray.raster.rasterize import scatter_plot

        rows = [{"geom": to_wkb(Geometry.point(float(i % 8) + 0.5, float(i // 8) + 0.5))} for i in range(32)]
        tiles = scatter_plot(ray.data.from_items(rows), self.B, 8, 8, 2, 2).to_pandas()
        assert len(tiles) <= 4 and len(tiles) >= 1
        assert all(bytes(p).startswith(b"\x89PNG") for p in tiles["png"])


def test_raster_accessors():
    from incubator_sedona_ray.geom import Geometry
    from incubator_sedona_ray.raster.raster import (
        Raster,
        rs_add_band_from_array,
        rs_band_as_array,
        rs_envelope,
        rs_metadata,
        rs_num_bands,
        rs_set_srid,
        rs_srid,
    )

    r = Raster(np.arange(12, dtype=np.float64).reshape(1, 3, 4), 10.0, 20.0, 0.5, 0.5)
    assert rs_envelope(r) == Geometry.box(10.0, 20.0, 12.0, 21.5)
    m = rs_metadata(r)
    assert (m["width"], m["height"], m["num_bands"]) == (4, 3, 1)
    assert rs_num_bands(r) == 1 and rs_srid(r) == 0
    r2 = rs_set_srid(r, 4326)
    assert rs_srid(r2) == 4326 and r2.data is r.data
    band = rs_band_as_array(r)
    assert band.shape == (3, 4) and band[0, 1] == 1.0
    r3 = rs_add_band_from_array(r, band * 2)
    assert rs_num_bands(r3) == 2 and r3.data[1, 0, 1] == 2.0
    # negative pixel_h (north-up geotiff convention) normalizes the envelope
    rneg = Raster(r.data, 0.0, 3.0, 1.0, -1.0)
    assert rs_envelope(rneg) == Geometry.box(0.0, 0.0, 4.0, 3.0)


class TestBandAlgebra:
    """Array-based RS_ surface (MapAlgebra.scala / IO.scala formulas incl.
    the 2-decimal Scala rounding and truncation quirks)."""

    def test_registry_covers_reference_catalog(self):
        import re

        from incubator_sedona_ray.raster.algebra import RS_FUNCTIONS

        cat = open(
            "/root/reference/sql/common/src/main/scala/org/apache/sedona/sql/UDF/Catalog.scala"
        ).read()
        names = {n[3:].lower() for n in re.findall(r"RS_[A-Za-z0-9_]+", cat)}
        assert names <= set(RS_FUNCTIONS), names - set(RS_FUNCTIONS)

    def test_arithmetic_quirks(self):
        from incubator_sedona_ray.raster import algebra as A

        b1 = np.array([1.0, 2.0, 3.0])
        b2 = np.array([4.0, 10.0, 7.0])
        np.testing.assert_array_equal(A.band_add(b1, b2), [5.0, 12.0, 10.0])
        # subtract is band2 - band1 in the reference
        np.testing.assert_array_equal(A.band_subtract(b1, b2), [3.0, 8.0, 4.0])
        # divide rounds to 2 decimals, scala-style floor(x*100+0.5)
        np.testing.assert_array_equal(A.band_divide(np.array([1.0]), np.array([3.0])), [0.33])
        np.testing.assert_array_equal(A.band_square_root(np.array([2.0])), [1.41])
        np.testing.assert_array_equal(A.band_bitwise_and(np.array([6.0]), np.array([3.0])), [2.0])
        np.testing.assert_array_equal(A.band_greater_than(b1, 1.5), [0.0, 1.0, 1.0])
        np.testing.assert_array_equal(A.band_logical_difference(b1, np.array([1.0, 9.0, 3.0])), [0.0, 2.0, 0.0])
        np.testing.assert_array_equal(A.band_logical_over(np.array([0.0, 5.0]), np.array([7.0, 8.0])), [7.0, 5.0])

    def test_ndvi_normalize_stats(self):
        from incubator_sedona_ray.raster import algebra as A

        # the reference substitutes 0 -> -1 BEFORE the ratio
        nd = A.band_normalized_difference(np.array([0.0, 2.0]), np.array([4.0, 6.0]))
        np.testing.assert_array_equal(nd, [np.floor((4 - -1) / (4 + -1) * 100 + 0.5) / 100, 0.5])
        norm = A.band_normalize(np.array([0.0, 5.0, 10.0]))
        np.testing.assert_array_equal(norm, [0.0, 127.0, 255.0])
        assert A.band_mean(np.array([1.0, 2.0, 2.0])) == 1.67
        np.testing.assert_array_equal(A.band_mode(np.array([3.0, 1.0, 3.0, 1.0, 2.0])), [3.0, 1.0])
        assert A.band_count_value(np.array([1.0, 2.0, 1.0]), 1.0) == 2

    def test_band_layout_ops(self):
        from incubator_sedona_ray.raster import algebra as A

        data = np.arange(12, dtype=np.float64)  # 2 bands x 6
        np.testing.assert_array_equal(A.band_get_band(data, 2, 2), np.arange(6, 12))
        appended = A.band_append(data, np.full(6, 9.0), 2)
        assert len(appended) == 18 and (appended[-6:] == 9.0).all()
        # fetch region: band index = i*dim0 + j (reference row-major quirk)
        band = np.arange(16, dtype=np.float64)
        region = A.band_fetch_region(band, [1, 1, 2, 2], [4, 4])
        np.testing.assert_array_equal(region, [5.0, 6.0, 9.0, 10.0])
        html = A.band_html(np.zeros(16), 4, 4)
        assert html.startswith("<img src=\"data:image/png;base64,")
