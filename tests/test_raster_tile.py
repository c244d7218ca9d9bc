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
