"""SpatialDataset facade + raster algebra."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.wkb import to_wkb
from incubator_sedona_ray.raster.algebra import (
    band_op_fn,
    rs_add,
    rs_band_stats,
    rs_count_value,
    rs_divide,
    rs_normalized_difference,
)
from incubator_sedona_ray.raster.raster import Raster
from incubator_sedona_ray.spatial_dataset import SpatialDataset

pytestmark = pytest.mark.usefixtures("ray_session")


def test_facade_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    pts = pd.DataFrame({"pid": np.arange(500), "lon": rng.uniform(0, 100, 500), "lat": rng.uniform(0, 100, 500)})
    sd = SpatialDataset(ray.data.from_pandas(pts)).analyze()
    assert sd.approximate_total_count == 500
    b = sd.boundary_envelope
    assert 0 <= b[0] < b[2] <= 100
    sd.spatial_partitioning("kdbtree", 8)
    parts = sd.partitioned().to_pandas()
    assert len(parts) == 500 and parts.part_id.nunique() > 1
    out = sd.range_query(Geometry.box(0, 0, 50, 50)).to_pandas()
    m = (pts.lon <= 50) & (pts.lat <= 50)
    assert set(out.pid) == set(pts.pid[m])
    nn = sd.knn(Geometry.point(50, 50), 5, id_col="pid").to_pandas()
    assert len(nn) == 5

    zones = pd.DataFrame({"zid": [0], "geom": [to_wkb(Geometry.box(0, 0, 50, 50))]})
    zd = SpatialDataset(ray.data.from_pandas(zones), geom="geom")
    joined = zd.join(SpatialDataset(ray.data.from_pandas(pts)), "covers", num_partitions=2).to_pandas()
    assert set(joined.r_pid) == set(pts.pid[m])
    zd.save_as_wkt(str(tmp_path / "wkt_out"))
    zd.save_as_geoparquet(str(tmp_path / "gp_out"))
    import os

    assert any(f.endswith(".csv") for f in os.listdir(tmp_path / "wkt_out"))
    assert os.path.exists(tmp_path / "gp_out" / "_geo_manifest.json")


def test_raster_algebra():
    data = np.stack([np.full((4, 4), 6.0), np.full((4, 4), 2.0)])
    r = Raster(data)
    np.testing.assert_array_equal(rs_add(r, 1, 2), np.full((4, 4), 8.0))
    np.testing.assert_array_equal(rs_divide(r, 1, 2), np.full((4, 4), 3.0))
    np.testing.assert_array_equal(rs_normalized_difference(r, 1, 2), np.full((4, 4), 0.5))
    st = rs_band_stats(r, 1)
    assert st["mean"] == 6.0 and st["count"] == 16 and st["stddev"] == 0.0
    assert rs_count_value(r, 2, 2.0) == 16
    # zero-sum normalized difference -> NaN
    r2 = Raster(np.stack([np.zeros((2, 2)), np.zeros((2, 2))]))
    assert np.isnan(rs_normalized_difference(r2, 1, 2)).all()


def test_band_op_stage():
    import pyarrow as pa

    batch = pa.table({"nir": [[4.0, 2.0]], "red": [[2.0, 2.0]]})
    out = band_op_fn("normalized_difference", "nir", "red", "ndvi")(batch)
    np.testing.assert_allclose(out["ndvi"].to_pylist()[0], [1 / 3, 0.0])
    out2 = band_op_fn("add", "nir", "red", "s")(batch)
    assert out2["s"].to_pylist()[0] == [6.0, 4.0]
