"""HDF4 DFSD codec + EarthdataHDFPointMapper-parity tests
(reference: core/.../formatMapper/EarthdataHDFPointMapper.java:217-259)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.sources.earthdata import (
    decode_hdf4_sds,
    earthdata_points,
    earthdata_points_fn,
    encode_hdf4_sds,
)

pytestmark = pytest.mark.usefixtures("ray_session")

GEO = "MOD_Swath_LST/Geolocation_Fields"
DAT = "MOD_Swath_LST/Data_Fields"


def _swath(nj=3, ni=4, inc=2):
    lon = np.linspace(-120, -100, nj * ni).reshape(nj, ni)
    lat = np.linspace(30, 45, nj * ni).reshape(nj, ni)
    lst = (np.arange(nj * inc * ni * inc, dtype=np.float64) * 0.5).reshape(nj * inc, ni * inc)
    qc = np.arange(nj * inc * ni * inc, dtype=np.int16).reshape(nj * inc, ni * inc)
    return {
        f"{GEO}/Longitude": lon,
        f"{GEO}/Latitude": lat,
        f"{DAT}/LST": lst,
        f"{DAT}/QC": qc,
    }


def test_codec_roundtrip():
    arrays = _swath()
    blob = encode_hdf4_sds(arrays)
    assert blob[:4] == b"\x0e\x03\x13\x01"
    back = decode_hdf4_sds(blob)
    assert set(back) == set(arrays)
    for k in arrays:
        assert back[k].dtype == np.asarray(arrays[k]).dtype
        np.testing.assert_array_equal(back[k], arrays[k])


def test_codec_rejects_garbage():
    with pytest.raises(ValueError):
        decode_hdf4_sds(b"not an hdf file at all")


def test_mapper_matches_reference_loop():
    arrays = _swath(inc=2)
    out = earthdata_points(arrays, ["LST", "QC"], offset=1, increment=2).to_pandas()
    lon2d, lat2d = arrays[f"{GEO}/Longitude"], arrays[f"{GEO}/Latitude"]
    lst, qc = arrays[f"{DAT}/LST"], arrays[f"{DAT}/QC"]
    assert len(out) == lon2d.size
    # reference per-cell loop, transcribed
    k = 0
    for j in range(lon2d.shape[0]):
        for i in range(lon2d.shape[1]):
            row = out.iloc[k]
            assert row.lon == lon2d[j, i] and row.lat == lat2d[j, i]
            jj, ii = min(j * 2 + 1, lst.shape[0] - 1), min(i * 2 + 1, lst.shape[1] - 1)
            assert row.LST == lst[jj, ii]
            assert row.QC == qc[jj, ii]
            assert row.user_data == f"{lst[jj, ii]} {qc[jj, ii]}"
            k += 1


def test_switch_xy():
    arrays = _swath()
    a = earthdata_points(arrays, ["LST"]).to_pandas()
    b = earthdata_points(arrays, ["LST"], switch_xy=True).to_pandas()
    assert (a.lon.to_numpy() == b.lat.to_numpy()).all()


def test_end_to_end_ray(tmp_path):
    path = tmp_path / "swath.hdf"
    path.write_bytes(encode_hdf4_sds(_swath()))
    ds = ray.data.read_binary_files(str(path))
    out = ds.map_batches(
        earthdata_points_fn(["LST"]), batch_format="pyarrow"
    ).to_pandas()
    assert len(out) == 12
    assert {"lon", "lat", "LST", "user_data"} <= set(out.columns)
