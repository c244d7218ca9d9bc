"""Tests for the grouped vector mean (ann/centroid.py): exact quantized
mode vs numpy, float mode, slice/ragged/null handling."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.ann.centroid import _batch_vectors, grouped_vector_mean


def _tbl(groups, mat):
    return pa.table(
        {
            "g": pa.array(groups, type=pa.int64()),
            "v": pa.array([list(map(float, r)) for r in mat], type=pa.list_(pa.float32())),
        }
    )


def test_batch_vectors_roundtrip_and_slice():
    m = np.arange(12, dtype=np.float32).reshape(4, 3)
    t = _tbl([0, 0, 1, 1], m)
    got = _batch_vectors(t, "v")
    assert np.array_equal(got, m.astype(np.float64))
    sliced = t.slice(1, 2)
    got2 = _batch_vectors(sliced, "v")
    assert np.array_equal(got2, m[1:3].astype(np.float64))


def test_batch_vectors_rejects_ragged_and_null():
    t = pa.table({"v": pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="ragged"):
        _batch_vectors(t, "v")
    t2 = pa.table({"v": pa.array([[1.0, 2.0], None], type=pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="null"):
        _batch_vectors(t2, "v")


def test_grouped_mean_quantized_matches_reference(ray_session):
    rnd = np.random.default_rng(2)
    m = rnd.normal(size=(300, 8)).astype(np.float32)
    g = rnd.integers(0, 4, size=300)
    ds = ray.data.from_arrow(_tbl(g, m)).repartition(7)
    out = grouped_vector_mean(ds, "g", "v", quantize_bits=20).to_pandas()
    S = float(1 << 20)
    for grp in range(4):
        rows = out[out["g"] == grp].sort_values("dim")
        sub = m[g == grp].astype(np.float64)
        want = np.floor(sub * S).astype(np.int64).sum(axis=0) / (len(sub) * S)
        assert np.array_equal(rows["centroid"].to_numpy(), want)
        assert (rows["n"] == len(sub)).all()


def test_grouped_mean_float_mode_close(ray_session):
    m = np.ones((50, 3), dtype=np.float32) * 2.5
    g = np.zeros(50, dtype=np.int64)
    out = grouped_vector_mean(ray.data.from_arrow(_tbl(g, m)), "g", "v").to_pandas()
    assert np.allclose(out["centroid"], 2.5)
    assert len(out) == 3
