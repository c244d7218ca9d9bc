"""Tests for degree statistics (graph/degrees.py)."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.graph.degrees import degree_histogram, degree_vector


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], type=pa.int64()),
                "dst": pa.array([b for _, b in pairs], type=pa.int64()),
            }
        )
    ).repartition(3)


def test_degree_vector_and_histogram(ray_session):
    pairs = [(0, 1), (2, 1), (3, 1), (1, 2), (2, 0), (0, 0)]
    n = 5
    vin = degree_vector(_edges(pairs), n, col="dst")
    assert vin.tolist() == [2, 3, 1, 0, 0]
    vout = degree_vector(_edges(pairs), n, col="src")
    assert vout.tolist() == [2, 1, 2, 1, 0]
    hist = degree_histogram(_edges(pairs), n, direction="in").to_pandas()
    assert dict(zip(hist["degree"], hist["n_nodes"])) == {0: 2, 1: 1, 2: 1, 3: 1}


def test_degree_matches_numpy_fuzz(ray_session):
    rnd = np.random.default_rng(13)
    pairs = [(int(rnd.integers(0, 30)), int(rnd.integers(0, 30))) for _ in range(300)]
    v = degree_vector(_edges(pairs), 30, col="dst")
    want = np.bincount([b for _, b in pairs], minlength=30)
    assert np.array_equal(v, want)
