"""Partitioner invariants, mirroring the reference partitioner unit tests
(core/src/test/.../spatialPartitioning/): leaves tile the boundary exactly,
points land in exactly one leaf (half-open), extended geometries duplicate
into every intersecting leaf, sample-count policy."""

import numpy as np
import pytest

from incubator_sedona_ray.partition import KDBTree, QuadTree, equal_grid, get_sample_count
from incubator_sedona_ray.partition.base import pad_boundary


def _sample_envs(rng, n, lo=0.0, hi=100.0, max_size=2.0):
    mins = rng.uniform(lo, hi - max_size, size=(n, 2))
    sizes = rng.uniform(0, max_size, size=(n, 2))
    return np.hstack([mins, mins + sizes])


BOUNDARY = pad_boundary((0.0, 0.0, 100.0, 100.0))


@pytest.mark.parametrize("cls", [KDBTree, QuadTree])
def test_leaves_tile_boundary(cls):
    rng = np.random.default_rng(1)
    part = cls(_sample_envs(rng, 2000), BOUNDARY, 16)
    leaves = part.leaves
    assert part.num_partitions >= 2
    # total leaf area == boundary area (exact tiling, no overlap/no gap)
    areas = (leaves[:, 2] - leaves[:, 0]) * (leaves[:, 3] - leaves[:, 1])
    bound_area = (BOUNDARY[2] - BOUNDARY[0]) * (BOUNDARY[3] - BOUNDARY[1])
    np.testing.assert_allclose(areas.sum(), bound_area, rtol=1e-9)
    # no pairwise interior overlap
    for i in range(len(leaves)):
        a = leaves[i]
        others = np.delete(leaves, i, axis=0)
        ox = np.minimum(a[2], others[:, 2]) - np.maximum(a[0], others[:, 0])
        oy = np.minimum(a[3], others[:, 3]) - np.maximum(a[1], others[:, 1])
        assert bool(np.all((ox <= 1e-12) | (oy <= 1e-12)))


@pytest.mark.parametrize("cls", [KDBTree, QuadTree])
def test_points_exactly_one_partition(cls):
    rng = np.random.default_rng(2)
    part = cls(_sample_envs(rng, 3000), BOUNDARY, 20)
    xs = rng.uniform(0, 100, 5000)
    ys = rng.uniform(0, 100, 5000)
    pid = part.place_points(xs, ys)
    assert bool(np.all(pid >= 0))
    # points exactly on internal leaf edges still land in exactly one leaf
    edge_x = part.leaves[:, 2][part.leaves[:, 2] < 100]
    if len(edge_x):
        ex = np.full(len(edge_x), edge_x)
        ey = np.full(len(edge_x), 50.0)
        epid = part.place_points(ex, ey)
        assert bool(np.all(epid >= 0))
    # outside the boundary -> dropped (-1), matching the reference shuffle
    assert part.place_points(np.array([200.0]), np.array([50.0]))[0] == -1


@pytest.mark.parametrize("cls", [KDBTree, QuadTree])
def test_envelopes_duplicate_into_all_touched_leaves(cls):
    rng = np.random.default_rng(3)
    part = cls(_sample_envs(rng, 2000), BOUNDARY, 16)
    envs = _sample_envs(rng, 500, max_size=10.0)
    ri, pid = part.place_envelopes(envs)
    # brute-force expectation
    expect = set()
    for j, e in enumerate(envs):
        for k, lv in enumerate(part.leaves):
            if not (e[2] < lv[0] or lv[2] < e[0] or e[3] < lv[1] or lv[3] < e[1]):
                expect.add((j, k))
    assert set(zip(ri.tolist(), pid.tolist())) == expect


def test_kdb_determinism():
    rng = np.random.default_rng(4)
    s = _sample_envs(rng, 1000)
    a = KDBTree(s, BOUNDARY, 10)
    b = KDBTree(s, BOUNDARY, 10)
    np.testing.assert_array_equal(a.leaves, b.leaves)


def test_equal_grid():
    part = equal_grid(BOUNDARY, 16)
    # force-grown to log4(16)=2 levels -> exactly 16 equal leaves
    assert part.num_partitions == 16
    areas = (part.leaves[:, 2] - part.leaves[:, 0]) * (part.leaves[:, 3] - part.leaves[:, 1])
    np.testing.assert_allclose(areas, areas[0])


def test_quadtree_lineage():
    rng = np.random.default_rng(5)
    part = QuadTree(_sample_envs(rng, 2000), BOUNDARY, 16)
    assert len(part.lineages) == part.num_partitions
    assert len(set(part.lineages)) == part.num_partitions  # unique stable names
    # lineage depth equals tree depth encoded in leaf size
    for lineage, leaf in zip(part.lineages, part.leaves):
        w = leaf[2] - leaf[0]
        assert abs(w - (BOUNDARY[2] - BOUNDARY[0]) / (2 ** len(lineage))) < 1e-9


def test_sample_count_policy():
    # < 1000 records -> all
    assert get_sample_count(4, 500) == 500
    # >= 1000 -> max(2*parts, total/100)
    assert get_sample_count(4, 100_000) == 1000
    assert get_sample_count(600, 100_000) == 1200
    assert get_sample_count(4, 100_000, given=77) == 77
    with pytest.raises(ValueError):
        get_sample_count(600, 1000)  # parts > half the records
    with pytest.raises(ValueError):
        get_sample_count(4, 100, given=200)
