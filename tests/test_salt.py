"""Salted repartition: output equality with unsalted join + balanced groups
under extreme skew."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.conf import SpatialConf
from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.wkb import to_wkb
from incubator_sedona_ray.join import spatial_join
from incubator_sedona_ray.partition import KDBTree
from incubator_sedona_ray.partition.base import pad_boundary
from incubator_sedona_ray.partition.salt import SaltedPartitioner, leaf_sample_counts

pytestmark = pytest.mark.usefixtures("ray_session")


def _skewed_points(n=4000, seed=0):
    """The atomic-hot-key case: 75% of rows at ONE exact coordinate (a
    mega-domain all geocoding to the same point). Adaptive KDB/quadtree
    splits cannot separate identical keys — only salting helps."""
    rng = np.random.default_rng(seed)
    hot = np.tile(np.array([[50.05, 50.05]]), (int(n * 0.75), 1))
    cold = rng.uniform(0, 100, size=(n - len(hot), 2))
    pts = np.vstack([hot, cold])
    return pd.DataFrame({"pid": np.arange(n), "lon": pts[:, 0], "lat": pts[:, 1]})


def _zones():
    rows = []
    for bx in range(0, 100, 25):
        for by in range(0, 100, 25):
            rows.append({"zone_id": f"{bx}:{by}", "geom": to_wkb(Geometry.box(bx, by, bx + 25, by + 25))})
    return pd.DataFrame(rows)


def test_salted_partitioner_mechanics():
    pts = _skewed_points()
    env = np.column_stack([pts.lon, pts.lat, pts.lon, pts.lat]).astype(np.float64)
    base = KDBTree(env, pad_boundary((0, 0, 100, 100)), 8)
    counts = leaf_sample_counts(base, env)
    salted = SaltedPartitioner(base, counts, threshold=2.0, max_salt=8)
    assert salted.max_salt > 1
    # every point lands in exactly one salted partition
    pid = salted.place_points(pts.lon.to_numpy(), pts.lat.to_numpy())
    assert (pid >= 0).all()
    # the hot leaf's rows are spread over multiple salts
    sizes = pd.Series(pid).value_counts()
    base_pid = salted.base.place_points(pts.lon.to_numpy(), pts.lat.to_numpy())
    hot_leaf = pd.Series(base_pid).value_counts().idxmax()
    hot_salts = {p for p in sizes.index if p // salted.max_salt == hot_leaf}
    assert len(hot_salts) > 1
    # max salted group is much smaller than the unsalted hot leaf
    assert sizes.max() < pd.Series(base_pid).value_counts().max()
    # envelopes replicate to every salt of touched leaves
    e = np.array([[49.0, 49.0, 51.0, 51.0]])
    ri, spid = salted.place_envelopes(e)
    leaves_hit = {int(p // salted.max_salt) for p in spid}
    for leaf in leaves_hit:
        expect = int(salted.salts[leaf])
        got = sum(1 for p in spid if p // salted.max_salt == leaf)
        assert got == expect


def test_salted_join_matches_unsalted():
    pts = _skewed_points(3000, seed=3)
    zones = _zones()
    zds = ray.data.from_pandas(zones)
    pds = ray.data.from_pandas(pts)

    def run(threshold):
        conf = SpatialConf(salt_threshold=threshold, salt_max=8)
        out = spatial_join(
            zds, pds, "covers", left_geom="geom", right_geom=("lon", "lat"), num_partitions=8, conf=conf
        ).to_pandas()
        return set(zip(out.l_zone_id, out.r_pid))

    unsalted = run(0.0)
    salted = run(1.5)  # aggressive threshold -> salting definitely active
    assert salted == unsalted
