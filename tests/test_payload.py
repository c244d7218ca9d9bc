"""Payload re-attach (wide-row rule) + cheap-fit join path."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.join.payload import attach_payload
from incubator_sedona_ray.join import spatial_join
from incubator_sedona_ray.geom import Geometry
from incubator_sedona_ray.geom.wkb import to_wkb

pytestmark = pytest.mark.usefixtures("ray_session")


def _tables(n=500):
    rng = np.random.default_rng(6)
    payload = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "text": [f"payload body {i}" for i in range(n)],
            "lon": rng.uniform(0, 100, n),
            "lat": rng.uniform(0, 100, n),
        }
    )
    slim = pd.DataFrame({"doc_id": rng.choice(n, 80, replace=False), "zone": rng.integers(0, 5, 80)})
    return payload, slim


@pytest.mark.parametrize("strategy", ["broadcast", "hash"])
def test_attach_payload(strategy):
    payload, slim = _tables()
    out = attach_payload(
        ray.data.from_pandas(slim),
        ray.data.from_pandas(payload).repartition(4),
        "doc_id",
        strategy=strategy,
        num_partitions=4,
    ).to_pandas()
    assert len(out) == len(slim)
    assert set(out.doc_id) == set(slim.doc_id)
    merged = out.merge(payload[["doc_id", "text"]], on="doc_id", suffixes=("", "_src"))
    assert (merged.text == merged.text_src).all()  # byte-identical payload
    assert "zone" in out.columns


def test_attach_payload_duplicate_keys():
    payload, _ = _tables(100)
    slim = pd.DataFrame({"doc_id": [3, 3, 7], "zone": [0, 1, 2]})  # doc 3 in two zones
    out = attach_payload(
        ray.data.from_pandas(slim), ray.data.from_pandas(payload), "doc_id", strategy="broadcast"
    ).to_pandas()
    assert len(out) == 3
    assert sorted(out[out.doc_id == 3].zone) == [0, 1]


def test_cheap_fit_join_matches_full():
    rng = np.random.default_rng(9)
    pts = pd.DataFrame({"pid": np.arange(1000), "lon": rng.uniform(0, 100, 1000), "lat": rng.uniform(0, 100, 1000)})
    zones = pd.DataFrame(
        [{"zone_id": f"{bx}:{by}", "geom": to_wkb(Geometry.box(bx, by, bx + 25, by + 25))}
         for bx in range(0, 100, 25) for by in range(0, 100, 25)]
    )
    zds, pds = ray.data.from_pandas(zones), ray.data.from_pandas(pts).repartition(8)
    full = spatial_join(zds, pds, "covers", left_geom="geom", right_geom=("lon", "lat"), num_partitions=4).to_pandas()
    cheap = spatial_join(
        zds, pds, "covers", left_geom="geom", right_geom=("lon", "lat"),
        num_partitions=4, boundary=(0.0, 0.0, 100.0, 100.0),
    ).to_pandas()
    assert set(zip(full.l_zone_id, full.r_pid)) == set(zip(cheap.l_zone_id, cheap.r_pid))
