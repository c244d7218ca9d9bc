"""Partitioned kNN join (expanding radius) vs broadcast baseline; flagship
checkpointed run + resume."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.join.knn import knn_join, knn_join_partitioned
from incubator_sedona_ray.pipelines.pages import run_flagship_checkpointed

pytestmark = pytest.mark.usefixtures("ray_session")


def test_knn_join_partitioned_matches_broadcast():
    rng = np.random.default_rng(13)
    pts = pd.DataFrame({"pid": np.arange(800), "lon": rng.uniform(0, 100, 800), "lat": rng.uniform(0, 100, 800)})
    queries = pd.DataFrame({"query_id": np.arange(4), "qx": rng.uniform(0, 100, 4), "qy": rng.uniform(0, 100, 4)})
    right = ray.data.from_pandas(pts)
    base = knn_join(right, queries, k=6, right_geom=("lon", "lat"), right_id="pid").to_pandas()
    part = knn_join_partitioned(
        right, queries, k=6, right_geom=("lon", "lat"), right_id="pid", initial_radius=2.0, max_rounds=10
    ).to_pandas()
    assert set(zip(base.query_id, base.pid, base["rank"])) == set(zip(part.query_id, part.pid, part["rank"]))


def test_knn_join_partitioned_sparse_region_complete():
    """ADVICE regression: a query far outside the data extent (or with a
    tiny initial radius in meter-scale coords) must still get exact k
    neighbours — the radius keeps doubling until it covers the extent
    diagonal instead of silently stopping at max_rounds."""
    rng = np.random.default_rng(7)
    # meter-scale coordinates: old 8-round cap reached only 128x radius
    pts = pd.DataFrame(
        {"pid": np.arange(500), "lon": rng.uniform(0, 1e6, 500), "lat": rng.uniform(0, 1e6, 500)}
    )
    queries = pd.DataFrame({"query_id": [0], "qx": [-5e5], "qy": [-5e5]})
    right = ray.data.from_pandas(pts)
    base = knn_join(right, queries, k=5, right_geom=("lon", "lat"), right_id="pid").to_pandas()
    part = knn_join_partitioned(
        right, queries, k=5, right_geom=("lon", "lat"), right_id="pid", initial_radius=1.0
    ).to_pandas()
    assert set(zip(base.pid, base["rank"])) == set(zip(part.pid, part["rank"]))


def test_knn_join_partitioned_fewer_than_k():
    """When the dataset has fewer than k points, every existing point comes
    back ranked — the partial result is exact, not truncated."""
    pts = pd.DataFrame({"pid": [0, 1, 2], "lon": [1.0, 2.0, 3.0], "lat": [0.0, 0.0, 0.0]})
    queries = pd.DataFrame({"query_id": [7], "qx": [0.0], "qy": [0.0]})
    right = ray.data.from_pandas(pts)
    part = knn_join_partitioned(
        right, queries, k=10, right_geom=("lon", "lat"), right_id="pid"
    ).to_pandas()
    assert sorted(part.pid) == [0, 1, 2]
    assert sorted(part["rank"]) == [1, 2, 3]


def test_flagship_checkpointed_resume():
    out = "/tmp/flagship_ckpt_test"
    shutil.rmtree(out, ignore_errors=True)
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = run_flagship_checkpointed(docs, out, tiles=4)
    assert len(m1["completed"]) > 0
    assert m1["skipped_resume"] == []
    total1 = sum(m["rows"] for m in m1["metrics"])
    # wipe one tile, rerun -> only that tile rewritten
    victim = m1["completed"][0]
    shutil.rmtree(os.path.join(out, f"tile_id={victim}"))
    m2 = run_flagship_checkpointed(docs, out, tiles=4)
    assert [m["part"] for m in m2["metrics"]] == [victim]
    assert sorted(m2["completed"]) == sorted(m1["completed"])
    # lineage names recorded for every tile
    assert m2["lineage"][str(victim)].startswith("tile:")
    # byte-identical text invariant through the pipeline
    from incubator_sedona_ray.state.manifest import read_checkpointed
    import hashlib

    back = read_checkpointed(out, "tile_id").to_pandas()
    src = docs.to_pandas()
    src_hash = {r.doc_id: hashlib.sha256(r.text.encode()).hexdigest() for r in src.itertuples()}
    # url encodes doc_id: https://srcX-<id>.tld/p/<id>
    for row in back.itertuples():
        did = int(row.url.rsplit("/", 1)[-1])
        assert hashlib.sha256(row.text.encode()).hexdigest() == src_hash[did]
