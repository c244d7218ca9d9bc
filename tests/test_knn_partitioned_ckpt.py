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
    )
    assert set(zip(base.query_id, base.pid, base["rank"])) == set(zip(part.query_id, part.pid, part["rank"]))


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
