"""Checkpointed partitioned write: atomicity markers, resume skip, manifest,
metrics actor."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.state import JoinMetrics, checkpointed_write, read_manifest
from incubator_sedona_ray.state.manifest import read_checkpointed

pytestmark = pytest.mark.usefixtures("ray_session")

OUT = "/tmp/ckpt_test_out"


def _df(n=1000):
    rng = np.random.default_rng(0)
    return pd.DataFrame({"part_id": rng.integers(0, 8, n), "v": np.arange(n)})


def test_checkpointed_write_and_resume():
    shutil.rmtree(OUT, ignore_errors=True)
    df = _df()
    ds = ray.data.from_pandas(df)
    manifest = checkpointed_write(ds, OUT, "part_id", lineage={"0": "root0"})
    assert sorted(manifest["completed"]) == sorted(df.part_id.unique().tolist())
    assert manifest["skipped_resume"] == []
    total_rows = sum(m["rows"] for m in manifest["metrics"])
    assert total_rows == len(df)
    # all partitions have _SUCCESS
    for p in df.part_id.unique():
        assert os.path.exists(f"{OUT}/part_id={p}/_SUCCESS")

    # simulate a partial failure: delete two partitions' markers + data
    for p in [0, 1]:
        shutil.rmtree(f"{OUT}/part_id={p}")
    m2 = checkpointed_write(ray.data.from_pandas(df), OUT, "part_id")
    assert sorted(m2["skipped_resume"]) == sorted(set(df.part_id.unique()) - {0, 1})
    # only the two missing partitions were rewritten
    assert sorted(m["part"] for m in m2["metrics"]) == [0, 1]

    # full round-trip
    back = read_checkpointed(OUT).to_pandas().sort_values("v").reset_index(drop=True)
    assert len(back) == len(df)
    assert set(back.v) == set(df.v)
    mf = read_manifest(OUT)
    assert sorted(mf["completed"]) == sorted(df.part_id.unique().tolist())


def test_join_metrics_actor():
    from incubator_sedona_ray.join import spatial_join
    from incubator_sedona_ray.geom import Geometry
    from incubator_sedona_ray.geom.wkb import to_wkb

    zones = pd.DataFrame(
        {"zone_id": [0, 1], "geom": [to_wkb(Geometry.box(0, 0, 50, 50)), to_wkb(Geometry.box(50, 0, 100, 50))]}
    )
    rng = np.random.default_rng(1)
    pts = pd.DataFrame({"pid": np.arange(200), "lon": rng.uniform(0, 100, 200), "lat": rng.uniform(0, 50, 200)})
    metrics = JoinMetrics()
    joined = spatial_join(
        ray.data.from_pandas(zones),
        ray.data.from_pandas(pts),
        "covers",
        left_geom="geom",
        right_geom=("lon", "lat"),
        num_partitions=1,
        metrics=metrics,
    )
    n = joined.count()
    # reports are fire-and-forget from workers; poll briefly for delivery
    import time

    totals = metrics.totals()
    for _ in range(20):
        if totals["results"] == n:
            break
        time.sleep(0.25)
        totals = metrics.totals()
    assert totals["results"] == n
    assert totals["candidates"] >= totals["results"]
    assert totals["stream"] > 0


def test_checkpointed_write_all_complete_resume():
    import shutil

    out = "/tmp/ckpt_all_done"
    shutil.rmtree(out, ignore_errors=True)
    df = _df(200)
    checkpointed_write(ray.data.from_pandas(df), out, "part_id")
    # second run with EVERYTHING complete must be a no-op, not an error
    m = checkpointed_write(ray.data.from_pandas(df), out, "part_id")
    assert m["metrics"] == []
    assert sorted(m["skipped_resume"]) == sorted(df.part_id.unique().tolist())


def test_checkpoint_empty_partition_marked_complete(tmp_path):
    """ADVICE regression: a partition with no rows must still get a
    _SUCCESS marker (via expected_parts) so resume skips it instead of
    re-running the whole upstream every time."""
    import pandas as pd
    import ray
    from incubator_sedona_ray.state.manifest import checkpointed_write, _done_partitions

    out = str(tmp_path / "ckpt")
    df = pd.DataFrame({"part_id": [0, 0, 2], "v": [1, 2, 3]})  # partition 1 is empty
    m1 = checkpointed_write(ray.data.from_pandas(df), out, expected_parts=range(3))
    assert m1["completed"] == [0, 1, 2]
    assert _done_partitions(out, "part_id") == {"0", "1", "2"}
    # resume: nothing re-executes, including the empty partition
    m2 = checkpointed_write(ray.data.from_pandas(df), out, expected_parts=range(3))
    assert m2["metrics"] == []
    assert sorted(m2["skipped_resume"]) == [0, 1, 2]


def test_checkpoint_string_keys_resume(tmp_path):
    import pandas as pd
    import ray
    from incubator_sedona_ray.state.manifest import checkpointed_write

    out = str(tmp_path / "ckpt_str")
    df = pd.DataFrame({"part_id": ["a", "b", "a"], "v": [1, 2, 3]})
    m1 = checkpointed_write(ray.data.from_pandas(df), out)
    assert sorted(m1["completed"]) == ["a", "b"]
    m2 = checkpointed_write(ray.data.from_pandas(df), out)
    assert m2["metrics"] == []  # string keys resume cleanly (no mixed-type value set)
