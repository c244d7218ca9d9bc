"""Tests for the broadcast 1-D interval join (join/interval.py) and
anchor aggregation (text/links.py anchor_stats)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.join.interval import interval_join
from incubator_sedona_ray.text.links import anchor_stats, extract_anchors_batch


def _ranges(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "lo": pa.array([r[0] for r in rows], type=pa.int64()),
                "hi": pa.array([r[1] for r in rows], type=pa.int64()),
                "value": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
    )


def _points(vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(range(len(vals)), type=pa.int64()),
                "p": pa.array(vals, type=pa.int64()),
            }
        )
    ).repartition(3)


def test_interval_join_inner_and_left(ray_session):
    ranges = [(0, 9, "a"), (20, 29, "b"), (30, 30, "c")]
    pts = [5, 9, 10, 19, 20, 30, 31, -1]
    inner = (
        interval_join(_points(pts), _ranges(ranges), point_col="p")
        .to_pandas()
        .sort_values("id")
    )
    assert list(zip(inner["p"], inner["value"])) == [(5, "a"), (9, "a"), (20, "b"), (30, "c")]
    left = (
        interval_join(_points(pts), _ranges(ranges), point_col="p", how="left")
        .to_pandas()
        .sort_values("id")
    )
    assert len(left) == len(pts)
    assert left["value"].tolist() == ["a", "a", None, None, "b", "c", None, None]


def test_interval_join_rejects_overlap_and_inverted(ray_session):
    with pytest.raises(ValueError, match="overlap"):
        interval_join(_points([1]), _ranges([(0, 5, "a"), (5, 9, "b")]), point_col="p")
    with pytest.raises(ValueError, match="hi < lo"):
        interval_join(_points([1]), _ranges([(5, 0, "a")]), point_col="p")


def test_interval_join_vs_bruteforce(ray_session):
    rnd = np.random.default_rng(12)
    edges = np.sort(rnd.choice(10_000, size=40, replace=False))
    ranges = [
        (int(edges[i]), int(edges[i + 1]) - 1, f"v{i}") for i in range(0, 38, 2)
    ]
    pts = rnd.integers(-100, 10_100, size=500).tolist()
    got = interval_join(_points(pts), _ranges(ranges), point_col="p").to_pandas()
    want = {
        (i, p): v
        for i, p in enumerate(pts)
        for lo, hi, v in ranges
        if lo <= p <= hi
    }
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[(r.id, r.p)] == r.value


# ------------------------------------------------------------ anchors


def test_extract_anchors_batch():
    t = pa.table(
        {
            "url": ["https://s.com/p"],
            "html": [
                b'<a href="https://a.io/x" rel="nofollow">  Click\n here </a>'
                b'<a href="/local">Local</a><a href="#f">skip</a>'
            ],
        }
    )
    out = extract_anchors_batch(t).to_pydict()
    assert out["dst_url"] == ["https://a.io/x", "https://s.com/local"]
    assert out["anchor"] == ["Click here", "Local"]


def test_anchor_stats_groupby(ray_session):
    t = pa.table(
        {
            "url": [f"https://s{i}.com/" for i in range(4)],
            "html": [
                b'<a href="https://hub.com/t">Beta</a>',
                b'<a href="https://hub.com/t">alpha</a>',
                b'<a href="https://hub.com/t"></a>',  # empty anchor -> null
                b'<a href="https://solo.com/">only</a>',
            ],
        }
    )
    out = (
        anchor_stats(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("dst_url")
        .reset_index(drop=True)
    )
    assert out["dst_url"].tolist() == ["https://hub.com/t", "https://solo.com/"]
    assert out["n_links"].tolist() == [3, 1]
    assert out["top_anchor"].tolist() == ["Beta", "only"]  # min ignores nulls
