"""Compiled-topology connected components (graph/components.py) vs a
union-find reference; partition invariance; isolated-node coverage."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.graph.components import connected_components


def _ref_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    out = np.empty(n, dtype=np.int64)
    roots = {}
    for i in range(n):
        r = find(i)
        roots.setdefault(r, min(roots.get(r, i), i))
    for i in range(n):
        out[i] = roots[find(i)]
    return out


def _run(n, edges, R):
    e = pa.table(
        {
            "src": pa.array([a for a, _ in edges], type=pa.int64()),
            "dst": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    out = (
        connected_components(ray.data.from_arrow(e), n_nodes=n, num_partitions=R)
        .to_pandas()
        .sort_values("node")
    )
    assert len(out) == n
    return out["label"].to_numpy()


def test_components_matches_union_find(ray_session):
    rng = np.random.default_rng(12)
    n = 60
    edges = [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(45)]
    want = _ref_components(n, edges)
    for R in (1, 3, 64):
        assert np.array_equal(_run(n, edges, R), want), R


def test_components_isolated_and_chain(ray_session):
    n = 12
    edges = [(0, 1), (1, 2), (2, 3), (7, 8)]  # 4..6, 9..11 isolated
    got = _run(n, edges, 4)
    want = np.array([0, 0, 0, 0, 4, 5, 6, 7, 7, 9, 10, 11], dtype=np.int64)
    assert np.array_equal(got, want)


def test_components_long_path_converges(ray_session):
    # worst case for label propagation: one long path, diameter = n-1
    n = 30
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(n, edges, 5)
    assert (got == 0).all()


def test_components_raises_when_round_budget_exhausted(ray_session):
    # diameter 29 path with max_rounds=3: labels are still changing when
    # the budget runs out — silent wrong labels must not be returned.
    import pytest

    n = 30
    e = pa.table(
        {
            "src": pa.array(list(range(n - 1)), type=pa.int64()),
            "dst": pa.array(list(range(1, n)), type=pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            ray.data.from_arrow(e), n_nodes=n, num_partitions=3, max_rounds=3
        )


def test_components_converges_on_last_allowed_round(ray_session):
    # path 0-1-2 converges with its LAST change in round 2: max_rounds=2
    # must return the correct labels (the confirming round is granted),
    # not raise
    e = pa.table(
        {
            "src": pa.array([0, 1], type=pa.int64()),
            "dst": pa.array([1, 2], type=pa.int64()),
        }
    )
    out = connected_components(
        ray.data.from_arrow(e), n_nodes=3, num_partitions=2, max_rounds=2
    ).to_pandas()
    assert sorted(out["component"] if "component" in out else out.iloc[:, 1]) == [0, 0, 0]
