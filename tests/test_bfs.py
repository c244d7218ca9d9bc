"""Tests for distributed multi-source BFS (graph/bfs.py) vs a sequential
reference."""

from collections import deque

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.graph.bfs import hop_distance


def _ref_bfs(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(edges, seeds, max_hops=10, mode="bsp"):
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    s = pa.table({"node": pa.array(seeds, type=pa.int64())})
    n = 1 + max(
        max((a for a, _ in edges), default=0),
        max((b for _, b in edges), default=0),
        max(seeds, default=0),
    )
    out = hop_distance(
        ray.data.from_arrow(e),
        ray.data.from_arrow(s),
        max_hops=max_hops,
        num_partitions=3,
        mode=mode,
        n_nodes=n if mode == "dense" else None,
    ).to_pandas()
    return dict(zip(out["node"].astype(int), out["hop"].astype(int)))


def test_bfs_matches_reference(ray_session):
    rnd = np.random.default_rng(6)
    edges = [(int(rnd.integers(0, 40)), int(rnd.integers(0, 40))) for _ in range(120)]
    seeds = [0, 7]
    want = _ref_bfs(edges, seeds, 10)
    assert _run(edges, seeds, mode="bsp") == want
    assert _run(edges, seeds, mode="dense") == want


def test_bfs_max_hops_truncates(ray_session):
    chain = [(i, i + 1) for i in range(10)]
    got = _run(chain, [0], max_hops=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_early_stop_and_unreachable(ray_session):
    edges = [(0, 1), (1, 2), (5, 6)]  # 5,6 unreachable from seed 0
    got = _run(edges, [0], max_hops=9)
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_min_hop_wins(ray_session):
    # two paths to node 3: 0->1->3 (hop 2) and 0->2->4->3 (hop 3)
    edges = [(0, 1), (1, 3), (0, 2), (2, 4), (4, 3)]
    got = _run(edges, [0])
    assert got[3] == 2


def test_bfs_dense_truncation_and_unreachable(ray_session):
    chain = [(i, i + 1) for i in range(10)] + [(20, 21)]
    got = _run(chain, [0], max_hops=3, mode="dense")
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_join_mode_and_bsp_partition_invariance(ray_session):
    rnd = np.random.default_rng(9)
    edges = [(int(rnd.integers(0, 37)), int(rnd.integers(0, 37))) for _ in range(110)]
    seeds = [3, 11]
    want = _ref_bfs(edges, seeds, 8)
    assert _run(edges, seeds, max_hops=8, mode="join") == want
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    s = pa.table({"node": pa.array(seeds, type=pa.int64())})
    for R in (1, 2, 5, 64):
        out = hop_distance(
            ray.data.from_arrow(e),
            ray.data.from_arrow(s),
            max_hops=8,
            num_partitions=R,
            mode="bsp",
        ).to_pandas()
        got = dict(zip(out["node"].astype(int), out["hop"].astype(int)))
        assert got == want, R


def test_bfs_join_mode_non_contiguous_ids(ray_session):
    # the join engine's contract: arbitrary int64 ids, no [0, N) normal form
    edges = [(10**12, 5), (5, 7_000_000_000), (7_000_000_000, 10**12)]
    got = _run(edges, [10**12], mode="join")
    assert got == {10**12: 0, 5: 1, 7_000_000_000: 2}


def test_bfs_auto_mode_sparse_ids_falls_back_to_join(ray_session):
    # auto mode with hashed/sparse int64 ids must NOT derive
    # n_nodes = max_id + 1 and allocate O(max_id) dense slices — it
    # should detect n_nodes >> edge count and use the join engine.
    edges = [(10**12, 5), (5, 7_000_000_000), (7_000_000_000, 10**12)]
    got = _run(edges, [10**12], mode="auto")
    assert got == {10**12: 0, 5: 1, 7_000_000_000: 2}
