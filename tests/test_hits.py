"""HITS hubs-and-authorities (graph/hits.py): exact fixed-point vs a numpy
reference, dense/BSP bit-equality, partition-count invariance, and
known-structure sanity."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.graph.hits import hits

SCALE = 10**9


def _ref_hits(n, edges, iters, scale=SCALE):
    """Single-process reference of the exact integer recurrence."""
    src = np.array([s for s, _ in edges], dtype=np.int64)
    dst = np.array([d for _, d in edges], dtype=np.int64)
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        a_raw = np.zeros(n, dtype=np.int64)
        np.add.at(a_raw, dst, h[src])
        a = a_raw // max(int(a_raw.sum()) // scale, 1)
        h_raw = np.zeros(n, dtype=np.int64)
        np.add.at(h_raw, src, a[dst])
        h = h_raw // max(int(h_raw.sum()) // scale, 1)
    return h, a


def _mk(n, edges):
    e = pa.table(
        {
            "src": pa.array([s for s, _ in edges], type=pa.int64()),
            "dst": pa.array([d for _, d in edges], type=pa.int64()),
        }
    )
    nodes = pa.table({"node": pa.array(range(n), type=pa.int64())})
    return ray.data.from_arrow(e), ray.data.from_arrow(nodes)


def _run(n, edges, iters, **kw):
    e, nodes = _mk(n, edges)
    out = hits(e, nodes, iters=iters, **kw).to_pandas().sort_values("node")
    assert len(out) == n
    return out["hub_fp"].to_numpy(), out["auth_fp"].to_numpy()


def _rand_graph(rng, n, m):
    return [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)]


def test_hits_matches_reference_dense(ray_session):
    rng = np.random.default_rng(3)
    n = 50
    edges = _rand_graph(rng, n, 200)
    want_h, want_a = _ref_hits(n, edges, 4)
    got_h, got_a = _run(n, edges, 4, mode="dense")
    assert np.array_equal(got_h, want_h)
    assert np.array_equal(got_a, want_a)


def test_hits_bsp_bit_equal_and_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    n = 41
    edges = _rand_graph(rng, n, 160)
    want_h, want_a = _ref_hits(n, edges, 3)
    for R in (1, 2, 5, 64):
        got_h, got_a = _run(n, edges, 3, mode="bsp", num_partitions=R)
        assert np.array_equal(got_h, want_h), R
        assert np.array_equal(got_a, want_a), R


def test_hits_hub_authority_separation(ray_session):
    # 3 hubs (0,1,2) each link to all 5 authorities (5..9); node 4 isolated
    n = 10
    edges = [(u, v) for u in (0, 1, 2) for v in (5, 6, 7, 8, 9)]
    h, a = _run(n, edges, 5, mode="dense")
    assert h[0] == h[1] == h[2] > 0
    assert a[5] == a[9] > 0
    assert h[5] == a[0] == 0  # authorities aren't hubs and vice versa
    assert h[4] == a[4] == 0  # isolated node
    # floor renormalization bounds total mass per side to [scale-n, 2*scale)
    assert SCALE - n <= int(h.sum()) < 2 * SCALE
    assert SCALE - n <= int(a.sum()) < 2 * SCALE


def test_hits_multi_edges_count_multiply(ray_session):
    n = 4
    edges = [(0, 1), (0, 1), (2, 1), (2, 3)]
    want_h, want_a = _ref_hits(n, edges, 3)
    for mode in ("dense", "bsp"):
        got_h, got_a = _run(n, edges, 3, mode=mode, num_partitions=3)
        assert np.array_equal(got_h, want_h), mode
        assert np.array_equal(got_a, want_a), mode


def test_hits_empty_edges(ray_session):
    n = 5
    e = ray.data.from_arrow(
        pa.table({"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())})
    )
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(n), type=pa.int64())}))
    for mode in ("dense", "bsp"):
        out = hits(e, nodes, iters=2, mode=mode, num_partitions=2).to_pandas()
        assert len(out) == n
        assert (out["hub_fp"] == 0).all() and (out["auth_fp"] == 0).all()


def test_hits_bsp_checkpoint_resume_bit_equal(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    n = 40
    edges = _rand_graph(rng, n, 150)
    e, nodes = _mk(n, edges)

    def run(iters, ckpt=None, every=0):
        return (
            hits(
                e,
                nodes,
                iters=iters,
                mode="bsp",
                num_partitions=4,
                checkpoint_dir=ckpt,
                checkpoint_every=every,
            )
            .to_pandas()
            .sort_values("node")[["hub_fp", "auth_fp"]]
            .to_numpy()
        )

    want = run(4)
    ck = str(tmp_path / "hits_ckpt")
    run(2, ckpt=ck, every=1)  # crash after 2 rounds (last ckpt = round 1)
    got = run(4, ckpt=ck, every=1)
    assert np.array_equal(got, want)
    # prove the load path ran: poison a checkpointed hub slice
    import os

    import pyarrow.parquet as pq

    f = os.path.join(ck, "h_fp_0.parquet")
    t = pq.read_table(f)
    pq.write_table(pa.table({"h_fp": pa.array(t["h_fp"].to_numpy() * 3 + 7)}), f)
    assert not np.array_equal(run(4, ckpt=ck), want)
