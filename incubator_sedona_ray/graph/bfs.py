"""Distributed multi-source BFS hop distance over a link graph — the
frontier-expansion primitive behind crawl-depth labeling, seed-set
expansion (curated-site proximity as a quality signal, cf. Common Crawl's
harmonic-centrality selection), and reachability filters.

Three engines:

``bsp`` (the 100 TB path) shares :mod:`._topo`'s compiled-topology BSP
machinery with pagerank/hits: the static edge table is range-partitioned
and CSR-compiled ONCE (raw-task block split, no sort); each hop then
runs R scatter tasks (frontier mask gathered through the precompiled
permutation, masked ``reduceat`` per destination segment -> sparse
newly-reachable id lists) and R gather tasks (first-arrival wins on the
sharded distance slice). Per-hop exchange volume is bounded by the
frontier's out-neighborhood, never the edge table.

``join`` works on ARBITRARY (non-contiguous) int64 node ids: per hop one
hash join frontier x edges on src + one groupby-min against the
accumulated distance table. Costs an edge-table exchange per hop — keep
it for id spaces that aren't normalized to [0, n_nodes).

``dense``: the shuffle-free vector plan for graphs under
``dense_max_nodes``. All three terminate early when a hop discovers zero
new nodes; unreached nodes are simply absent from the output (at web
scale the reachable set is the output, the full node universe is never
shipped).

SQL equivalence: min-hop BFS is the recursive-CTE shortest path
``WITH RECURSIVE r AS (seeds UNION ALL step) SELECT node, min(hop)`` —
the oracle the driver runs.

No counterpart in the reference repo (Sedona has no graph ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hop_distance_dense(edges, seeds, max_hops, src_col, dst_col, node_col, n_nodes):
    """Dense mode (contiguous ids in [0, n_nodes)): the distance vector is
    one int64 array; each hop is ONE shuffle-free edges pass — per-task
    'newly reached' dense masks tree-merge through Dataset.aggregate with
    the current frontier mask broadcast via ray.put (the pagerank dense
    pattern). Early-stops when a round reaches nothing new."""
    import ray
    from ray.data.aggregate import AggregateFn

    N = int(n_nodes)
    edges_slim = edges.select_columns([src_col, dst_col]).materialize()

    seed_ids = np.unique(
        np.concatenate(
            [
                b[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
                for b in seeds.select_columns([node_col]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    dist = np.full(N, -1, dtype=np.int64)
    dist[seed_ids] = 0
    frontier = np.zeros(N, dtype=bool)
    frontier[seed_ids] = True

    for h in range(1, max_hops + 1):
        if not frontier.any():
            break
        ref = ray.put(frontier)

        def acc(a, block, _ref=ref):
            if isinstance(block, pa.Table):
                s = block[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
                d = block[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                s = block[src_col].to_numpy().astype(np.int64)
                d = block[dst_col].to_numpy().astype(np.int64)
            f = ray.get(_ref)
            a = a.copy()
            a[d[f[s]]] = True
            return a

        agg = edges_slim.aggregate(
            AggregateFn(
                init=lambda k: np.zeros(N, dtype=bool),
                merge=lambda a, b: a | b,
                accumulate_block=acc,
                name="reached",
            )
        )
        reached = agg["reached"] if agg else np.zeros(N, dtype=bool)
        frontier = reached & (dist < 0)
        dist[frontier] = h

    found = np.flatnonzero(dist >= 0)
    return ray.data.from_arrow(
        pa.table(
            {
                node_col: pa.array(found.astype(np.int64)),
                "hop": pa.array(dist[found]),
            }
        )
    )


def _seed_ids(seeds, node_col) -> np.ndarray:
    return np.unique(
        np.concatenate(
            [
                b[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
                for b in seeds.select_columns([node_col]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )


def _hop_distance_bsp(edges, seeds, max_hops, src_col, dst_col, node_col, N, R):
    """Compiled-topology BSP (graph/_topo.py, shared with pagerank/hits):
    the edge table is CSR-compiled once per src range; each hop runs R
    scatter tasks — frontier mask gathered through the precompiled
    permutation, masked reduceat per destination segment emits the SPARSE
    list of ids reachable from this range's frontier — and R gather tasks
    that apply first-arrival-wins on the sharded distance slice. The
    driver sees only R new-node counts per hop (the termination check);
    exchange volume per hop is the frontier's out-neighborhood, never the
    edge table. Bit-equal to the dense and join engines."""
    import ray

    from ._topo import build_range_topos, make_spans

    spans = make_spans(N, R)
    topo = build_range_topos(edges, src_col, dst_col, N, R, spans)
    seed_a = _seed_ids(seeds, node_col)

    @ray.remote(num_returns=2)
    def _init(lo, hi, sa):
        dist = np.full(hi - lo, -1, dtype=np.int64)
        inr = sa[(sa >= lo) & (sa < hi)] - lo
        dist[inr] = 0
        fr = np.zeros(hi - lo, dtype=bool)
        fr[inr] = True
        return (dist, fr), len(inr)

    state, counts = [], []
    for lo, hi in spans:
        st, c = _init.remote(lo, hi, seed_a)
        state.append(st)
        counts.append(c)

    @ray.remote
    def _scatter(tp, st):
        """Sparse per-destination-range lists of locally-reachable ids."""
        if tp is None:
            return [None] * R if R > 1 else None
        key_perm, cuts, segs = tp
        _, fr = st  # auto-dereferenced
        m = fr[key_perm]
        out = []
        for r2 in range(R):
            seg = segs[r2]
            a, b = cuts[r2], cuts[r2 + 1]
            if seg is None or not m[a:b].any():
                out.append(None)
                continue
            idx, starts = seg
            hit = np.add.reduceat(m[a:b].astype(np.int64), starts) > 0
            out.append(idx[hit])
        return out if R > 1 else out[0]

    @ray.remote(num_returns=2)
    def _gather(h, st, partials):
        dist, _ = st
        arrived = np.zeros(len(dist), dtype=bool)
        for p in ray.get(partials):
            if p is not None:
                arrived[p] = True
        new = arrived & (dist < 0)
        dist = dist.copy()  # plasma buffers are read-only
        dist[new] = h
        return (dist, new), int(new.sum())

    for h in range(1, max_hops + 1):
        if sum(ray.get(counts)) == 0:  # BSP barrier: R small ints
            break
        partials = [
            _scatter.options(num_returns=R).remote(topo[rid], state[rid])
            for rid in range(R)
        ]
        if R == 1:
            partials = [[partials[0]]]
        nxt_state, nxt_counts = [], []
        for rid in range(R):
            st, c = _gather.remote(h, state[rid], [partials[s][rid] for s in range(R)])
            nxt_state.append(st)
            nxt_counts.append(c)
        state, counts = nxt_state, nxt_counts

    @ray.remote
    def _to_arrow(lo, st):
        dist, _ = st
        found = np.flatnonzero(dist >= 0)
        return pa.table(
            {
                node_col: pa.array(found.astype(np.int64) + lo),
                "hop": pa.array(dist[found]),
            }
        )

    return ray.data.from_arrow_refs(
        [_to_arrow.remote(spans[rid][0], state[rid]) for rid in range(R)]
    )


def _derive_n_nodes(edges, seeds, src_col, dst_col, node_col) -> int:
    """Id-space bound from one cheap max() pass over endpoints + seeds."""
    hi = -1
    for d, cols in ((edges, (src_col, dst_col)), (seeds, (node_col,))):
        for c in cols:
            m = d.max(c)
            if m is not None:
                hi = max(hi, int(m))
    if hi < 0:
        raise ValueError("hop_distance: empty graph and no n_nodes given")
    return hi + 1


def hop_distance(
    edges,
    seeds,
    *,
    max_hops: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    num_partitions: int | None = None,
    mode: str = "auto",
    n_nodes: int | None = None,
    dense_max_nodes: int = 1 << 22,
):
    """Dataset(node, hop): minimal number of directed edges from any seed.
    Seeds get hop 0; nodes unreachable within ``max_hops`` are absent.

    ``mode="dense"`` (auto under ``dense_max_nodes``) runs the
    shuffle-free vector plan; ``"bsp"`` (auto above it) keeps node state
    sharded over the compiled topology — the 100 TB path; ``"join"``
    handles arbitrary non-contiguous int64 ids at one edge exchange per
    hop. dense/bsp assume ids in [0, n_nodes) and derive ``n_nodes``
    with a max() pass when not given."""
    import ray
    from ray.data.aggregate import Min

    from ..state.blocks import safe_hash_join

    if mode in ("dense", "bsp", "auto"):
        derived = n_nodes is None
        if n_nodes is None:
            n_nodes = _derive_n_nodes(edges, seeds, src_col, dst_col, node_col)
        if mode == "auto" and derived and n_nodes > dense_max_nodes:
            # A derived n_nodes = max_id + 1 is only meaningful for
            # near-contiguous id spaces; hashed/sparse int64 ids would
            # make dense/bsp allocate O(max_id) slices. If the id space
            # is much larger than the edge count, fall back to the join
            # engine, which handles arbitrary int64 ids.
            n_edges = edges.count()
            if n_nodes > 16 * max(1, n_edges):
                mode = "join"
        if mode != "join" and (
            mode == "dense" or (mode == "auto" and n_nodes <= dense_max_nodes)
        ):
            return _hop_distance_dense(
                edges, seeds, max_hops, src_col, dst_col, node_col, n_nodes
            )
        if mode != "join":
            if num_partitions is None:
                try:
                    num_partitions = max(
                        2, int(ray.cluster_resources().get("CPU", 4))
                    )
                except Exception:
                    num_partitions = 4
            R = max(1, min(int(num_partitions), int(n_nodes)))
            return _hop_distance_bsp(
                edges, seeds, max_hops, src_col, dst_col, node_col, int(n_nodes), R
            )
    if mode != "join":
        raise ValueError(f"unknown hop_distance mode: {mode!r}")

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4

    def seed_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: t[node_col].cast(pa.int64()),
                "hop": pa.array([0] * t.num_rows, type=pa.int64()),
            }
        )

    dist = seeds.map_batches(seed_rows, batch_format="pyarrow").materialize()
    frontier = dist
    edges_slim = edges.select_columns([src_col, dst_col]).materialize()

    for h in range(1, max_hops + 1):
        reached = safe_hash_join(
            edges_slim,
            frontier.select_columns([node_col]),
            "inner",
            num_partitions,
            on=(src_col,),
            right_on=(node_col,),
            scrub_left=True,
            scrub_right=True,
        ).map_batches(
            lambda t, _h=h: pa.table(
                {
                    node_col: t[dst_col].cast(pa.int64()),
                    "hop": pa.array([_h] * t.num_rows, type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        # groupby-min over (old distances ∪ new arrivals): first hop wins
        new_dist = (
            dist.union(reached)
            .groupby(node_col)
            .aggregate(Min("hop", alias_name="hop"))
            .materialize()
        )
        # the new frontier = nodes whose (minimal) hop IS this round's h —
        # exactly the nodes discovered for the first time
        frontier = new_dist.filter(lambda r, _h=h: r["hop"] == _h)
        n_new = frontier.count()
        dist = new_dist
        if n_new == 0:
            break
    return dist
