"""Distributed multi-source BFS hop distance over a link graph — the
frontier-expansion primitive behind crawl-depth labeling, seed-set
expansion (curated-site proximity as a quality signal, cf. Common Crawl's
harmonic-centrality selection), and reachability filters.

BSP shape, one round per hop (same machinery as
:mod:`.pagerank` / min-label components):

  frontier   the nodes first reached at hop h (Dataset)
  expand     hash join frontier x edges on src -> candidate dst nodes
  dedupe     groupby-min against the accumulated distance table: a node
             keeps its FIRST (minimal) hop — later arrivals are dropped
  terminate  when a round discovers zero new nodes (a tiny count), or at
             ``max_hops``

Each round is one edge-sized join + one node-sized groupby, keyed on node
id. The distance table is materialized per round (node-sized) to truncate
lineage; unreached nodes are simply absent (at web scale the reachable
set is the output, the full node universe is never shipped).

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

    ``mode="dense"`` (or auto with ``n_nodes`` <= ``dense_max_nodes`` and
    contiguous ids in [0, n_nodes)) runs the shuffle-free vector plan;
    ``"bsp"`` keeps node state sharded — the 100 TB path."""
    import ray
    from ray.data.aggregate import Min

    from ..state.blocks import safe_hash_join

    if mode == "dense" or (mode == "auto" and n_nodes is not None and n_nodes <= dense_max_nodes):
        if n_nodes is None:
            # explicit dense without n_nodes: derive the id-space bound the
            # same way pagerank falls back to nodes.count() — one cheap
            # max() pass over the edge endpoints and seed ids
            hi = -1
            for d, cols in ((edges, (src_col, dst_col)), (seeds, (node_col,))):
                for c in cols:
                    m = d.max(c)
                    if m is not None:
                        hi = max(hi, int(m))
            if hi < 0:
                raise ValueError(
                    "hop_distance(mode='dense'): empty graph and no n_nodes given"
                )
            n_nodes = hi + 1
        return _hop_distance_dense(
            edges, seeds, max_hops, src_col, dst_col, node_col, n_nodes
        )

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
