"""Connected components over a contiguous-id graph via min-label
propagation on the compiled-topology BSP engine (graph/_topo.py — the
same machinery as pagerank/hits/bfs).

For graphs in the crawl normal form (int64 ids in [0, n_nodes)) this
replaces dedup/minhash.py's join-based label propagation, which
re-exchanges the STATIC edge table through a hash join every round: here
the symmetrized edges are CSR-compiled once, and each round runs R
scatter tasks (labels gathered through the precompiled permutation,
``np.minimum.reduceat`` per destination segment -> sparse per-range
label minima) and R gather tasks (elementwise min into the sharded label
slice). The driver sees only R changed-counts per round — convergence is
certified by a round with zero label changes (labels decrease
monotonically). Keep the join-based variant for ARBITRARY ids
(near-dup pair streams keyed by raw doc ids).

Isolated nodes keep their own id as label (the dense slices cover the
full [0, n_nodes) universe). Results match DuckDB's recursive-CTE
transitive closure exactly — labels are min component ids, integers.

No counterpart in the reference repo (Sedona has no graph ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(
    edges,
    *,
    n_nodes: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    num_partitions: int | None = None,
    max_rounds: int = 50,
):
    """Dataset(node, label) for every node in [0, n_nodes); label is the
    component's minimum node id. Edges are treated as undirected."""
    import ray

    from ._topo import build_range_topos, make_spans

    if n_nodes <= 0:
        raise ValueError("connected_components needs n_nodes > 0")
    N = int(n_nodes)
    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_partitions = 4
    R = max(1, min(int(num_partitions), N))
    spans = make_spans(N, R)

    def sym(t: pa.Table) -> pa.Table:
        x = pa.concat_arrays(
            [t[src_col].combine_chunks().cast(pa.int64()), t[dst_col].combine_chunks().cast(pa.int64())]
        )
        y = pa.concat_arrays(
            [t[dst_col].combine_chunks().cast(pa.int64()), t[src_col].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"x": x, "y": y})

    topo = build_range_topos(
        edges.map_batches(sym, batch_format="pyarrow"), "x", "y", N, R, spans
    )

    @ray.remote
    def _init(lo, hi):
        return np.arange(lo, hi, dtype=np.int64)

    labels = [_init.remote(lo, hi) for lo, hi in spans]

    @ray.remote
    def _scatter(tp, lab):
        """Per destination range: the minimum label reachable from this
        range along one edge hop, as sparse (idx, min) pairs."""
        if tp is None:
            return [None] * R if R > 1 else None
        key_perm, cuts, segs = tp
        c = lab[key_perm]
        out = []
        for r2 in range(R):
            seg = segs[r2]
            if seg is None:
                out.append(None)
                continue
            idx, starts = seg
            out.append((idx, np.minimum.reduceat(c[cuts[r2] : cuts[r2 + 1]], starts)))
        return out if R > 1 else out[0]

    @ray.remote(num_returns=2)
    def _gather(lab, partials):
        new = lab.copy()  # plasma buffers are read-only
        for p in ray.get(partials):
            if p is not None:
                idx, mins = p
                np.minimum.at(new, idx, mins)
        return new, int((new < lab).sum())

    converged = False
    # max_rounds + 1: a run whose LAST allowed round makes the final
    # change has converged — only the extra confirming round can tell
    # "changed-and-done" from "still changing", so grant it before
    # declaring non-convergence
    for _ in range(max_rounds + 1):
        partials = [
            _scatter.options(num_returns=R).remote(topo[rid], labels[rid])
            for rid in range(R)
        ]
        if R == 1:
            partials = [[partials[0]]]
        nxt, changed = [], []
        for rid in range(R):
            lb, ch = _gather.remote(labels[rid], [partials[s][rid] for s in range(R)])
            nxt.append(lb)
            changed.append(ch)
        labels = nxt
        if sum(ray.get(changed)) == 0:  # BSP barrier: R small ints
            converged = True
            break
    if not converged:
        # min-label propagation needs O(diameter) rounds; returning the
        # still-changing labels would be silently wrong for any component
        # whose diameter exceeds the round budget.
        raise RuntimeError(
            f"connected_components did not converge within max_rounds="
            f"{max_rounds} (labels still changing) — the graph diameter "
            "exceeds the round budget; raise max_rounds"
        )

    @ray.remote
    def _to_arrow(lo, hi, lab):
        return pa.table(
            {
                node_col: pa.array(np.arange(lo, hi, dtype=np.int64)),
                "label": pa.array(lab),
            }
        )

    return ray.data.from_arrow_refs(
        [_to_arrow.remote(lo, hi, labels[rid]) for rid, (lo, hi) in enumerate(spans)]
    )
