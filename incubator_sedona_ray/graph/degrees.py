"""Link-graph degree statistics — the first thing anyone computes on a
crawl graph (power-law checks, hub detection, spam heuristics).

Dense-reduce shape (same as :mod:`.pagerank` dense mode): each task
bincounts edge endpoints into an int64 vector of size ``n_nodes``
(contiguous-id contract), vectors tree-merge through
``Dataset.aggregate`` — ZERO shuffles, one pass over the edges. The
degree histogram then falls out of one driver-side bincount of the
degree vector (nodes with degree 0 included). For graphs beyond the
dense cap, compute degrees with the BSP deg kernel in
:func:`.pagerank.pagerank` instead.

No counterpart in the reference repo (Sedona has no graph ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def degree_vector(edges, n_nodes: int, *, col: str = "dst") -> np.ndarray:
    """int64[n_nodes] — how often each node id appears in ``col``."""
    from ray.data.aggregate import AggregateFn

    N = int(n_nodes)

    def acc(a, block):
        if isinstance(block, pa.Table):
            v = block[col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            v = block[col].to_numpy().astype(np.int64)
        return a + np.bincount(v, minlength=N).astype(np.int64)

    agg = edges.select_columns([col]).aggregate(
        AggregateFn(
            init=lambda k: np.zeros(N, dtype=np.int64),
            merge=lambda a, b: a + b,
            accumulate_block=acc,
            name="deg",
        )
    )
    return agg["deg"] if agg else np.zeros(N, dtype=np.int64)


def degree_histogram(edges, n_nodes: int, *, direction: str = "in"):
    """Dataset(degree, n_nodes): how many nodes have each in/out-degree
    (degree-0 nodes included)."""
    import ray

    col = {"in": "dst", "out": "src"}[direction]
    deg = degree_vector(edges, n_nodes, col=col)
    hist = np.bincount(deg)
    nz = np.flatnonzero(hist)
    return ray.data.from_arrow(
        pa.table(
            {
                "degree": pa.array(nz.astype(np.int64)),
                "n_nodes": pa.array(hist[nz].astype(np.int64)),
            }
        )
    )
