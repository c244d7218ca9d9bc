"""Distributed PageRank over a crawl/link graph — the canonical iterative
all-to-all workload (Page et al. 1999; the Common-Crawl host-level graph is
the web-scale instance of exactly this edge list).

EXACT FIXED-POINT ARITHMETIC: ranks are int64 "picoranks" (``scale`` =
10^12 per unit of probability mass) and every step is integer-only —
``r // out_degree`` per edge, order-independent integer sums, one shared
``(num * x) // den`` damping formula. Floating-point PageRank is
summation-order-dependent (a distributed groupby adds in nondeterministic
order), so no float implementation can be bit-compared against a SQL
engine; the fixed-point contract makes every iteration bit-equal to the
unrolled DuckDB oracle on any cluster size. The float ``rank`` column is a
single deterministic ``rank_fp / scale`` conversion at the end.

Distributed shape — per iteration, TWO coarse range-keyed exchanges and
O(num_ranges) Python group kernels (NOT a hash join + a node-keyed
groupby: Ray 2.49's generic aggregate over millions of distinct keys is
~20x slower than a dense in-kernel reduce; same finding as the repo's
heatmap/sessionize kernels):

  scatter   union(edge rows, rank rows) -> groupby(range of src):
            the kernel holds its range's ranks as DENSE arrays (node ids
            are assumed 0..n_nodes-1 — the crawl-graph normal form after
            id assignment) and emits (dst, r // deg) contributions
  gather    union(contributions, static node-degree rows) -> groupby(range
            of dst): dense np.add.at reduce + the damping formula ->
            the next (node, deg, r) table, materialized (node-sized)

The dangling mass (rank parked on zero-out-degree nodes) is a one-scalar
map+sum over the node-sized rank table per iteration, redistributed
uniformly — the standard PageRank completion.

PARTITIONING ASSUMPTION (per the project brief): one range's dense rank
slice (8 bytes x n_nodes / num_ranges) must fit a worker heap — raise
``num_ranges`` with graph size. In-degree skew (the web's power law)
lands on the gather kernel as extra ROWS per range, not extra keys;
ranges are uniform in id space.

No counterpart in the reference repo (Sedona has no graph ops); the
operator comes from the north rule's Common-Crawl input shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _rid_of(ids: np.ndarray, n: int, nr: int) -> np.ndarray:
    return ids * nr // n


def _pagerank_dense(
    edges, iters, dnum, dden, scale, src_col, dst_col, node_col, N, base, r0,
    seed_ids=None,
):
    """Dense-vector mode: deg and rank live as int64 arrays (8N bytes),
    broadcast once per round; each round is one shuffle-free edges pass
    with per-task dense accumulators tree-merged via Dataset.aggregate.
    Integer arithmetic identical to the BSP path — bit-equal results."""
    import ray
    from ray.data.aggregate import AggregateFn

    edges_slim = edges.select_columns([src_col, dst_col]).materialize()

    def _cols(block):
        if isinstance(block, pa.Table):
            s = block[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d = block[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # pandas
            s = block[src_col].to_numpy().astype(np.int64)
            d = block[dst_col].to_numpy().astype(np.int64)
        return s, d

    def _vector_agg(accumulate_block, name):
        return AggregateFn(
            init=lambda k: np.zeros(N, dtype=np.int64),
            merge=lambda a, b: a + b,
            accumulate_block=accumulate_block,
            name=name,
        )

    def acc_deg(acc, block):
        s, _ = _cols(block)
        return acc + np.bincount(s, minlength=N).astype(np.int64)

    agg = edges_slim.aggregate(_vector_agg(acc_deg, "deg"))
    deg = agg["deg"] if agg else np.zeros(N, dtype=np.int64)
    dangling_nodes = deg == 0

    if seed_ids is None:
        r = np.full(N, r0, dtype=np.int64)
    else:
        S = len(seed_ids)
        r = np.zeros(N, dtype=np.int64)
        r[seed_ids] = scale // S
        base_vec = np.zeros(N, dtype=np.int64)
        base_vec[seed_ids] = ((dden - dnum) * (scale // S)) // dden
        seed_mask = np.zeros(N, dtype=np.int64)
        seed_mask[seed_ids] = 1
    for _ in range(iters):
        if seed_ids is not None:
            dang = int(r[dangling_nodes].sum())
            redist_vec = (dang // len(seed_ids)) * seed_mask
        else:
            redistribute = int(r[dangling_nodes].sum()) // N
        over_deg = np.zeros(N, dtype=np.int64)
        nz = deg > 0
        over_deg[nz] = r[nz] // deg[nz]
        ref = ray.put(over_deg)  # one broadcast per round, fetched per task

        def acc_contrib(acc, block, _ref=ref):
            s, d = _cols(block)
            od = ray.get(_ref)
            acc = acc.copy()
            np.add.at(acc, d, od[s])
            return acc

        agg = edges_slim.aggregate(_vector_agg(acc_contrib, "contrib"))
        contrib = agg["contrib"] if agg else np.zeros(N, dtype=np.int64)
        if seed_ids is None:
            r = base + (dnum * (contrib + redistribute)) // dden
        else:
            r = base_vec + (dnum * (contrib + redist_vec)) // dden

    out = pa.table(
        {
            node_col: pa.array(np.arange(N, dtype=np.int64)),
            "rank_fp": pa.array(r),
            "rank": pa.array(r.astype(np.float64) / float(scale)),
        }
    )
    return ray.data.from_arrow(out)


def pagerank(
    edges,
    nodes,
    *,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    num_partitions: int | None = None,
    n_nodes: int | None = None,
    mode: str = "auto",
    dense_max_nodes: int = 1 << 22,
    seeds=None,
):
    """Dataset(node, rank_fp:int64, rank:float64) after ``iters`` rounds.

    ``seeds``: optional Dataset(node) — PERSONALIZED PageRank (Haveliwala
    2002): the teleport distribution is uniform over the seed set instead
    of all nodes (seeds hold the base/restart mass and collect the
    dangling redistribution; non-seeds only receive propagated mass).
    Seed sets are small-side by contract (collected once, broadcast by
    closure); works in BOTH modes — in BSP the flag rides the degree rows
    through the gather exchange. Bit-equal across modes.

    ``edges``: Dataset(src, dst) int64 — multi-edges count multiply.
    ``nodes``: Dataset(node) int64 — the full node universe, ids in
    [0, n_nodes); isolated nodes hold base rank and collect the dangling
    redistribution.

    ``mode``: ``"dense"`` holds the rank vector as one int64 array
    (8 x n_nodes bytes) broadcast per round via ``ray.put`` — each round is
    ONE shuffle-free pass over the edges with per-task dense accumulators
    tree-merged through ``Dataset.aggregate`` (the heatmap dense-grid
    pattern; ~8x faster than the exchange plan at 2M nodes). ``"bsp"`` is
    the 100 TB path: node state stays sharded in the object store and each
    round runs the two range-keyed exchanges described in the module
    docstring. ``"auto"`` picks dense when ``n_nodes <= dense_max_nodes``.
    Both modes run the identical integer recurrence — results are
    bit-equal to each other and to the SQL oracle.
    """
    import ray

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_partitions = 4
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes <= 0:
        raise ValueError("pagerank needs a non-empty node set")
    R = int(num_partitions)
    N = int(n_nodes)

    base = ((damping_den - damping_num) * (scale // N)) // damping_den
    r0 = scale // N

    seed_ids = None
    if seeds is not None:
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
        if len(seed_ids) == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")

    if mode == "dense" or (mode == "auto" and N <= dense_max_nodes):
        return _pagerank_dense(
            edges, iters, damping_num, damping_den, scale, src_col, dst_col,
            node_col, N, base, r0, seed_ids=seed_ids,
        )

    def _span(rid: int) -> tuple[int, int]:
        """[lo, hi) of node ids whose rid == rid (rid = id * R // N)."""
        lo = -(-rid * N // R)  # ceil(rid * N / R)
        hi = -(-(rid + 1) * N // R)
        return lo, min(hi, N)

    # unified row shape for both exchanges: (rid, a, b, v)
    #   scatter: edge rows (rid(src), src, dst, 0) + rank rows (rid(node), node, -1, r)
    #   gather:  contrib rows (rid(dst), dst, -2, c) + degree rows (rid(node), node, deg, 0)
    def edge_rows(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "rid": pa.array(_rid_of(s, N, R)),
                "a": pa.array(s),
                "b": pa.array(d),
                "v": pa.array(np.zeros(len(s), dtype=np.int64)),
            }
        )

    edges_tagged = (
        edges.select_columns([src_col, dst_col])
        .map_batches(edge_rows, batch_format="pyarrow")
        .materialize()
    )

    # ---- static out-degree + seed ranks in ONE rid exchange -------------
    # (a generic groupby over n_nodes distinct keys is ~20x slower than a
    # dense per-range bincount — same rationale as the iteration kernels)
    def node_rows(t: pa.Table) -> pa.Table:
        ids = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = (
            np.isin(ids, seed_ids).astype(np.int64)
            if seed_ids is not None
            else np.zeros(len(ids), dtype=np.int64)
        )
        return pa.table(
            {
                "rid": pa.array(_rid_of(ids, N, R)),
                "a": pa.array(ids),
                "b": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "v": pa.array(sd),  # seed flag (personalized teleport)
            }
        )

    def deg_kernel(g: pa.Table) -> pa.Table:
        rid = int(g["rid"][0].as_py())
        lo, hi = _span(rid)
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = a[b >= 0]  # edge rows
        is_node = b == -1
        node_ids = a[is_node]  # this range's node universe
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg_dense = np.bincount(src - lo, minlength=hi - lo).astype(np.int64)
        return pa.table(
            {
                node_col: pa.array(node_ids),
                "deg": pa.array(deg_dense[node_ids - lo]),
                "seed": pa.array(v[is_node]),
            }
        )

    node_deg = (
        edges_tagged.union(nodes.map_batches(node_rows, batch_format="pyarrow"))
        .groupby("rid")
        .map_groups(deg_kernel, batch_format="pyarrow")
        .materialize()
    )

    def deg_rows(t: pa.Table) -> pa.Table:
        ids = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "rid": pa.array(_rid_of(ids, N, R)),
                "a": pa.array(ids),
                "b": t["deg"].cast(pa.int64()),
                "v": t["seed"].cast(pa.int64()),
            }
        )

    deg_tagged = node_deg.map_batches(deg_rows, batch_format="pyarrow").materialize()

    # ---- seed ranks: (node, deg, seed, r) -------------------------------
    n_seeds = len(seed_ids) if seed_ids is not None else 0

    def seed(t: pa.Table) -> pa.Table:
        if seed_ids is None:
            r_init = np.full(t.num_rows, r0, dtype=np.int64)
        else:
            sd = t["seed"].to_numpy(zero_copy_only=False).astype(np.int64)
            r_init = sd * (scale // n_seeds)
        return t.append_column("r", pa.array(r_init))

    ranks = node_deg.map_batches(seed, batch_format="pyarrow").materialize()

    def rank_rows(t: pa.Table) -> pa.Table:
        ids = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "rid": pa.array(_rid_of(ids, N, R)),
                "a": pa.array(ids),
                "b": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "v": t["r"].cast(pa.int64()),
            }
        )

    def scatter_kernel(g: pa.Table) -> pa.Table:
        rid = int(g["rid"][0].as_py())
        lo, hi = _span(rid)
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_rank = b == -1
        r_dense = np.zeros(hi - lo, dtype=np.int64)
        r_dense[a[is_rank] - lo] = v[is_rank]
        # degree via counting this range's edge rows per src (multi-edges
        # count multiply — identical to the Count aggregate)
        src = a[~is_rank]
        dst = b[~is_rank]
        if not len(src):
            return pa.table(
                {
                    "rid": pa.array([], type=pa.int64()),
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                }
            )
        deg_dense = np.bincount(src - lo, minlength=hi - lo).astype(np.int64)
        c = r_dense[src - lo] // deg_dense[src - lo]
        return pa.table(
            {
                "rid": pa.array(_rid_of(dst, N, R)),
                "a": pa.array(dst),
                "b": pa.array(np.full(len(dst), -2, dtype=np.int64)),
                "v": pa.array(c),
            }
        )

    for _ in range(iters):
        # dangling mass: one scalar over the node-sized rank table
        def dang_partial(t: pa.Table) -> pa.Table:
            d = t["deg"].to_numpy(zero_copy_only=False)
            r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"d": pa.array([int(r[d == 0].sum())], type=pa.int64())})

        dangling = int(
            ranks.map_batches(dang_partial, batch_format="pyarrow").sum("d") or 0
        )
        redistribute = dangling // (n_seeds if seed_ids is not None else N)

        contribs = (
            edges_tagged.union(
                ranks.map_batches(rank_rows, batch_format="pyarrow")
            )
            .groupby("rid")
            .map_groups(scatter_kernel, batch_format="pyarrow")
        )

        def gather_kernel(g: pa.Table, _redist=redistribute) -> pa.Table:
            rid = int(g["rid"][0].as_py())
            lo, hi = _span(rid)
            a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            is_c = b == -2
            s_dense = np.zeros(hi - lo, dtype=np.int64)
            np.add.at(s_dense, a[is_c] - lo, v[is_c])
            node_ids = a[~is_c]
            deg_vals = b[~is_c]
            sd = v[~is_c]  # deg rows carry the seed flag in v
            s = s_dense[node_ids - lo]
            if seed_ids is None:
                r_new = base + (damping_num * (s + _redist)) // damping_den
            else:
                base_s = ((damping_den - damping_num) * (scale // n_seeds)) // damping_den
                r_new = sd * base_s + (damping_num * (s + _redist * sd)) // damping_den
            return pa.table(
                {
                    node_col: pa.array(node_ids),
                    "deg": pa.array(deg_vals),
                    "seed": pa.array(sd),
                    "r": pa.array(r_new),
                }
            )

        ranks = (
            contribs.union(deg_tagged)
            .groupby("rid")
            .map_groups(gather_kernel, batch_format="pyarrow")
            .materialize()
        )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        r = t["r"].cast(pa.int64())
        return pa.table(
            {
                node_col: t[node_col],
                "rank_fp": r,
                "rank": pc.divide(r.cast(pa.float64()), pa.scalar(float(scale))),
            }
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")
