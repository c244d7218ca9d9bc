"""Distributed HITS hubs-and-authorities over a crawl/link graph
(Kleinberg 1999, "Authoritative sources in a hyperlinked environment") —
the second classic link-analysis fixed point after PageRank, and the one
that needs BOTH edge directions per round.

EXACT FIXED-POINT ARITHMETIC: hub and authority scores are int64
"nanoscores" (``scale`` = 10^9 per unit) and every step is integer-only.
The classic L2 normalization is irrational, so this implementation uses
an integer renormalization that any SQL engine reproduces bit-for-bit:

    a_raw[i] = sum of h[u] over edges u->i          (exact int64 sums)
    D_a      = max(sum(a_raw) // scale, 1)
    a[i]     = a_raw[i] // D_a                      (keeps a ~ scale)

and symmetrically for h from a. Renormalization by ANY consistent
positive scalar preserves the HITS principal-eigenvector iteration; the
floor-division form keeps every intermediate in int64 (a_raw is bounded
by in_degree x scale, the global sum by edges x scale — callers at
>10^9-edge scale should lower ``scale``; the default holds to ~9x10^9
edges). Floating-point HITS is summation-order-dependent, so no float
implementation can be bit-compared against a SQL oracle; this contract
makes every iteration bit-equal to the unrolled DuckDB CTE chain on any
cluster size. Float ``hub``/``authority`` columns are one deterministic
division at the end.

Modes mirror graph/pagerank.py: ``dense`` broadcasts the two int64
vectors per round (8N bytes each) and tree-merges per-task dense
accumulators — the single-box fast path under ``dense_max_nodes``.
``bsp`` is the 100 TB path: node state stays sharded in the object
store; setup compiles TWO static range topologies via graph/_topo.py
(src-keyed for the authority pass, dst-keyed for the hub pass — the
block-split all-to-all, no sort) and each half-round runs R scatter + R
gather raw tasks exchanging sparse int64 partials. Both modes run the
identical integer recurrence — results are bit-equal.

No counterpart in the reference repo (Sedona has no graph ops); the
operator comes from the north rule's Common-Crawl input shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hits(
    edges,
    nodes,
    *,
    iters: int = 5,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    num_partitions: int | None = None,
    n_nodes: int | None = None,
    mode: str = "auto",
    dense_max_nodes: int = 1 << 22,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
):
    """Dataset(node, hub_fp:int64, auth_fp:int64, hub:float64,
    authority:float64) after ``iters`` full (authority + hub) rounds.

    ``edges``: Dataset(src, dst) int64 — multi-edges count multiply.
    ``nodes``: Dataset(node) int64 — full node universe, ids in
    [0, n_nodes); nodes with no in-edges get authority 0, no out-edges
    hub 0 (isolated nodes both 0 after the first round).

    ``mode``: ``"dense"`` / ``"bsp"`` / ``"auto"`` (dense when
    ``n_nodes <= dense_max_nodes``) — see module docstring.

    ``checkpoint_dir`` / ``checkpoint_every`` (BSP mode): persist the
    (h, a) slices + renormalization denominators every k full rounds via
    graph/_ckpt.py; a rerun resumes from the last complete checkpoint,
    bit-equal to an uninterrupted run (fingerprint mismatch starts
    fresh, like pagerank). On multi-node clusters the directory MUST be
    a shared mount (slices are written by worker tasks, META by the
    driver) — validated up front via ``_ckpt.validate_shared_dir``.
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
        raise ValueError("hits needs a non-empty node set")
    if iters < 1:
        raise ValueError("hits needs iters >= 1")
    N = int(n_nodes)
    R = max(1, min(int(num_partitions), N))

    if mode == "dense" or (mode == "auto" and N <= dense_max_nodes):
        return _hits_dense(edges, iters, scale, src_col, dst_col, node_col, N)
    return _hits_bsp(
        edges, iters, scale, src_col, dst_col, node_col, N, R,
        ckpt_dir=checkpoint_dir, ckpt_every=int(checkpoint_every),
    )


def _result_table(node_col, lo, hi, h, a, scale):
    return pa.table(
        {
            node_col: pa.array(np.arange(lo, hi, dtype=np.int64)),
            "hub_fp": pa.array(h),
            "auth_fp": pa.array(a),
            "hub": pa.array(h.astype(np.float64) / float(scale)),
            "authority": pa.array(a.astype(np.float64) / float(scale)),
        }
    )


def _hits_dense(edges, iters, scale, src_col, dst_col, node_col, N):
    """Dense-vector mode: h and a live as int64 arrays (8N bytes each),
    broadcast once per half-round; each half-round is one shuffle-free
    edges pass with per-task dense accumulators tree-merged via
    Dataset.aggregate (the pagerank-dense pattern)."""
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

    def _pass(vec, gather_from, add_to):
        """One edges pass: raw[add_to] += vec[gather_from] (dense)."""
        ref = ray.put(vec)  # one broadcast per half-round

        def acc(acc_v, block, _ref=ref):
            s, d = _cols(block)
            src_idx, dst_idx = (s, d) if gather_from == "src" else (d, s)
            v = ray.get(_ref)
            acc_v = acc_v.copy()
            np.add.at(acc_v, dst_idx, v[src_idx])
            return acc_v

        agg = edges_slim.aggregate(
            AggregateFn(
                init=lambda k: np.zeros(N, dtype=np.int64),
                merge=lambda x, y: x + y,
                accumulate_block=acc,
                name="raw",
            )
        )
        return agg["raw"] if agg else np.zeros(N, dtype=np.int64)

    h = np.full(N, scale, dtype=np.int64)
    a = np.zeros(N, dtype=np.int64)
    for _ in range(iters):
        a_raw = _pass(h, "src", "dst")
        a = a_raw // max(int(a_raw.sum()) // scale, 1)
        h_raw = _pass(a, "dst", "src")
        h = h_raw // max(int(h_raw.sum()) // scale, 1)

    return ray.data.from_arrow(_result_table(node_col, 0, N, h, a, scale))


def _hits_bsp(edges, iters, scale, src_col, dst_col, node_col, N, R, ckpt_dir=None, ckpt_every=0):
    """BSP mode: two static compiled topologies (graph/_topo.py), one per
    edge direction; each half-round runs R scatter tasks (fancy gather
    through the precompiled permutation + reduceat partials, R^2 small
    objects) and R gather tasks (dense slice sum + renormalization). The
    renormalization scalar is the only driver-side value per half-round
    (R int64 partial sums). Node/edge data never passes through the
    driver. Bit-equal to the dense path."""
    import ray

    from incubator_sedona_ray.graph._topo import build_range_topos, make_spans

    spans = make_spans(N, R)
    fwd = build_range_topos(edges, src_col, dst_col, N, R, spans)  # auth pass
    rev = build_range_topos(edges, dst_col, src_col, N, R, spans)  # hub pass

    @ray.remote
    def _init_slice(lo, hi):
        return np.full(hi - lo, scale, dtype=np.int64)

    @ray.remote
    def _scatter(tp, vec, denom):
        """vec is the raw slice from the previous half-round; the lazy
        renormalization (vec // denom) happens here so the division rides
        an existing pass. Emits R sparse (idx, sum) partials."""
        if tp is None:
            return [None] * R if R > 1 else None
        key_perm, cuts, segs = tp
        v = vec // denom if denom != 1 else vec
        c = v[key_perm]
        out = []
        for r2 in range(R):
            seg = segs[r2]
            if seg is None:
                out.append(None)
                continue
            idx, starts = seg
            out.append((idx, np.add.reduceat(c[cuts[r2] : cuts[r2 + 1]], starts)))
        return out if R > 1 else out[0]

    @ray.remote(num_returns=2)
    def _gather(lo, hi, partials):
        s = np.zeros(hi - lo, dtype=np.int64)
        for p in ray.get(partials):
            if p is not None:
                idx, sums = p
                s[idx] += sums
        return s, int(s.sum())

    def _half_round(topos, vec_refs, denom):
        partials = [
            _scatter.options(num_returns=R).remote(topos[rid], vec_refs[rid], denom)
            for rid in range(R)
        ]
        if R == 1:
            partials = [[partials[0]]]
        raw, sums = [], []
        for rid, (lo, hi) in enumerate(spans):
            r_, s_ = _gather.remote(lo, hi, [partials[s][rid] for s in range(R)])
            raw.append(r_)
            sums.append(s_)
        denom_next = max(sum(ray.get(sums)) // scale, 1)  # BSP barrier: R ints
        return raw, denom_next

    h = [_init_slice.remote(lo, hi) for lo, hi in spans]
    h_den = 1
    a, a_den = [], 1

    # mid-job checkpoint/resume (graph/_ckpt.py) — raw slices + the two
    # renormalization denominators (META extras)
    from ._ckpt import read_meta, slice_reader, slice_writer, validate_shared_dir, write_meta

    if ckpt_dir:
        validate_shared_dir(ckpt_dir)  # multi-node: ckpt_dir must be a shared mount
    meta_want = {"kind": "hits_bsp", "N": N, "R": R, "scale": scale}
    start_iter = 0
    if ckpt_dir:
        done, extras = read_meta(ckpt_dir, meta_want)
        if 0 < done <= iters:
            _read = slice_reader()
            h = [_read.remote(ckpt_dir, "h_fp", rid) for rid in range(R)]
            a = [_read.remote(ckpt_dir, "a_fp", rid) for rid in range(R)]
            h_den = int(extras["h_den"])
            a_den = int(extras["a_den"])
            start_iter = done

    def _ckpt(it_done: int):
        _write = slice_writer()
        ray.get(
            [_write.remote(ckpt_dir, "h_fp", rid, h[rid]) for rid in range(R)]
            + [_write.remote(ckpt_dir, "a_fp", rid, a[rid]) for rid in range(R)]
        )
        write_meta(ckpt_dir, meta_want, it_done, extras={"h_den": h_den, "a_den": a_den})

    for it in range(start_iter, iters):
        a, a_den = _half_round(fwd, h, h_den)
        h, h_den = _half_round(rev, a, a_den)
        if ckpt_dir and ckpt_every and (it + 1) % ckpt_every == 0 and (it + 1) < iters:
            _ckpt(it + 1)

    @ray.remote
    def _to_arrow(lo, hi, h_slice, a_slice):
        return _result_table(node_col, lo, hi, h_slice // h_den, a_slice // a_den, scale)

    return ray.data.from_arrow_refs(
        [_to_arrow.remote(lo, hi, h[rid], a[rid]) for rid, (lo, hi) in enumerate(spans)]
    )
