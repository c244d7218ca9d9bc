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

Distributed shape (BSP mode) — Pregel-style static edge partitioning
(Malewicz et al. 2010): one raw-task block-split all-to-all co-locates
the edge table by src range at setup and compiles it into a per-range
CSR-like layout (node ids are assumed 0..n_nodes-1 — the crawl-graph
normal form after id assignment); each superstep then runs 2R raw Ray
tasks exchanging only SPARSE rank-contribution partials (R^2 small
objects), never the edges. Re-shuffling the static edge table through a
sorted groupby every round — the first-cut design — measured ~100x the
kernel cost at 30M edges; see ``_pagerank_bsp`` for the task protocol.

The dangling mass (rank parked on zero-out-degree nodes) is computed as
per-range int64 partials riding the gather tasks' second return value,
redistributed uniformly next round — the standard PageRank completion.

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
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
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

    ``checkpoint_dir`` / ``checkpoint_every`` (BSP mode): persist every
    range's rank slice + a META fingerprint after every k iterations; a
    rerun pointing at the same directory resumes from the last complete
    checkpoint (crash-safe: META is written last, atomically) and is
    bit-equal to an uninterrupted run. A changed graph/damping/seed
    fingerprint ignores the checkpoint and starts fresh. On multi-node
    clusters the directory MUST be a shared mount (slices are written by
    worker tasks, META by the driver) — validated up front via
    ``_ckpt.validate_shared_dir``.
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
    N = int(n_nodes)
    R = max(1, min(int(num_partitions), N))

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

    return _pagerank_bsp(
        edges, iters, damping_num, damping_den, scale, src_col, dst_col,
        node_col, N, R, base, r0, seed_ids=seed_ids,
        ckpt_dir=checkpoint_dir, ckpt_every=int(checkpoint_every),
    )


def _pagerank_bsp(
    edges, iters, dnum, dden, scale, src_col, dst_col, node_col, N, R,
    base, r0, seed_ids=None, ckpt_dir=None, ckpt_every=0,
):
    """BSP mode, Pregel-style (Malewicz et al. 2010 / GraphX's static edge
    partitioning): the edge table is range-partitioned by src ONCE — one
    raw-task block-split all-to-all (B blocks x R ranges of small chunk
    objects, no sort) — and never moves again. Each superstep runs 2R raw
    Ray tasks over object-store-resident state:

      topo[r]     (setup, once) compiles the range's edges into a CSR-like
                  layout sorted by (dst range, dst): a src permutation, the
                  R destination segment cuts, and per destination range the
                  unique local dst indices + reduceat segment starts. Every
                  per-round sort/unique is hoisted here — rounds touch only
                  round-variant data.
      scatter[r]  computes c = rank // deg per edge through the precompiled
                  permutation (one fancy gather + one integer divide) and
                  emits a sparse (dst_local_idx, sum) int64 partial per
                  destination range via ``np.add.reduceat`` — ``num_returns
                  =R`` makes each partial its own object, so gather[r']
                  fetches exactly the R partials addressed to it (the
                  all-to-all is R^2 small objects, not a sorted shuffle of
                  the edge table).
      gather[r']  sums its partials into the range's dense rank slice,
                  applies the damping formula, and returns (new rank slice,
                  next round's dangling partial).

    The driver holds only ObjectRefs (R topo + R static + R rank + R^2
    partials) and per round ray.gets R int64 dangling partials — node/edge
    DATA never passes through it. Static per-range state (deg, seed mask,
    topology) is stored ONCE; only the rank slice round-trips per
    iteration. Rationale: Ray Data's groupby re-sorts the STATIC edge
    table every iteration (measured 100 s/round at 30M edges where these
    kernels need ~1 s); iterative fixed-topology exchange is exactly the
    case the project brief reserves for raw tasks.

    Integer arithmetic identical to the dense path — results bit-equal
    (``np.add.reduceat`` on int64 is an exact integer sum).

    PARTITIONING ASSUMPTION: one range's dense slices plus its compiled
    edge topology (~24 bytes x edges / R) must fit a worker heap — size R
    by graph, not by cluster (the bench pins it for the scaling protocol
    for the same reason). Skew lands as extra edge rows per range, never
    extra keys.
    """
    import ray

    from incubator_sedona_ray.graph._topo import build_range_topos, make_spans

    spans = make_spans(N, R)

    # ---- setup: range-partition + compile the static edge table by src
    # (raw-task block split, no sort — see graph/_topo.py) ----
    topo = build_range_topos(edges, src_col, dst_col, N, R, spans)

    n_seeds = len(seed_ids) if seed_ids is not None else 0
    seed_arr = seed_ids if seed_ids is not None else np.empty(0, dtype=np.int64)

    @ray.remote(num_returns=3)
    def _init_state(lo, hi, tp, seed_a):
        """(static (deg, seed mask), rank0 slice, dangling partial) —
        static never round-trips again; only the rank slice does."""
        deg = np.zeros(hi - lo, dtype=np.int64)
        if tp is not None:
            deg = np.bincount(tp[0], minlength=hi - lo).astype(np.int64)
        seedm = np.zeros(hi - lo, dtype=np.int64)
        if n_seeds:
            inr = seed_a[(seed_a >= lo) & (seed_a < hi)]
            seedm[inr - lo] = 1
            r = seedm * (scale // n_seeds)
        else:
            r = np.full(hi - lo, r0, dtype=np.int64)
        return (deg, seedm), r, int(r[deg == 0].sum())

    static, rank, dang_parts = [], [], []
    for rid, (lo, hi) in enumerate(spans):
        st, r_, dg = _init_state.remote(lo, hi, topo[rid], seed_arr)
        static.append(st)
        rank.append(r_)
        dang_parts.append(dg)

    @ray.remote
    def _scatter(tp, st, r):
        """R sparse partials (dst_local_idx, contrib_sum) — one per
        destination range, each its own return object. All args are
        top-level ObjectRefs -> auto-dereferenced by Ray."""
        if tp is None:
            return [None] * R if R > 1 else None
        src_perm, cuts, segs = tp
        deg, _ = st
        c = r[src_perm] // deg[src_perm]  # deg >= 1 wherever src has an edge
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
    def _gather(lo, hi, st, partials, redistribute):
        deg, seedm = st  # auto-dereferenced
        s = np.zeros(hi - lo, dtype=np.int64)
        for p in ray.get(partials):
            if p is not None:
                idx, sums = p
                s[idx] += sums
        if n_seeds:
            base_s = ((dden - dnum) * (scale // n_seeds)) // dden
            r_new = seedm * base_s + (dnum * (s + redistribute * seedm)) // dden
        else:
            r_new = base + (dnum * (s + redistribute)) // dden
        return r_new, int(r_new[deg == 0].sum())

    # ---- mid-job checkpoint/resume (graph/_ckpt.py): one parquet per
    # range + atomic META fingerprint; fingerprint covers the recurrence
    # parameters but NOT the iteration target (extending/resuming longer
    # runs is the use case) ----
    from ._ckpt import read_meta, slice_reader, slice_writer, validate_shared_dir, write_meta

    if ckpt_dir:
        validate_shared_dir(ckpt_dir)  # multi-node: ckpt_dir must be a shared mount
    meta_want = {
        "kind": "pagerank_bsp", "N": N, "R": R, "scale": scale,
        "dnum": dnum, "dden": dden,
        "seeds_fp": (
            __import__("hashlib").sha256(seed_arr.tobytes()).hexdigest()[:16]
            if n_seeds
            else None
        ),
        "n_seeds": n_seeds,
    }
    start_iter = 0
    if ckpt_dir:
        done, _extras = read_meta(ckpt_dir, meta_want)
        if 0 < done <= iters:
            _read = slice_reader()

            @ray.remote
            def _dang(st, r):
                deg, _ = st
                return int(r[deg == 0].sum())

            rank = [_read.remote(ckpt_dir, "rank_fp", rid) for rid in range(R)]
            dang_parts = [_dang.remote(static[rid], rank[rid]) for rid in range(R)]
            start_iter = done

    def _ckpt(it_done: int):
        _write = slice_writer()
        ray.get([_write.remote(ckpt_dir, "rank_fp", rid, rank[rid]) for rid in range(R)])
        write_meta(ckpt_dir, meta_want, it_done)

    for it in range(start_iter, iters):
        dangling = sum(ray.get(dang_parts))  # BSP barrier: R small ints
        redistribute = dangling // (n_seeds if n_seeds else N)
        partials = [
            _scatter.options(num_returns=R).remote(topo[rid], static[rid], rank[rid])
            for rid in range(R)
        ]
        if R == 1:
            partials = [[partials[0]]]
        nxt_rank, nxt_dang = [], []
        for rid, (lo, hi) in enumerate(spans):
            r_, dg = _gather.remote(lo, hi, static[rid], [partials[s][rid] for s in range(R)], redistribute)
            nxt_rank.append(r_)
            nxt_dang.append(dg)
        rank, dang_parts = nxt_rank, nxt_dang
        if ckpt_dir and ckpt_every and (it + 1) % ckpt_every == 0 and (it + 1) < iters:
            _ckpt(it + 1)

    @ray.remote
    def _to_arrow(lo, hi, r):
        return pa.table(
            {
                node_col: pa.array(np.arange(lo, hi, dtype=np.int64)),
                "rank_fp": pa.array(r),
                "rank": pa.array(r.astype(np.float64) / float(scale)),
            }
        )

    return ray.data.from_arrow_refs([_to_arrow.remote(lo, hi, rank[rid]) for rid, (lo, hi) in enumerate(spans)])
