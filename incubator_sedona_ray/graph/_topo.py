"""Shared Pregel-style range-topology compiler for iterative graph ops.

One raw-task block-split all-to-all co-locates an edge table by the KEY
column's id range and compiles each range's edges into a CSR-like layout
(key-local permutation + per-destination-range reduceat segments). Built
once per run; supersteps then exchange only sparse int64 partials —
never the edges. PageRank uses one topology (keyed by src); HITS uses
two (src-keyed for the authority pass, dst-keyed for the hub pass).

Node ids are assumed 0..n_nodes-1 (the crawl-graph normal form after id
assignment). PARTITIONING ASSUMPTION: one range's compiled topology
(~16-24 bytes x edges / R) must fit a worker heap — size R by graph, not
by cluster. Skew lands as extra edge rows per range, never extra keys.

No counterpart in the reference repo (Sedona has no graph ops); the
machinery serves the north rule's Common-Crawl link-graph shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rid_of(ids: np.ndarray, n: int, nr: int) -> np.ndarray:
    return ids * nr // n


def make_spans(N: int, R: int) -> list[tuple[int, int]]:
    """R contiguous [lo, hi) id ranges covering [0, N)."""
    spans = []
    for rid in range(R):
        lo = -(-rid * N // R)  # ceil(rid * N / R)
        hi = min(-(-(rid + 1) * N // R), N)
        spans.append((lo, hi))
    return spans


def build_range_topos(edges, key_col: str, other_col: str, N: int, R: int, spans):
    """list[ObjectRef] of per-range compiled topologies, keyed by
    ``key_col`` range: topo[rid] = (key_perm, cuts, segs) — edges of the
    range sorted by (other-range, other id); segs[r2] = (local unique
    other-ids, reduceat starts) or None. A scatter pass is then one fancy
    gather through key_perm + one ``np.add.reduceat`` per segment (exact
    int64 sums) — every per-round sort/unique is hoisted here.

    The setup exchange is a raw-task block split, NOT a groupby: a sorted
    shuffle of the edge table measured ~5x this split's cost on 60M edges
    and was the phase that refused to scale with workers. Each edge block
    splits into R per-range (key, other) chunks (``num_returns=R`` ->
    each chunk its own object); each topo builder fetches exactly the B
    chunks addressed to its range — B x R small objects, fully parallel
    at both ends, no global sort.
    """
    import ray

    edge_blocks = edges.select_columns([key_col, other_col]).materialize()

    @ray.remote
    def _split(block: pa.Table):
        if block.num_rows == 0 or key_col not in block.column_names:
            return [None] * R if R > 1 else None
        k = block[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        o = block[other_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rid = rid_of(k, N, R)
        order = np.argsort(rid, kind="stable")
        k, o = k[order], o[order]
        cuts = np.searchsorted(rid[order], np.arange(R + 1))
        out = [
            (k[a:b], o[a:b]) if a != b else None
            for a, b in zip(cuts[:-1], cuts[1:])
        ]
        return out if R > 1 else out[0]

    block_refs = []
    for bundle in edge_blocks.iter_internal_ref_bundles():
        block_refs.extend(list(bundle.block_refs))
    chunk_refs = [_split.options(num_returns=R).remote(br) for br in block_refs]
    if R == 1:
        chunk_refs = [[c] for c in chunk_refs]

    @ray.remote
    def _build_topo(lo, chunks):
        chunks = [c for c in ray.get(chunks) if c is not None]  # list of refs
        if not chunks:
            return None
        key_local = np.concatenate([c[0] for c in chunks]) - lo
        oth = np.concatenate([c[1] for c in chunks])
        rid_o = rid_of(oth, N, R)
        order = np.lexsort((oth, rid_o))
        # int32 index arrays where ranges allow (always, until a single
        # range holds >2^31 nodes/edges) — halves the per-round topology
        # gather traffic and the sparse-partial index bytes
        ix = np.int32 if len(oth) < 2**31 and N // R + 1 < 2**31 else np.int64
        key_perm = key_local[order].astype(ix)
        oth_s = oth[order]
        cuts = np.searchsorted(rid_o[order], np.arange(R + 1))
        segs = []
        for r2 in range(R):
            a, b = int(cuts[r2]), int(cuts[r2 + 1])
            if a == b:
                segs.append(None)
                continue
            d = oth_s[a:b]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]]).astype(ix)
            segs.append(((d[starts] - spans[r2][0]).astype(ix), starts))
        return key_perm, cuts, segs

    topos = [
        _build_topo.remote(spans[rid][0], [chunk_refs[b][rid] for b in range(len(chunk_refs))])
        for rid in range(R)
    ]
    return topos
