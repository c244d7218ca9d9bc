"""Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

The 100 TB memory story for similarity search: a 64-dim float32 embedding
(256 B) compresses to ``m`` one-byte codes (e.g. 8 B at m=8) — the corpus
codes fit in RAM/object store at scales where raw vectors cannot. Queries
score against codes with an asymmetric-distance lookup table (LUT): one
(m x 256) table of partial squared distances per query, then a per-row
gather+sum — no decompression.

Ray composition:

* ``pq_fit``: split dims into ``m`` subspaces; train one 256-centroid
  codebook per subspace with the distributed :mod:`.kmeans` (broadcast
  Lloyd rounds — the data never leaves the cluster). Deterministic.
* ``pq_encode``: streaming ``map_batches`` — argmin against each
  subspace codebook, emit ``m`` uint8 codes packed as a binary column.
* ``pq_topk``: broadcast the query LUTs, per-batch gather+sum partial
  top-k (mergeable), tiny per-query finalize — same shape as
  :mod:`.brute` but over codes.

Exactness: PQ is approximate (quantization error); recall is pinned by
tests against the brute-force result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..partition.assign import broadcast_map_batches
from .kmeans import _batch_matrix, kmeans_fit


def pq_fit(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 256,
    iters: int = 5,
) -> np.ndarray:
    """Train per-subspace codebooks; returns (m, n_codes, dim//m) float64.

    Each subspace's codebook is a distributed k-means fit over a PROJECTED
    view of the dataset (a slim map selecting that dim slice) — m fits,
    each a handful of broadcast+partial-sum passes."""
    probe = ds.take_batch(1, batch_format="pyarrow")
    dim = _batch_matrix(probe[vec_col]).shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        lo = j * sub

        def project(batch: pa.Table, lo=lo) -> pa.Table:
            mat = _batch_matrix(batch[vec_col])[:, lo : lo + sub]
            offs = np.arange(0, (mat.shape[0] + 1) * sub, sub, dtype=np.int64)
            return pa.table(
                {
                    id_col: batch[id_col],
                    vec_col: pa.LargeListArray.from_arrays(
                        pa.array(offs, type=pa.int64()),
                        pa.array(mat.reshape(-1), type=pa.float64()),
                    ),
                }
            )

        view = ds.map_batches(project, batch_format="pyarrow")
        books[j] = kmeans_fit(view, n_codes, vec_col=vec_col, id_col=id_col, iters=iters)
    return books


def pq_encode(ds, codebooks: np.ndarray, *, vec_col: str = "embedding", out_col: str = "pq_code"):
    """Streaming encode: adds ``out_col`` (binary, m uint8 codes per row);
    drops the raw vector column (that is the point)."""
    m, n_codes, sub = codebooks.shape

    def encode(batch: pa.Table, books: np.ndarray) -> pa.Table:
        mat = _batch_matrix(batch[vec_col])
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.uint8)
        if n:
            for j in range(m):
                x = mat[:, j * sub : (j + 1) * sub]
                c = books[j]
                d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        keep = [name for name in batch.column_names if name != vec_col]
        out = batch.select(keep)
        return out.append_column(out_col, pa.array([codes[i].tobytes() for i in range(n)], type=pa.binary()))

    return broadcast_map_batches(ds, encode, {"books": codebooks})


def pq_topk(
    encoded,
    queries: pd.DataFrame,
    codebooks: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id: str = "query_id",
    qvec_col: str = "qvec",
    rerank_ds=None,
    rerank_vec_col: str = "embedding",
    expand: int = 5,
):
    """Asymmetric-distance top-k over PQ codes.

    Per query: LUT[j, c] = ||q_j - codebook[j, c]||^2 (computed once,
    broadcast); per batch: distance = sum_j LUT[j, code_j] via one fancy
    gather, mergeable local top-k, per-query finalize. Returns a Dataset
    (query_id, id, adist, rank) sorted by approximate distance.

    With ``rerank_ds`` (the raw-vector table) the standard two-stage
    search runs: retrieve a ``k * expand`` shortlist by code distance,
    hash-join the shortlist ids back to their raw vectors, score EXACT
    squared L2, and keep the true top-k (column ``dist`` replaces
    ``adist``). The shortlist is nq*k*expand rows — the only thing the
    rerank join moves."""
    m, n_codes, sub = codebooks.shape
    if rerank_ds is not None:
        short = pq_topk(
            encoded,
            queries,
            codebooks,
            k=k * expand,
            id_col=id_col,
            code_col=code_col,
            query_id=query_id,
            qvec_col=qvec_col,
        )
        return _exact_rerank(
            short, rerank_ds, queries, k=k, id_col=id_col, query_id=query_id,
            qvec_col=qvec_col, vec_col=rerank_vec_col,
        )
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in queries[qvec_col]])
    nq = len(qm)
    luts = np.empty((nq, m, n_codes))
    for j in range(m):
        x = qm[:, j * sub : (j + 1) * sub]
        c = codebooks[j]
        luts[:, j, :] = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
    qids = queries[query_id].to_numpy()

    def local_topk(batch: pa.Table, q_luts: np.ndarray, q_ids: np.ndarray) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    query_id: pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "adist": pa.array([], type=pa.float64()),
                }
            )
        codes = np.frombuffer(b"".join(batch[code_col].to_pylist()), dtype=np.uint8).reshape(n, m)
        out_q, out_i, out_d = [], [], []
        cols = np.arange(m)
        for qi in range(len(q_luts)):
            d = q_luts[qi][cols[None, :], codes].sum(axis=1)
            kk = min(k, n)
            # keep ties at the k-th distance so the global (dist, id) sort
            # sees every candidate
            kth = np.partition(d, kk - 1)[kk - 1]
            sel = np.flatnonzero(d <= kth)
            out_q.append(np.full(len(sel), q_ids[qi], dtype=np.int64))
            out_i.append(ids[sel].astype(np.int64))
            out_d.append(d[sel])
        return pa.table(
            {
                query_id: pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "adist": pa.array(np.concatenate(out_d), type=pa.float64()),
            }
        )

    cand = broadcast_map_batches(encoded, local_topk, {"q_luts": luts, "q_ids": qids})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adist", id_col], ascending=[True, True], kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby(query_id).map_groups(finalize, batch_format="pandas")


def _exact_rerank(shortlist, raw_ds, queries, *, k, id_col, query_id, qvec_col, vec_col):
    """No join needed: the shortlist is nq*k*expand (query, id) pairs —
    SMALL by construction — so broadcast it and score exactly in one
    streaming pass over the raw table (rows outside the shortlist emit
    nothing; a shortlisted row emits one scored row per query listing it).
    This also keeps tensor-extension vector columns out of any shuffle
    (Acero rejects them as join payload)."""
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in queries[qvec_col]])
    qids = queries[query_id].to_numpy().astype(np.int64)
    qrow_of = {int(q): i for i, q in enumerate(qids)}

    pairs = shortlist.map_batches(
        lambda t: t.select([query_id, id_col]), batch_format="pyarrow"
    ).to_pandas()
    sid = pairs[id_col].to_numpy().astype(np.int64)
    sq = np.array([qrow_of[int(q)] for q in pairs[query_id]], dtype=np.int64)
    order = np.argsort(sid, kind="mergesort")
    sid, sq = sid[order], sq[order]

    def exact(batch: pa.Table, s_id: np.ndarray, s_q: np.ndarray, q_m: np.ndarray, q_ids: np.ndarray) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(s_id, ids, side="left")
        hi = np.searchsorted(s_id, ids, side="right")
        counts = hi - lo
        rows = np.flatnonzero(counts)
        if len(rows) == 0:
            return pa.table(
                {
                    query_id: pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        mat = _batch_matrix(batch[vec_col])
        span_idx = np.concatenate([np.arange(lo[r], hi[r]) for r in rows])
        src_row = np.repeat(rows, counts[rows])
        qrow = s_q[span_idx]
        d = ((mat[src_row] - q_m[qrow]) ** 2).sum(axis=1)
        return pa.table(
            {
                query_id: pa.array(q_ids[qrow].astype(np.int64)),
                id_col: pa.array(ids[src_row]),
                "dist": pa.array(d, type=pa.float64()),
            }
        )

    scored = broadcast_map_batches(
        raw_ds, exact, {"s_id": sid, "s_q": sq, "q_m": qm, "q_ids": qids}
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", id_col], ascending=[True, True], kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby(query_id).map_groups(finalize, batch_format="pandas")
