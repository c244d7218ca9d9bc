"""Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

The 100 TB memory story for similarity search: a 64-dim float32 embedding
(256 B) compresses to ``m`` one-byte codes (e.g. 8 B at m=8) — the corpus
codes fit in RAM/object store at scales where raw vectors cannot. Queries
score against codes with an asymmetric-distance lookup table (LUT): one
(m x 256) table of partial squared distances per query, then a per-row
gather+sum — no decompression.

Ray composition:

* ``pq_fit``: split dims into ``m`` subspaces; train all ``m``
  256-centroid codebooks in ONE combined distributed Lloyd loop (one
  broadcast + one streaming partial-sum pass per iteration covers every
  subspace — the data never leaves the cluster). Deterministic.
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
from .kmeans import _batch_matrix


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

    All ``m`` subspace k-means run SIMULTANEOUSLY: one streaming
    partial-sum pass per Lloyd iteration covers every subspace (the
    alternative — m independent fits — would scan the data m*iters times;
    at corpus scale the scan dominates, so one pass per iteration is the
    only sane plan). Init is deterministic: the n_codes smallest-id rows
    seed every subspace (mergeable per-block top-n, same as kmeans_fit)."""
    def local_min_ids(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = np.argsort(ids, kind="mergesort")[:n_codes]
        return batch.select([id_col, vec_col]).take(sel)

    seed_rows = (
        ds.map_batches(local_min_ids, batch_format="pyarrow").to_pandas().sort_values(id_col).head(n_codes)
    )
    if len(seed_rows) < n_codes:
        raise ValueError(f"n_codes={n_codes} but only {len(seed_rows)} rows available")
    seed = np.stack([np.asarray(v, dtype=np.float64) for v in seed_rows[vec_col]])
    dim = seed.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = seed.reshape(n_codes, m, sub).transpose(1, 0, 2).copy()  # (m, n_codes, sub)

    for _ in range(iters):

        def partial(batch: pa.Table, b: np.ndarray) -> pa.Table:
            mat = _batch_matrix(batch[vec_col])
            n = mat.shape[0]
            if n == 0:
                return pa.table(
                    {
                        "sub_j": pa.array([], type=pa.int64()),
                        "cluster": pa.array([], type=pa.int64()),
                        "count": pa.array([], type=pa.int64()),
                        "vecsum": pa.array([], type=pa.binary()),
                    }
                )
            out_j, out_c, out_n, out_s = [], [], [], []
            for j in range(len(b)):
                x = mat[:, j * sub : (j + 1) * sub]
                c = b[j]
                d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
                assign = np.argmin(d2, axis=1)
                sums = np.zeros_like(c)
                np.add.at(sums, assign, x)
                counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
                live = np.flatnonzero(counts)
                out_j.append(np.full(len(live), j, dtype=np.int64))
                out_c.append(live.astype(np.int64))
                out_n.append(counts[live])
                out_s.extend(sums[i].tobytes() for i in live)
            return pa.table(
                {
                    "sub_j": pa.array(np.concatenate(out_j)),
                    "cluster": pa.array(np.concatenate(out_c)),
                    "count": pa.array(np.concatenate(out_n)),
                    "vecsum": pa.array(out_s, type=pa.binary()),
                }
            )

        parts = broadcast_map_batches(ds, partial, {"b": books}).to_pandas()
        new_books = books.copy()
        if len(parts):
            total = np.zeros_like(books)
            n_tot = np.zeros((m, n_codes), dtype=np.int64)
            for j, cl, cnt, blob in zip(parts["sub_j"], parts["cluster"], parts["count"], parts["vecsum"]):
                total[int(j), int(cl)] += np.frombuffer(blob, dtype=np.float64)
                n_tot[int(j), int(cl)] += int(cnt)
            live = n_tot > 0
            new_books[live] = total[live] / n_tot[live][:, None]
        books = new_books
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
        # one buffer, no per-row Python: n contiguous m-byte code words
        fixed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
        )
        return out.append_column(out_col, fixed.cast(pa.binary()))

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
