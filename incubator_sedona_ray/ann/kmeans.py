"""Distributed k-means over an embedding column (Lloyd's algorithm).

The training-data use case: semantic bucketing / diversity sampling —
cluster the corpus embeddings, then sample per cluster (or drop
over-represented clusters) before training. Not in the reference (it has
no vector ops at all); first-class extension alongside the ANN and
embedding-dedup modules.

Scale design: the DATA never leaves the cluster —

* init: the k rows with the smallest ids (deterministic), found with the
  mergeable per-block top-k pattern (only ``k`` rows per block reach the
  driver);
* each Lloyd iteration is ONE broadcast (``ray.put`` of the (k x dim)
  centroid matrix, read per task) + ONE streaming ``map_batches`` pass
  emitting per-batch partial sums (k rows per batch, vectors packed as
  float64 bytes); the driver only ever combines (k x blocks) partials —
  the centroid matrix IS the model state and belongs on the driver;
* assignment is a stateless vectorized ``map_batches`` (blocked matmul,
  argmin of squared L2).

Empty clusters keep their previous centroid (standard Lloyd handling).
Everything is deterministic for a fixed input: ties in argmin break to the
lowest cluster id (numpy argmin semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..partition.assign import broadcast_map_batches


def _batch_matrix(col: "pa.ChunkedArray") -> np.ndarray:
    """(n, dim) float64 matrix from an embedding column — handles
    list<float> / large_list (offset-flatten, no per-row Python),
    fixed_size_list, and Ray's tensor extension arrays."""
    arr = col.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0))
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)):
        offs = arr.offsets.to_numpy()
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        dim = int(offs[1] - offs[0])
        if arr.null_count or int(offs[-1] - offs[0]) != n * dim:
            raise ValueError(
                f"embedding column is ragged or has nulls: expected {n} rows x {dim} dims "
                f"= {n * dim} values, got {int(offs[-1] - offs[0])} (nulls={arr.null_count})"
            )
        return vals[offs[0] : offs[0] + n * dim].reshape(n, dim)
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return arr.values.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, dim)
    m = arr.to_numpy(zero_copy_only=False)
    if getattr(m, "dtype", None) is not None and m.dtype == object:
        m = np.stack(m)
    return np.asarray(m, dtype=np.float64)


def kmeans_fit(
    ds,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    tol: float = 0.0,
) -> np.ndarray:
    """Fit centroids; returns a (k, dim) float64 ndarray."""

    def local_min_ids(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = np.argsort(ids, kind="mergesort")[:k]
        return batch.select([id_col, vec_col]).take(sel)

    seed_rows = (
        ds.map_batches(local_min_ids, batch_format="pyarrow").to_pandas().sort_values(id_col).head(k)
    )
    if len(seed_rows) < k:
        raise ValueError(f"k={k} but only {len(seed_rows)} rows available")
    cent = np.stack([np.asarray(v, dtype=np.float64) for v in seed_rows[vec_col]])

    for _ in range(iters):

        def partial(batch: pa.Table, c: np.ndarray) -> pa.Table:
            m = _batch_matrix(batch[vec_col])
            if m.shape[0] == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], type=pa.int64()),
                        "count": pa.array([], type=pa.int64()),
                        "vecsum": pa.array([], type=pa.binary()),
                    }
                )
            d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            live = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(live, type=pa.int64()),
                    "count": pa.array(counts[live], type=pa.int64()),
                    "vecsum": pa.array([sums[i].tobytes() for i in live], type=pa.binary()),
                }
            )

        parts = broadcast_map_batches(ds, partial, {"c": cent}).to_pandas()
        new_cent = cent.copy()
        if len(parts):
            total = np.zeros_like(cent)
            n_tot = np.zeros(k, dtype=np.int64)
            for cl, cnt, blob in zip(parts["cluster"], parts["count"], parts["vecsum"]):
                total[int(cl)] += np.frombuffer(blob, dtype=np.float64)
                n_tot[int(cl)] += int(cnt)
            live = n_tot > 0
            new_cent[live] = total[live] / n_tot[live, None]
        shift = float(np.max(np.linalg.norm(new_cent - cent, axis=1))) if k else 0.0
        cent = new_cent
        if shift <= tol:
            break
    return cent


def sample_per_cluster(
    assigned,
    n: int,
    *,
    cluster_col: str = "cluster_id",
    id_col: str = "vec_id",
):
    """Cluster-balanced (diversity) sampling: keep the ``n`` smallest-id
    rows of every cluster — deterministic, so SQL-checkable with a window
    function. Mergeable per-block top-n per cluster first (one lexsort per
    batch), then a tiny per-cluster finalize: at most ``n x blocks`` rows
    per cluster ever shuffle."""
    import pandas as pd

    def local_topn(batch: pa.Table) -> pa.Table:
        cid = batch[cluster_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cid))
        cid_s = cid[order]
        new = np.empty(len(cid_s), dtype=bool)
        new[:1] = True
        new[1:] = cid_s[1:] != cid_s[:-1]
        firsts = np.flatnonzero(new)
        sizes = np.diff(np.append(firsts, len(cid_s)))
        rank = np.arange(len(cid_s)) - np.repeat(firsts, sizes)
        return batch.take(order[rank < n])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(n)

    local = assigned.map_batches(local_topn, batch_format="pyarrow")
    return local.groupby(cluster_col).map_groups(finalize, batch_format="pandas")


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding", out_col: str = "cluster_id"):
    """Streaming assignment: adds ``out_col`` (int64 argmin-L2 cluster)."""
    cent = np.asarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table, c: np.ndarray) -> pa.Table:
        m = _batch_matrix(batch[vec_col])
        if m.shape[0] == 0:
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
        d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return batch.append_column(out_col, pa.array(np.argmin(d2, axis=1).astype(np.int64)))

    return broadcast_map_batches(ds, assign, {"c": cent})
