"""Exact brute-force cosine top-k — the ANN baseline.

Query matrix broadcast once (``ray.put``); each embedding batch computes one
``(nq, batch)`` matmul and emits its local per-query top-k; a
``groupby(query_id)`` merges local top-ks into the global top-k (top-k is a
mergeable reduction, so this is exact). Wall-clock scales with
rows/num_cpus; the LSH variant in :mod:`.lsh` is the sub-linear scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..partition.assign import resolve_ref


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def topk_cosine(
    ds,
    queries: pd.DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "qvec",
):
    """queries: DataFrame[query_id, qvec(list[float])]. Returns a Dataset
    (query_id, <id_col>, cosine, rank) with rank 1..k by (cosine desc, id)."""
    qm = _normalize(np.stack(queries[query_vec].to_numpy()).astype(np.float64))
    q_ref = ray.put({"ids": queries[query_id].to_numpy(), "m": qm})

    def local_topk(batch: pa.Table, q) -> pa.Table:
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()]))
        sim = q["m"] @ m.T  # (nq, nb)
        kk = min(k, sim.shape[1])
        sel = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        nq = sel.shape[0]
        rows = sel.ravel()
        qidx = np.repeat(np.arange(nq), sel.shape[1])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                query_id: pa.array(q["ids"][qidx]),
                id_col: pa.array(ids[rows]),
                "cosine": pa.array(sim[qidx, rows], type=pa.float64()),
            }
        )

    from ..partition.assign import broadcast_map_batches

    cand = broadcast_map_batches(ds, local_topk, {"q": q_ref})

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby(query_id).map_groups(global_topk, batch_format="pandas")
