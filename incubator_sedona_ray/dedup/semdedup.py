"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, then drop rows that are
near-duplicates (cosine >= tau) of another row INSIDE their cluster.

The clustering is the scale lever: instead of the all-pairs O(n^2) cosine
sweep, pairs are only examined within a cluster, and clusters are a keyed
``groupby`` — at 100 TB the exchange is one shuffle on the cluster id and
the per-group work is a dense (c x c) matmul bounded by the cluster size
(pick k ~ n / target_cluster_size; for over-capacity clusters the
LSH-bucketed splitter in dedup/embed.py is the recursive fallback).

Determinism / oracle contract:

* Seeds are the k embeddings with the LOWEST ids — no RNG, no iterative
  k-means, so the DuckDB oracle reproduces the assignment with plain SQL.
* Assignment = argmax cosine(x, seed), ties to the lowest seed index; all
  math in float64 (matches SQL double arithmetic to ~1e-15, far inside
  any decision boundary the caller should rely on).
* Prune rule: a row is removed iff SOME lower-id row in the same cluster
  has cosine >= tau with it ("keep the earliest of every near-dup pair").
  This is order-independent and SQL-expressible (NOT EXISTS), unlike the
  paper's sequential sweep where removal of A can rescue B; for true
  duplicates the two rules agree, and the difference only appears in
  chains A~B~C where A!~C.

Returns the SURVIVORS as (id_col, cluster) — re-attach payload columns by
id with join/payload.attach_payload, same pattern as dedup/exact.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["semdedup"]


def _norm_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def semdedup(
    ds,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    tau: float = 0.8,
):
    """Dataset[(id_col, vec_col, ...)] -> Dataset[(id_col, cluster)] of
    surviving rows. One tiny sort+limit for the seeds, one broadcast
    assignment pass, one groupby(cluster) prune."""
    # Seeds: k lowest-id embeddings via a per-batch partial top-k (each
    # batch emits at most k rows) folded on the driver — no global sort
    # shuffle for k rows.
    def _kmin(batch: pa.Table) -> pa.Table:
        sub = batch.select([id_col, vec_col])
        if sub.num_rows <= k:
            return sub
        ids = sub[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="mergesort")[:k]
        return sub.take(pa.array(take))

    seed_tbl = ds.map_batches(_kmin, batch_format="pyarrow").to_pandas()
    # empty input: to_pandas of zero rows can lose the schema entirely
    if len(seed_tbl) == 0 or id_col not in seed_tbl.columns:
        seed_tbl = seed_tbl.iloc[0:0]
    else:
        seed_tbl = seed_tbl.sort_values(id_col, kind="mergesort").head(k)
    if len(seed_tbl) == 0:
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())})
        )
    seeds = _norm_rows(np.array(list(seed_tbl[vec_col]), dtype=np.float64))

    def assign(batch: pa.Table, s: np.ndarray) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cluster", pa.array([], pa.int64()))
        x = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        cos = _norm_rows(x) @ s.T
        # np.argmax takes the FIRST maximum — the tie-to-lowest-seed rule.
        return batch.append_column("cluster", pa.array(np.argmax(cos, axis=1).astype(np.int64)))

    from ..partition.assign import broadcast_map_batches

    assigned = broadcast_map_batches(ds, assign, {"s": seeds}, batch_size=None)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        x = _norm_rows(np.array(list(df[vec_col]), dtype=np.float64))
        g = x @ x.T
        # earlier = rows with STRICTLY lower id (by value, not position —
        # equal-id rows never prune each other, matching the SQL
        # a.id < b.id contract and keeping the result independent of
        # block arrival order); explicit mask so tau <= 0 cannot turn
        # masked-out entries into dups
        ids = df[id_col].to_numpy()
        earlier = ids[None, :] < ids[:, None]
        dup = ((g >= tau) & earlier).any(axis=1)
        keep = df.loc[~dup]
        return pd.DataFrame(
            {id_col: keep[id_col].to_numpy(), "cluster": keep["cluster"].to_numpy()}
        )

    return assigned.groupby("cluster").map_groups(prune, batch_format="pandas")
