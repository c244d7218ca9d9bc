"""kNN query + kNN join.

* :func:`knn_query` — global k nearest neighbours of ONE query geometry:
  per-batch top-k inside ``map_batches`` (numpy argpartition = the
  PriorityQueue in ``KnnJudgement.java:64-85``) then ``sort(dist).limit(k)``
  (the driver-side ``takeOrdered`` in ``KNNQuery.java:63-73``). Deterministic
  tie-break on a caller-named id column.

* :func:`knn_join` — k nearest right-side points for EACH left query row.
  The reference has no kNN *join* (its KNNQuery is single-query, SURVEY.md
  §2.4), so this is our documented extension: the query set is broadcast
  (``ray.put``), every right batch emits its local per-query top-k, and a
  ``groupby(query_id)`` reduces local top-ks to the global top-k. Exact
  because top-k is a mergeable (associative) reduction — no boundary
  re-checks needed, unlike radius-expansion schemes. Partitioning
  assumption: the query set fits in the object store (broadcast); for
  query sets too big to broadcast, fall back to ``spatial_join`` with an
  expanding radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geom import wkb as _wkb
from ..geom.core import Geometry
from ..geom import ops as _ops
from ..partition.assign import resolve_ref


def knn_query(ds, query: Geometry, k: int, *, geom=("lon", "lat"), id_col: str | None = None):
    """Dataset of the k rows nearest to ``query`` with an appended ``dist``
    column, ordered by (dist, id_col)."""
    is_point_side = isinstance(geom, (tuple, list))

    def local_topk(batch: pa.Table) -> pa.Table:
        if is_point_side:
            x = batch[geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
            y = batch[geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
            if query.kind == "Point":
                d = np.hypot(x - query.coords[0], y - query.coords[1])
            else:
                d = _ops.points_to_geometry_distance(x, y, query)
        else:
            d = np.array([_ops.distance(query, _wkb.from_wkb(b)) for b in batch[geom].to_pylist()])
        kk = min(k, len(d))
        sel = np.argpartition(d, kk - 1)[:kk] if kk else np.array([], dtype=np.int64)
        out = batch.take(pa.array(sel))
        return out.append_column("dist", pa.array(d[sel], type=pa.float64()))

    topk = ds.map_batches(local_topk, batch_format="pyarrow")
    sort_cols = ["dist"] + ([id_col] if id_col else [])
    return topk.sort(sort_cols).limit(k)


def knn_join(
    right,
    queries,
    k: int,
    *,
    right_geom=("lon", "lat"),
    query_x: str = "qx",
    query_y: str = "qy",
    query_id: str = "query_id",
    right_id: str | None = None,
):
    """For each row of the (small, broadcast) ``queries`` table, find its k
    nearest right-side points. Returns columns
    (query_id, <right columns...>, dist, rank) with rank 1..k per query.

    ``queries``: pandas DataFrame with columns [query_id, query_x, query_y].
    """
    qdf = queries.reset_index(drop=True)
    q_ref = ray.put(
        {
            "id": qdf[query_id].to_numpy(),
            "x": qdf[query_x].to_numpy(dtype=np.float64),
            "y": qdf[query_y].to_numpy(dtype=np.float64),
        }
    )

    def local_topk(batch: pa.Table, q) -> pa.Table:
        x = batch[right_geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[right_geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
        # (nq, nb) distance matrix per batch — vectorized; batch_size bounds memory
        d = np.hypot(q["x"][:, None] - x[None, :], q["y"][:, None] - y[None, :])
        kk = min(k, d.shape[1])
        if kk == 0:
            sel = np.empty((len(q["x"]), 0), dtype=np.int64)
        else:
            sel = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        nq = sel.shape[0]
        rows = sel.ravel()
        qidx = np.repeat(np.arange(nq), sel.shape[1])
        out = batch.take(pa.array(rows))
        out = out.append_column(query_id, pa.array(q["id"][qidx]))
        out = out.append_column("dist", pa.array(d[qidx, rows], type=pa.float64()))
        return out

    from ..partition.assign import broadcast_map_batches

    candidates = broadcast_map_batches(right, local_topk, {"q": q_ref})

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = ["dist"] + ([right_id] if right_id else [])
        g = g.sort_values(sort_cols, kind="mergesort").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return candidates.groupby(query_id).map_groups(global_topk, batch_format="pandas")


def knn_join_partitioned(
    right,
    queries,
    k: int,
    *,
    right_geom=("lon", "lat"),
    query_x: str = "qx",
    query_y: str = "qy",
    query_id: str = "query_id",
    right_id: str | None = None,
    initial_radius: float | None = None,
    max_rounds: int = 8,
    conf=None,
):
    """kNN join via the PARTITIONED distance join with expanding radius —
    the scale path when the query set is too large to broadcast (the
    broadcast variant holds an (nq x batch) distance matrix per batch).

    Completeness proof: a query's result is final once it has >= k
    neighbours within radius r, because every unseen point is farther than
    r >= its k-th neighbour distance. Queries short of k re-run with 2x the
    radius (only the UNFINISHED queries re-join, so rounds shrink fast).
    Exact — matches the broadcast variant row-for-row.
    """
    import pandas as pd
    from ..conf import DEFAULT_CONF
    from .spatial_join import spatial_join

    conf = conf or DEFAULT_CONF
    remaining = queries.reset_index(drop=True)
    if initial_radius is None:
        initial_radius = 1.0
    results = []
    r = float(initial_radius)
    for _ in range(max_rounds):
        if len(remaining) == 0:
            break
        qds = ray.data.from_pandas(remaining)
        joined = spatial_join(
            qds,
            right,
            radius=r,
            left_geom=(query_x, query_y),
            right_geom=right_geom,
            lprefix="q_",
            rprefix="",
            conf=conf,
        ).to_pandas()
        done_ids = []
        for qid, grp in joined.groupby("q_" + query_id):
            if len(grp) >= k:
                g = grp.copy()
                qrow = remaining[remaining[query_id] == qid].iloc[0]
                g["dist"] = np.hypot(g[right_geom[0]] - qrow[query_x], g[right_geom[1]] - qrow[query_y])
                by = ["dist"] + ([right_id] if right_id else [])
                g = g.sort_values(by, kind="mergesort").head(k)
                g = g.drop(columns=[c for c in g.columns if c.startswith("q_")])
                g[query_id] = qid
                g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
                results.append(g)
                done_ids.append(qid)
        remaining = remaining[~remaining[query_id].isin(done_ids)]
        r *= 2.0
    if len(remaining):  # fewer than k points exist in range — return what we have
        qds = ray.data.from_pandas(remaining)
        joined = spatial_join(
            qds, right, radius=r, left_geom=(query_x, query_y), right_geom=right_geom,
            lprefix="q_", rprefix="", conf=conf,
        ).to_pandas()
        for qid, grp in joined.groupby("q_" + query_id):
            qrow = remaining[remaining[query_id] == qid].iloc[0]
            g = grp.copy()
            g["dist"] = np.hypot(g[right_geom[0]] - qrow[query_x], g[right_geom[1]] - qrow[query_y])
            by = ["dist"] + ([right_id] if right_id else [])
            g = g.sort_values(by, kind="mergesort").head(k)
            g = g.drop(columns=[c for c in g.columns if c.startswith("q_")])
            g[query_id] = qid
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
            results.append(g)
    return pd.concat(results, ignore_index=True) if results else pd.DataFrame()
