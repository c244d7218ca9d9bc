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
            col = batch[geom]
            if query.kind == "Point":
                from .spatial_join import point_to_wkb_polygons_dist

                d = point_to_wkb_polygons_dist(
                    col, float(query.coords[0]), float(query.coords[1])
                )
            else:
                d = np.full(len(col), np.nan)
            miss = np.nonzero(np.isnan(d))[0]
            if len(miss):  # non-polygon rows (points/lines/exotic WKB)
                blobs = col.to_pylist()
                for i in miss:
                    d[i] = _ops.distance(query, _wkb.from_wkb(blobs[i]))
        kk = min(k, len(d))
        if kk:
            # keep ALL rows tied at the k-th distance so the global
            # (dist, id) sort sees every tie candidate — argpartition alone
            # keeps an arbitrary subset of a tie group spanning the cutoff
            kth = np.partition(d, kk - 1)[kk - 1]
            sel = np.nonzero(d <= kth)[0]
        else:
            sel = np.array([], dtype=np.int64)
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
            qidx = rows = np.array([], dtype=np.int64)
        else:
            # per query keep all columns tied at the k-th distance (see
            # knn_query.local_topk) — the groupby finalizer trims to k
            kth = np.partition(d, kk - 1, axis=1)[:, kk - 1 : kk]
            qidx, rows = np.nonzero(d <= kth)
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
    max_rounds: int = 64,
    conf=None,
):
    """kNN join via the PARTITIONED distance join with expanding radius —
    the scale path when the query set is too large to broadcast (the
    broadcast variant holds an (nq x batch) distance matrix per batch).

    Completeness proof: a query's result is final once it has >= k
    neighbours within radius r, because every unseen point is farther than
    r >= its k-th neighbour distance. Queries short of k re-run with 2x the
    radius (only the UNFINISHED queries re-join, so rounds shrink fast).
    The radius is capped by the combined query+data bounding-box diagonal:
    once r >= diagonal the join has seen EVERY point, so a query still
    short of k provably has fewer than k points in the dataset and its
    partial result is itself exact — matches the broadcast variant
    row-for-row, never a silent truncation at an arbitrary round count.

    Per-query finalize (dist, sort, top-k, rank) runs distributed in a
    ``groupby(query_id).map_groups``; the driver only holds the per-round
    (query_id, complete) bitmap (nq*k tiny rows). Returns a Dataset.
    """
    import functools

    import pandas as pd
    from ray.data.aggregate import Max, Min

    from ..conf import DEFAULT_CONF
    from .spatial_join import spatial_join

    conf = conf or DEFAULT_CONF
    remaining = queries.reset_index(drop=True)
    rx, ry = right_geom
    ext = right.aggregate(Min(rx), Min(ry), Max(rx), Max(ry))
    x0 = min(ext[f"min({rx})"], float(remaining[query_x].min()))
    x1 = max(ext[f"max({rx})"], float(remaining[query_x].max()))
    y0 = min(ext[f"min({ry})"], float(remaining[query_y].min()))
    y1 = max(ext[f"max({ry})"], float(remaining[query_y].max()))
    diag = float(np.hypot(x1 - x0, y1 - y0))
    r = float(initial_radius) if initial_radius is not None else max(diag / 1024.0, 1e-12)
    qid_col = "q_" + query_id
    qx_col, qy_col = "q_" + query_x, "q_" + query_y

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["dist"] = np.hypot(g[rx] - g[qx_col], g[ry] - g[qy_col])
        by = ["dist"] + ([right_id] if right_id else [])
        complete = len(g) >= k
        g = g.sort_values(by, kind="mergesort").head(k)
        out = g.drop(columns=[c for c in g.columns if c.startswith("q_") and c != qid_col])
        out = out.rename(columns={qid_col: query_id})
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        out["__complete"] = complete
        return out

    def keep_complete(t: pa.Table) -> pa.Table:
        m = t["__complete"].to_numpy(zero_copy_only=False).astype(bool)
        return t.drop_columns(["__complete"]).filter(pa.array(m))

    results = []
    rounds = 0
    while len(remaining):
        rounds += 1
        covers_all = r >= diag or rounds >= max_rounds
        rr = max(r, diag) if covers_all else r
        qds = ray.data.from_pandas(remaining)
        joined = spatial_join(
            qds,
            right,
            radius=rr,
            left_geom=(query_x, query_y),
            right_geom=right_geom,
            lprefix="q_",
            rprefix="",
            conf=conf,
        )
        topk = joined.groupby(qid_col).map_groups(finalize, batch_format="pandas")
        if covers_all:
            # the join saw every point: all remaining queries are final
            results.append(topk.map_batches(
                lambda t: t.drop_columns(["__complete"]), batch_format="pyarrow"
            ))
            break
        topk = topk.materialize()  # at most len(remaining) * k rows
        flags = topk.to_pandas()
        if len(flags):  # an empty round (no pairs in radius) completes nobody
            done_ids = set(flags.loc[flags["__complete"], query_id].unique())
            results.append(topk.map_batches(keep_complete, batch_format="pyarrow"))
            remaining = remaining[~remaining[query_id].isin(done_ids)]
        r *= 2.0
    if not results:
        return ray.data.from_pandas(pd.DataFrame({query_id: [], "rank": []}))
    return functools.reduce(lambda a, b: a.union(b), results)
