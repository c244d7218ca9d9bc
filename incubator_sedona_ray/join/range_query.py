"""Spatial range query (``core/.../spatialOperator/RangeQuery.java``):
filter a Dataset to rows whose geometry satisfies predicate(query_window,
row_geom) — a pure vectorized ``map_batches`` filter, no shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.core import Geometry, GeometryType
from ..geom import predicates as P
from ..geom import wkb as _wkb


def range_query(ds, window: Geometry, predicate: str = "covers", *, geom=("lon", "lat")):
    """predicate is window-side: "covers" (considerBoundaryIntersection=true
    keeps boundary hits; use "contains" for strict interior, "intersects"
    for extended geometries)."""
    is_point_side = isinstance(geom, (tuple, list))
    polygonal = window.kind in (GeometryType.POLYGON, GeometryType.MULTIPOLYGON)

    def fn(batch: pa.Table) -> pa.Table:
        if is_point_side and polygonal:
            x = batch[geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
            y = batch[geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
            loc = P.locate_points_in_geometry(x, y, window)
            if predicate == "contains":
                keep = loc == P.INTERIOR
            elif predicate in ("covers", "intersects"):
                keep = loc >= P.BOUNDARY
            elif predicate == "disjoint":
                keep = loc == P.EXTERIOR
            else:
                raise ValueError(predicate)
        else:
            # WKB rows: envelope pre-filter, then the join refine kernel
            # (vectorized point / polygon fast paths incl. poly-x-poly)
            from .spatial_join import _pair_mask_predicate, _side_fields, _wkb_kinds

            n = batch.num_rows
            rt = _side_fields(batch, geom)
            rt["kind"] = _wkb_kinds(rt["wkb"], n)
            wx0, wy0, wx1, wy1 = window.envelope()
            e = rt["e"]
            overlap = (e[:, 0] <= wx1) & (e[:, 2] >= wx0) & (e[:, 1] <= wy1) & (e[:, 3] >= wy0)
            keep = np.zeros(n, dtype=bool)
            if predicate == "disjoint":
                keep[~overlap] = True
            cand = np.nonzero(overlap)[0]
            if len(cand):
                wt = pa.table({"g": pa.array([_wkb.to_wkb(window)], type=pa.binary())})
                lt = _side_fields(wt, "g")
                lt["kind"] = _wkb_kinds(lt["wkb"], 1)
                keep[cand] = _pair_mask_predicate(
                    lt, rt, np.zeros(len(cand), dtype=np.int64), cand, predicate
                )
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
