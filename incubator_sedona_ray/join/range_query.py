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
            fn_p = P.PREDICATES[predicate]
            keep = np.array([fn_p(window, _wkb.from_wkb(b)) for b in batch[geom].to_pylist()])
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
