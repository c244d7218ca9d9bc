"""Geometry aggregates (SURVEY.md §2.5).

* :func:`envelope_aggr` — ST_Envelope_Aggr (``AggregateFunctions.scala:77-140``):
  exact, as a numeric min/max aggregate (partial per block + tiny final).
* :func:`union_aggr` — ST_Union_Aggr (``:56-71``): for DISJOINT inputs (the
  common big-data case: per-group tile/zone geometries) the union is the
  Multi*/GeometryCollection assembly, which we build exactly; dissolving
  OVERLAPPING polygons needs a boolean-ops kernel (GEOS) and raises.
* :func:`collect_aggr` — JoinQuery.SpatialJoinQuery grouped-output analog
  (collect matching geometries per key, window-dedup by geometry equality
  — ``JoinQuery.java:88-99`` collectGeometriesByKey).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geom import wkb as _wkb
from ..geom import predicates as _pred
from ..geom.core import Geometry, GeometryType


def envelope_aggr(ds, geom_col: str = "geom") -> Geometry:
    """Global bbox polygon of a WKB-geometry Dataset (one streaming pass)."""
    import pyarrow as pa
    from ray.data.aggregate import Max, Min

    def env_cols(batch: pa.Table) -> pa.Table:
        env = _wkb.envelopes_from_wkb(batch[geom_col])  # zero-copy batch scan
        return pa.table({"e0": env[:, 0], "e1": env[:, 1], "e2": env[:, 2], "e3": env[:, 3]})

    row = ds.map_batches(env_cols, batch_format="pyarrow").aggregate(
        Min("e0"), Min("e1"), Max("e2"), Max("e3")
    )
    return Geometry.box(row["min(e0)"], row["min(e1)"], row["max(e2)"], row["max(e3)"])


def union_aggr_geoms(geoms: list[Geometry], check_disjoint: bool = True) -> Geometry:
    """Union of geometries. Disjoint inputs -> Multi* assembly; overlapping
    POLYGONS go through the exact piecewise boolean kernel
    (geom/triangulate.py union_aggr_general), dissolved to boundary
    shells+holes like the reference's JTS union (geom/dissolve.py; the
    dissolve self-check falls back to the piecewise form on pathological
    input)."""
    parts = [p for g in geoms for p in g.parts()]
    if check_disjoint:
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                if _pred._interiors_overlap(parts[i], parts[j]):
                    from ..geom.dissolve import dissolve
                    from ..geom.triangulate import union_aggr_general

                    return dissolve(union_aggr_general(parts))
    kinds = {p.kind for p in parts}
    if kinds == {GeometryType.POLYGON}:
        return Geometry(GeometryType.MULTIPOLYGON, [p.coords for p in parts])
    if kinds == {GeometryType.LINESTRING}:
        return Geometry(GeometryType.MULTILINESTRING, [p.coords for p in parts])
    if kinds == {GeometryType.POINT}:
        return Geometry(GeometryType.MULTIPOINT, np.vstack([p.all_coords() for p in parts]))
    return Geometry(GeometryType.GEOMETRYCOLLECTION, parts)


def union_aggr(ds, geom_col: str = "geom", group_key: str | None = None, canonical_order: bool = False):
    """Grouped (or global) disjoint-union aggregate. Grouped: returns a
    Dataset (group_key, geom WKB); global: returns a Geometry.
    ``canonical_order`` sorts input WKB bytewise before the union so Multi*
    part order (hence the output WKB) is independent of block arrival
    order — required when the result feeds a bit-exact comparison."""
    import pyarrow as pa

    if group_key is None:
        blobs = []
        for batch in ds.select_columns([geom_col]).iter_batches(batch_format="pyarrow"):
            blobs.extend(batch[geom_col].to_pylist())
        if canonical_order:
            blobs.sort()
        return union_aggr_geoms([_wkb.from_wkb(b) for b in blobs])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        blobs = sorted(g[geom_col]) if canonical_order else list(g[geom_col])
        u = union_aggr_geoms([_wkb.from_wkb(b) for b in blobs])
        return pd.DataFrame({group_key: [g[group_key].iloc[0]], geom_col: [_wkb.to_wkb(u)]})

    return ds.groupby(group_key).map_groups(per_group, batch_format="pandas")


def collect_aggr(ds, geom_col: str, group_key: str, dedup_equal_geometries: bool = True):
    """Per-key list of matched geometries with the reference's
    equal-geometry dedup (grouped SpatialJoinQuery semantics)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        blobs = list(g[geom_col])
        if dedup_equal_geometries:
            seen, out = set(), []
            for b in blobs:
                if b not in seen:
                    seen.add(b)
                    out.append(b)
            blobs = out
        return pd.DataFrame({group_key: [g[group_key].iloc[0]], "geoms": [blobs], "n": [len(blobs)]})

    return ds.groupby(group_key).map_groups(per_group, batch_format="pandas")
