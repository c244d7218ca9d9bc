"""Broadcast-index spatial join — the no-shuffle path.

Ray-Data translation of ``BroadcastIndexJoinExec`` (``sql/.../join/
BroadcastIndexJoinExec.scala``; inner :125-137, semi :139-162, anti
:164-187, outer :189-225) + ``SpatialIndexExec.scala:28-66``: collect the
small side on the driver, build ONE STRtree over it, ``ray.put`` it once,
and stream the big side through ``map_batches`` probing the broadcast index.
This is the canonical plan for web-page-points × zone-polygons at scale: no
all-to-all exchange, perfectly linear scaling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..geom import wkb as _wkb
from ..geom.core import Geometry
from ..geom import ops as _ops
from ..geom import predicates as P
from ..geom.strtree import STRtree
from ..partition.assign import resolve_ref
from .spatial_join import _pair_mask_distance, _pair_mask_predicate


class BroadcastIndex:
    """Driver-built index over the small side: envelopes + STRtree + parsed
    geometry info + the payload table."""

    def __init__(self, table: pa.Table, geom):
        self.table = table
        if isinstance(geom, (tuple, list)):
            x = table[geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
            y = table[geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
            self.envs = np.column_stack([x, y, x, y])
            self.x, self.y = x, y
            self.wkb = [None] * table.num_rows
            self.ispt = np.ones(table.num_rows, dtype=bool)
        else:
            self.envs = _wkb.envelopes_from_wkb(table[geom])  # zero-copy batch scan
            ispt = pc.binary_length(table[geom]).fill_null(0).to_numpy(zero_copy_only=False) == 21
            self.x = np.where(ispt, self.envs[:, 0], np.nan)
            self.y = np.where(ispt, self.envs[:, 1], np.nan)
            self.wkb = _wkb.LazyBlobs(table[geom])  # list built only on exotic fallback
            self.ispt = ispt
        self.tree = STRtree(self.envs)
        if isinstance(geom, (tuple, list)):
            self.kind = np.full(table.num_rows, -1, dtype=np.int64)
        else:
            self.kind = _wkb.kinds_from_wkb(table[geom])

    def side_arrays(self):
        d = {"x": self.x, "y": self.y, "e": self.envs, "ispt": self.ispt, "wkb": self.wkb, "kind": self.kind}
        # ring/segment arrays for the vectorized polygon-x-polygon refine:
        # computed once (driver, at index build) instead of per probe batch
        poly = getattr(self, "_poly", None)
        if poly is None:
            from .spatial_join import _poly_side_arrays

            poly = _poly_side_arrays(d)
            self._poly = poly
        else:
            d["_poly"] = poly
        return d


def build_broadcast_index(small, geom) -> "ray.ObjectRef":
    """small: Dataset | pyarrow.Table | pandas.DataFrame (must fit on the driver)."""
    import pandas as pd

    if isinstance(small, pd.DataFrame):
        table = pa.Table.from_pandas(small, preserve_index=False)
    elif isinstance(small, pa.Table):
        table = small
    else:
        table = pa.concat_tables([ray.get(r) for r in small.to_arrow_refs()])
    return ray.put(BroadcastIndex(table, geom))


def broadcast_spatial_join(
    big,
    small,
    predicate: str = "intersects",
    *,
    big_geom=("lon", "lat"),
    small_geom="geom",
    how: str = "inner",
    big_side: str = "left",
    small_prefix: str = "z_",
    small_columns: list[str] | None = None,
    radius: float | None = None,
    inclusive: bool = True,
    concurrency=None,
):
    """Stream ``big`` against a broadcast index of ``small``.

    ``predicate(left, right)`` orientation follows ``big_side``: with
    ``big_side="left"`` the join condition is predicate(big_row, small_row)
    — e.g. ``predicate="within"`` keeps big points inside small polygons.

    ``how``: inner | left_semi | left_anti | left_outer (the exact set the
    reference supports only on the broadcast path). Inner/outer append the
    matched small-side columns prefixed with ``small_prefix``.
    """
    idx_ref = small if isinstance(small, ray.ObjectRef) else build_broadcast_index(small, small_geom)
    big_is_point = isinstance(big_geom, (tuple, list))

    def probe(batch: pa.Table, idx: BroadcastIndex) -> pa.Table:
        n = batch.num_rows
        if big_is_point:
            bx = batch[big_geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
            by = batch[big_geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
            benvs = np.column_stack([bx, by, bx, by])
            bwkb = [None] * n
            bispt = np.ones(n, dtype=bool)
        else:
            benvs = _wkb.envelopes_from_wkb(batch[big_geom])  # zero-copy batch scan
            bwkb = _wkb.LazyBlobs(batch[big_geom])  # list built only on exotic fallback
            bispt = pc.binary_length(batch[big_geom]).fill_null(0).to_numpy(zero_copy_only=False) == 21
            bx = np.where(bispt, benvs[:, 0], np.nan)
            by = np.where(bispt, benvs[:, 1], np.nan)
        if radius is not None:
            probe_envs = benvs + np.array([-radius, -radius, radius, radius])
        else:
            probe_envs = benvs
        bi, si = idx.tree.query_batch(probe_envs)
        big_arrays = {"x": bx, "y": by, "e": benvs, "ispt": bispt, "wkb": bwkb}
        big_arrays["kind"] = (
            np.full(n, -1, dtype=np.int64) if big_is_point else _wkb.kinds_from_wkb(batch[big_geom])
        )
        small_arrays = idx.side_arrays()
        if big_side == "left":
            lt, rt, li, ri = big_arrays, small_arrays, bi, si
        else:
            lt, rt, li, ri = small_arrays, big_arrays, si, bi
        if radius is not None:
            keep = _pair_mask_distance(lt, rt, li, ri, radius, inclusive)
        else:
            keep = _pair_mask_predicate(lt, rt, li, ri, predicate)
        bi, si = bi[keep], si[keep]

        if how == "left_semi" or how == "left_anti":
            matched = np.zeros(n, dtype=bool)
            matched[bi] = True
            if how == "left_anti":
                matched = ~matched
            return batch.filter(pa.array(matched))
        out_names = small_columns if small_columns is not None else idx.table.column_names
        if how == "inner":
            out = batch.take(pa.array(bi))
            for name in out_names:
                out = out.append_column(small_prefix + name, idx.table[name].take(pa.array(si)))
            return out
        if how == "left_outer":
            matched_rows = np.unique(bi)
            unmatched = np.setdiff1d(np.arange(n), matched_rows, assume_unique=False)
            take_big = np.concatenate([bi, unmatched])
            out = batch.take(pa.array(take_big))
            for name in out_names:
                col = idx.table[name].take(pa.array(si)).combine_chunks()
                nulls = pa.nulls(len(unmatched), type=idx.table.field(name).type)
                out = out.append_column(small_prefix + name, pa.concat_arrays([col, nulls]))
            return out
        raise ValueError(f"unsupported how={how!r}")

    # stateful stage = ACTOR POOL: the broadcast index is fetched ONCE per
    # actor in __init__ (a bare fn doing ray.get per task blocks workers at
    # stage start and the raylet churns the pool — measured as a serial
    # bottleneck).
    from ..partition.assign import broadcast_map_batches

    return broadcast_map_batches(
        big, probe, {"idx": idx_ref}, batch_format="pyarrow", concurrency=concurrency
    )
