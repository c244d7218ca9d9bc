"""S2 cell-id equi-join — the third join plan.

The reference documents this workflow in its own S2 test
(``sql/common/src/test/.../STS2CellIDs.scala`` "use ST_S2CellIDs for
spatial join"): explode each geometry's level-L cell covering, equi-join on
``cell_id``, then refine with the exact predicate ("cellIds equal doesn't
necessarily mean the geoms intersect").

Scale profile: a plain HASH join on an int64 key — no spatial partitioner
fit, no driver-side sample, perfectly uniform shuffle (cell ids are
Hilbert-curve-local). The price is covering fan-out on big geometries and a
pair-dedup rule (a pair sharing k cells appears k times).

Dedup rule (exact, no extra shuffle): a candidate pair is kept only in the
MINIMUM cell id the two coverings share — computable group-locally because
each row carries its full (small) covering list. Point rows have exactly one
cell, so point-vs-polygon pairs are unique by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..encoders import s2 as _s2
from ..geom import predicates as P
from ..geom import wkb as _wkb
from .spatial_join import _pair_mask_predicate, _wkb_kinds


MAX_COVER = 256  # per-geometry covering guard: each exploded row carries the
# covering list for the min-shared-cell dedup, so cost is O(cover^2) per
# geometry — pick a coarser level instead of raising this


def _explode_cells(ds, geom, prefix: str, level: int, max_cover: int = MAX_COVER):
    """Side -> rows (prefixed user cols, __cell, __cells list, __wkb, __x/__y)."""
    is_point = isinstance(geom, (tuple, list))

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if is_point:
            x = batch[geom[0]].to_numpy(zero_copy_only=False).astype(np.float64)
            y = batch[geom[1]].to_numpy(zero_copy_only=False).astype(np.float64)
            cells = _s2.cells_for_points(x, y, level)
            reps = np.ones(n, dtype=np.int64)
            cell_flat = cells
            cell_lists = [[int(c)] for c in cells]
            wkb_col = pa.nulls(n, type=pa.binary())
        else:
            blobs = batch[geom].to_pylist()
            cell_lists = []
            for b in blobs:
                cover = _s2.cover_geometry(_wkb.from_wkb(b), level)
                if len(cover) > max_cover:
                    raise ValueError(
                        f"covering of a geometry has {len(cover)} level-{level} cells "
                        f"(> {max_cover}); use a coarser level for this layer"
                    )
                cell_lists.append([int(c) for c in cover])
            reps = np.array([len(c) for c in cell_lists], dtype=np.int64)
            cell_flat = np.array([c for cl in cell_lists for c in cl], dtype=np.int64)
            x = np.full(n, np.nan)
            y = np.full(n, np.nan)
            wkb_col = batch[geom]
        idx = np.repeat(np.arange(n), reps)
        out = batch.take(pa.array(idx))
        out = pa.table(
            {
                **{prefix + c: out[c] for c in batch.column_names},
                "__cell": pa.array(cell_flat, type=pa.int64()),
                # packed as BYTES: pyarrow's hash join rejects list payload columns
                "__cells": pa.array(
                    [np.asarray(cell_lists[i], dtype=np.int64).tobytes() for i in idx],
                    type=pa.binary(),
                ),
                "__wkb": wkb_col.take(pa.array(idx)),
                "__x": pa.array(x[idx], type=pa.float64()),
                "__y": pa.array(y[idx], type=pa.float64()),
            }
        )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def s2_cell_join(
    left,
    right,
    predicate: str = "intersects",
    *,
    level: int = 10,
    left_geom="geom",
    right_geom=("lon", "lat"),
    lprefix: str = "l_",
    rprefix: str = "r_",
    num_partitions: int | None = None,
):
    """Inner predicate join via S2 cell equi-join + exact refine.

    Plan: explode coverings -> ``Dataset.join`` hash equi-join on the int64
    cell id -> vectorized per-batch exact refine -> min-shared-cell dedup.
    Output columns match :func:`..spatial_join.spatial_join` (prefixed user
    columns). Best for point/compact geometries; covering fan-out grows with
    geometry size relative to the cell level.
    """
    if num_partitions is None:
        # Dataset.join spawns one hash-aggregator actor per partition; more
        # partitions than CPUs deadlocks a small cluster waiting for actors
        import ray as _ray

        try:
            num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4
    l_user = [lprefix + c for c in left.schema().names]
    r_user = [rprefix + c for c in right.schema().names]
    le = _explode_cells(left, left_geom, lprefix, level)
    re_ = _explode_cells(right, right_geom, rprefix, level)

    from ..state.blocks import safe_hash_join

    joined = safe_hash_join(
        le,
        re_,
        "inner",
        num_partitions,
        on=("__cell",),
        right_on=("__cell",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def refine(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_cols = l_user + r_user
        if n == 0:
            return pa.table({c: batch[c] if c in batch.column_names else pa.array([]) for c in out_cols})

        def arrays(suffix):
            wkb_name = "__wkb" + suffix if "__wkb" + suffix in batch.column_names else "__wkb"
            wkb_col = batch[wkb_name]
            wkb = None if wkb_col.null_count == n else _wkb.LazyBlobs(wkb_col)
            xn = "__x" + suffix if "__x" + suffix in batch.column_names else "__x"
            yn = "__y" + suffix if "__y" + suffix in batch.column_names else "__y"
            x = batch[xn].to_numpy(zero_copy_only=False)
            y = batch[yn].to_numpy(zero_copy_only=False)
            if wkb is None:
                env = np.column_stack([x, y, x, y])
            else:
                env = _wkb.envelopes_from_wkb(wkb_col)  # zero-copy batch scan
            return {
                "x": x,
                "y": y,
                "e": env,
                "wkb": wkb,
                "ispt": np.ones(n, dtype=bool)
                if wkb is None
                else (
                    pa.compute.binary_length(wkb_col).fill_null(0).to_numpy(zero_copy_only=False) == 21
                ),
                "kind": _wkb_kinds(wkb, n),
            }

        lt = arrays("_l")
        rt = arrays("_r")
        idx = np.arange(n)
        keep = _pair_mask_predicate(lt, rt, idx, idx, predicate)
        # min-shared-cell dedup — only pairs where a side covers >1 cell
        # can be duplicated, so vectorize the guard (cover byte lengths)
        # and decode cell lists only for those rows
        import pyarrow.compute as pc

        lcells_name = "__cells_l" if "__cells_l" in batch.column_names else "__cells"
        rcells_name = "__cells_r" if "__cells_r" in batch.column_names else "__cells"
        llen = pc.binary_length(batch[lcells_name]).to_numpy(zero_copy_only=False) // 8
        rlen = pc.binary_length(batch[rcells_name]).to_numpy(zero_copy_only=False) // 8
        check = np.nonzero(keep & ((llen > 1) | (rlen > 1)))[0]
        if len(check):
            cell = batch["__cell"].to_numpy(zero_copy_only=False)
            lcells = batch[lcells_name].take(pa.array(check)).to_pylist()
            rcells = batch[rcells_name].take(pa.array(check)).to_pylist()
            for j, k in enumerate(check):
                lc = np.frombuffer(lcells[j], dtype=np.int64)
                rc = np.frombuffer(rcells[j], dtype=np.int64)
                shared = np.intersect1d(lc, rc)
                if shared[0] != cell[k]:
                    keep[k] = False
        out = batch.filter(pa.array(keep))
        return out.select(out_cols)

    return joined.map_batches(refine, batch_format="pyarrow")
