"""Broadcast 1-D interval join — the geo-IP / CIDR / numeric-range
enrichment every crawl pipeline runs (map an integer key into
non-overlapping [lo, hi] ranges carrying attributes).

This is the non-equi join class SQL writes as ``JOIN r ON p BETWEEN r.lo
AND r.hi``; a shuffle implementation would be wasteful because range
tables are small by nature (full IPv4 geo tables are a few million rows —
MBs). So: collect + sort the ranges ONCE, ``ray.put`` the three arrays,
and stream the big side through a vectorized ``np.searchsorted`` probe —
zero shuffles, the same broadcast-small-side shape as the spatial
broadcast join (``join/broadcast.py``).

Contract: ranges must be non-overlapping (validated at build); points
matching no range are dropped (``how="inner"``) or kept with a null
attribute (``how="left"``).

Reference scope note: the reference's analogous op is the broadcast range
join (``RangeJoinExec``) over spatial intervals; this is its 1-D integer
counterpart from the north rule's enrichment needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def build_interval_index(ranges_ds, *, lo_col: str = "lo", hi_col: str = "hi", attr_cols=("value",)):
    """Collect + validate the (small) range table: returns the object-store
    ref of (lo sorted, hi, attr arrays). Raises on overlap or hi < lo."""
    import ray

    df = ranges_ds.to_pandas()  # small-side contract
    df = df.sort_values(lo_col).reset_index(drop=True)
    lo = df[lo_col].to_numpy(dtype=np.int64)
    hi = df[hi_col].to_numpy(dtype=np.int64)
    if (hi < lo).any():
        raise ValueError("interval with hi < lo")
    if len(lo) > 1 and (lo[1:] <= hi[:-1]).any():
        raise ValueError("overlapping intervals")
    attrs = {c: df[c].to_numpy() for c in attr_cols}
    return ray.put((lo, hi, attrs))


def interval_join(
    points,
    ranges_ds,
    *,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    attr_cols=("value",),
    how: str = "inner",
):
    """Dataset(points columns + attr_cols) for rows whose ``point_col``
    falls inside a range ([lo, hi] inclusive)."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    ref = build_interval_index(
        ranges_ds, lo_col=lo_col, hi_col=hi_col, attr_cols=attr_cols
    )

    def probe(t: pa.Table) -> pa.Table:
        lo, hi, attrs = ray.get(ref)
        p = t[point_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.searchsorted(lo, p, side="right") - 1
        ok = (i >= 0) & (p <= hi[np.clip(i, 0, max(len(hi) - 1, 0))]) if len(lo) else np.zeros(len(p), dtype=bool)
        if how == "inner":
            t = t.filter(pa.array(ok))
            sel = i[ok]
            for c, arr in attrs.items():
                t = t.append_column(c, pa.array(arr[sel]))
            return t
        for c, arr in attrs.items():
            vals = [arr[j] if m else None for j, m in zip(i, ok)]
            t = t.append_column(c, pa.array(vals))
        return t

    return points.map_batches(probe, batch_format="pyarrow")
