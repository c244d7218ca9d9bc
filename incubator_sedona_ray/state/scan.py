"""Distributed prefix sum (exclusive scan) over a totally-ordered key —
the primitive behind cross-document LM sequence packing ("concat the
corpus, cut every C tokens": every doc needs its global token offset),
global row numbering, and cumulative histograms.

Ray Data has no scan operator (scans are order-dependent; blocks are
not), so this builds one from order-preserving RANGE partitioning:

  1. bounds    one column-pruned pass: Min/Max of ``order_col``
  2. ranges    stateless map: range_id = (key - lo) * R // (hi - lo + 1)
               — order-preserving by construction, so range r holds
               exactly the keys between ranges r-1 and r+1
  3. partials  per-batch map-side Sum -> tiny (range_id, sum) rows ->
               groupby(range_id) Sum: O(R) rows reach the driver
  4. bases     driver exclusive scan over the R range totals (O(R) work),
               shipped back inside the task closure
  5. scan      groupby(range_id).map_groups: sort the group by
               ``order_col``, local exclusive cumsum + base[range_id]

The one real exchange is step 5's range-keyed shuffle. PARTITIONING
ASSUMPTION (documented per the project brief): a single range's rows must
fit one worker's heap — R defaults to 2x the cluster CPUs and should be
raised for skewed key distributions (range widths are uniform in KEY
space, not row space).

Determinism: integer sums in any order + a per-group sort on a UNIQUE
order key -> byte-stable output at any parallelism. Ties in ``order_col``
would make "exclusive prefix" ambiguous, so the key must be unique (the
caller's contract; doc ids are).

No counterpart in the reference repo (Sedona has no scan); the SQL
equivalent is ``SUM(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
AND 1 PRECEDING)``, which is the oracle the ``pack_offsets`` query runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def range_prefix_sum(
    ds,
    order_col: str,
    value_col: str,
    *,
    out_col: str = "cum_before",
    num_ranges: int | None = None,
):
    """Append ``out_col`` = sum of ``value_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive prefix sum in key order).
    Both columns must be integer; ``order_col`` values must be unique."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    if num_ranges is None:
        try:
            num_ranges = max(2, int(ray.cluster_resources().get("CPU", 4)) * 2)
        except Exception:
            num_ranges = 8

    bounds = ds.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = hi - lo + 1
    R = int(num_ranges)

    def add_range(t: pa.Table) -> pa.Table:
        k = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rid = (k - lo) * R // width
        return t.append_column("_rid", pa.array(rid, type=pa.int64()))

    keyed = ds.map_batches(add_range, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        rid = t["_rid"].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # int64-exact grouped sum (bincount's float weights would round)
        u, inv = np.unique(rid, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, v)
        return pa.table(
            {
                "_rid": pa.array(u, type=pa.int64()),
                "_s": pa.array(acc, type=pa.int64()),
            }
        )

    totals = (
        keyed.map_batches(partial, batch_format="pyarrow")
        .groupby("_rid")
        .aggregate(Sum("_s", alias_name="_s"))
        .to_pandas()
    )  # O(R) rows by construction
    base = np.zeros(R + 1, dtype=np.int64)
    if len(totals):
        per = np.zeros(R, dtype=np.int64)
        per[totals["_rid"].to_numpy(dtype=np.int64)] = totals["_s"].to_numpy(dtype=np.int64)
        base[1:] = np.cumsum(per)

    def scan_group(t: pa.Table) -> pa.Table:
        k = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        cum = np.zeros(len(v), dtype=np.int64)
        cum[order[1:]] = np.cumsum(v[order])[:-1]
        rid = int(t["_rid"][0].as_py()) if t.num_rows else 0
        cum += base[rid]
        out = t.drop_columns(["_rid"])
        return out.append_column(out_col, pa.array(cum, type=pa.int64()))

    return keyed.groupby("_rid").map_groups(scan_group, batch_format="pyarrow")
