"""Exact distributed quantiles without a global sort.

The classic way to get a corpus percentile (`ds.sort(col)` + rank lookup)
is an all-to-all shuffle of EVERY row — the single most expensive primitive
at 100 TB. Exact quantiles only need the rank *counts*, so this module
computes them with histogram passes whose network traffic is
O(batches x buckets), independent of row count:

1. **extent pass** — one ``map_batches`` emitting (min, max, count) per
   batch; folded on the driver (O(#batches) tiny rows).
2. **histogram pass** — bucketize values over [min, max] into ``buckets``
   equal-width bins; each batch emits only its NON-ZERO (bucket, count)
   pairs, pre-aggregated, and a ``groupby(bucket).sum`` (a shuffle of at
   most ``buckets`` distinct keys) yields exact global bucket counts.
   Integer fast path: when the value range has <= ``buckets`` distinct
   integers, the buckets ARE the values and the answer is exact here.
3. **refine pass** — each target rank lands in one bucket; a filtered
   collect pulls only the values inside candidate buckets (expected
   n/buckets rows per bucket) and picks the exact order statistic.
   ``refine_limit`` guards the driver pull; raise ``buckets`` (or recurse)
   if a pathological distribution concentrates mass in one bin.

Quantile definition matches DuckDB ``quantile_disc``: the value at 1-based
rank ``ceil(q * n)`` of the sorted column (verified empirically; same
IEEE-double ``q * n`` evaluation).

``grouped_quantiles_exact`` covers the per-group variant for
low-cardinality value domains (e.g. integer document lengths per
language): per-batch (group, value) count partials shrink the shuffle to
the distinct (group, value) pairs, then one ``map_groups`` per group picks
the order statistics from its count vector — no row-level shuffle.

Reference parity note: the reference engine exposes quantiles only via its
SQL engines' built-ins; this is a from-scratch Ray-Data formulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _rank_of(q: float, n: int) -> int:
    """DuckDB quantile_disc rank: 1-based ceil(q*n), clamped to [1, n]."""
    return min(max(int(np.ceil(np.float64(q) * np.float64(n))), 1), n)


def _col_values(batch: pa.Table, col: str) -> np.ndarray:
    v = batch[col].to_numpy(zero_copy_only=False)
    if v.dtype == object:
        v = v.astype(np.float64)
    return v


def quantiles_exact(
    ds,
    col: str,
    qs: list[float],
    *,
    buckets: int = 4096,
    refine_limit: int = 50_000_000,
):
    """Exact quantiles of ``ds[col]`` -> dict {q: value}.

    Three streaming passes, no row shuffle (see module docstring). The
    input Dataset is executed up to three times — pass a checkpointed /
    re-readable Dataset, not a long fused chain, when the upstream is
    expensive.
    """
    qs = list(qs)

    # -- pass 1: extent -----------------------------------------------------
    def extent(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, col)
        v = v[~np.isnan(v.astype(np.float64))] if v.dtype.kind == "f" else v
        if len(v) == 0:
            return pa.table(
                {
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                    "ints": pa.array([], pa.bool_()),
                }
            )
        all_int = v.dtype.kind in "iu" or bool(np.all(v == np.floor(v)))
        return pa.table(
            {"lo": [float(v.min())], "hi": [float(v.max())], "n": [int(len(v))], "ints": [all_int]}
        )

    ext = ds.map_batches(extent, batch_format="pyarrow").to_pandas()
    if ext.empty or ext["n"].sum() == 0:
        return {q: None for q in qs}
    lo, hi, n = float(ext["lo"].min()), float(ext["hi"].max()), int(ext["n"].sum())
    ranks = {q: _rank_of(q, n) for q in qs}
    if lo == hi:
        return {q: lo for q in qs}

    # integer fast path: buckets == exact values (every batch attested that
    # ALL its values are integral — min/max alone would miss 1.5 in [1, 2])
    int_exact = bool(ext["ints"].all()) and (hi - lo) < buckets
    width = 1.0 if int_exact else (hi - lo) / buckets
    nb = int(hi - lo) + 1 if int_exact else buckets

    # -- pass 2: histogram (non-zero pairs only -> tiny keyed shuffle) ------
    def hist(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, col).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(((v - lo) / width).astype(np.int64), 0, nb - 1)
        ids, cnts = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ids, pa.int64()), "cnt": pa.array(cnts, pa.int64())})

    counts_df = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .sum("cnt")
        .to_pandas()
        .sort_values("bucket")
    )
    bucket_ids = counts_df["bucket"].to_numpy()
    cum = np.cumsum(counts_df["sum(cnt)"].to_numpy())

    out: dict[float, float] = {}
    need: dict[int, list[float]] = {}
    for q, r in ranks.items():
        i = int(np.searchsorted(cum, r))
        bid = int(bucket_ids[i])
        if int_exact:
            val = lo + bid
            out[q] = val
        else:
            need.setdefault(bid, []).append(q)
    if int_exact:
        return out

    # -- pass 3: refine candidate buckets exactly ---------------------------
    cand = sorted(need)
    cand_rows = int(
        counts_df.loc[counts_df["bucket"].isin(cand), "sum(cnt)"].sum()
    )
    if cand_rows > refine_limit:
        raise ValueError(
            f"refine pass would pull {cand_rows} rows (> refine_limit="
            f"{refine_limit}); increase buckets to split the hot bins"
        )
    cand_set = np.asarray(cand, dtype=np.int64)

    def in_candidates(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, col).astype(np.float64)
        ok = ~np.isnan(v)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, nb - 1)
        keep = ok & np.isin(b, cand_set)
        return pa.table({"v": pa.array(v[keep], pa.float64()), "b": pa.array(b[keep], pa.int64())})

    ref = ds.map_batches(in_candidates, batch_format="pyarrow").to_pandas()
    for bid, qlist in need.items():
        base = int(cum[np.searchsorted(bucket_ids, bid)] - counts_df.loc[counts_df["bucket"] == bid, "sum(cnt)"].iloc[0])
        vals = np.sort(ref.loc[ref["b"] == bid, "v"].to_numpy())
        for q in qlist:
            out[q] = float(vals[ranks[q] - base - 1])
    return out


def grouped_quantiles_exact(
    ds,
    col: str,
    qs: list[float],
    by: str,
    *,
    out_col: str = "value",
):
    """Per-group exact quantiles for LOW-CARDINALITY value domains.

    Emits per-batch (by, value, cnt) partials (the map-side combine), sums
    them with one keyed groupby (shuffle bounded by distinct (group, value)
    pairs — for integer document lengths that is |groups| x |lengths|, KB
    not TB), then computes every requested order statistic inside a single
    ``map_groups`` per group. Returns a Dataset with columns
    ``[by, "q", out_col]``.
    """
    qs = sorted(qs)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({by: batch[by], "value": batch[col]})
        g = t.group_by([by, "value"]).aggregate([("value", "count")])
        return g.rename_columns([by, "value", "cnt"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    summed = parts.groupby([by, "value"]).sum("cnt")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value")
        cnt = g["sum(cnt)"].to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        vals = g["value"].to_numpy()
        picks = [vals[int(np.searchsorted(cum, _rank_of(q, n)))] for q in qs]
        return pd.DataFrame({by: [g[by].iloc[0]] * len(qs), "q": qs, out_col: picks})

    return summed.groupby(by).map_groups(per_group, batch_format="pandas")
