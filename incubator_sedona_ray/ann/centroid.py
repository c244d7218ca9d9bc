"""Grouped vector mean (embedding centroids per class/cluster/language) as
a mergeable map-side reduction — the aggregation behind cluster summaries,
class prototypes, and diversity scoring over embedding corpora.

Scale shape: each batch collapses to at most ``n_groups x dim`` partial
rows (group, dim, sum, count) inside ``map_batches`` — the shuffle that
follows moves partials, never vectors, so a 100 TB embedding table reduces
through a few-thousand-row groupby.

Determinism contract: with ``quantize_bits`` set, every float32 component
is floored to a fixed-point int64 grid (``floor(x * 2^bits)`` — float32 →
float64 is exact and the scale is a power of two, so the quantization
itself is exact arithmetic) and all summation is int64 — order-independent
and bit-equal to a SQL engine running the same formula. One float64
division finalizes. With ``quantize_bits=None`` the sums are float64
(true mean, summation-order low-bit drift — fine for ML use, not for a
bit-exact oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, dim) float64 from a list<float> column; rejects ragged/null."""
    col = batch[vec_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        raise ValueError(f"{vec_col} contains nulls")
    offs = np.asarray(col.offsets, dtype=np.int64)
    lens = np.diff(offs)
    if len(lens) == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError(f"{vec_col} is ragged: lengths {np.unique(lens)}")
    # flatten() already honors any slice offset: it returns exactly the
    # child values the list rows reference
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if len(flat) != len(lens) * dim:
        raise ValueError(f"{vec_col}: flattened length mismatch")
    return flat.reshape(-1, dim)


def grouped_vector_mean(
    ds,
    group_col: str,
    vec_col: str,
    *,
    quantize_bits: int | None = None,
):
    """Dataset(group_col, dim, centroid:float64, n:int64) — the per-group
    element-wise mean of ``vec_col``, one row per (group, dimension)."""
    from ray.data.aggregate import Sum

    scale = float(1 << quantize_bits) if quantize_bits is not None else None

    def partial(t: pa.Table) -> pa.Table:
        m = _batch_vectors(t, vec_col)
        g = t[group_col].to_numpy(zero_copy_only=False)
        if m.size == 0:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.int64()),
                    "dim": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.int64() if scale else pa.float64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        dim = m.shape[1]
        u, inv = np.unique(g, return_inverse=True)
        if scale is not None:
            q = np.floor(m * scale).astype(np.int64)
            acc = np.zeros((len(u), dim), dtype=np.int64)
        else:
            q = m
            acc = np.zeros((len(u), dim), dtype=np.float64)
        np.add.at(acc, inv, q)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        gg = np.repeat(u.astype(np.int64), dim)
        dd = np.tile(np.arange(dim, dtype=np.int64), len(u))
        return pa.table(
            {
                group_col: pa.array(gg),
                "dim": pa.array(dd),
                "s": pa.array(acc.ravel()),
                "n": pa.array(np.repeat(cnt, dim)),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = s / (n * scale) if scale is not None else s / n
        return pa.table(
            {
                group_col: t[group_col].cast(pa.int64()),
                "dim": t["dim"].cast(pa.int64()),
                "centroid": pa.array(c, type=pa.float64()),
                "n": t["n"].cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .map_batches(finalize, batch_format="pyarrow")
    )
