"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a mergeable
Ray Data reduction.

COUNT(DISTINCT) at 100 TB is otherwise a full keyed shuffle of every
distinct value; an HLL sketch replaces it with a fixed 2^p-byte register
array whose partials merge by element-wise max — the canonical mergeable
aggregate. Standard error ~= 1.04 / sqrt(2^p) (p=12 -> ~1.6%).

Pipeline shape:

* ``hll_partials``  — one ``map_batches`` emitting ONE register-array row
  per batch (values deduped with ``np.unique`` first, hashed with
  sha256-derived 64-bit values so the sketch is deterministic across runs
  and machines — no seeded process-local hashing).
* tree merge        — a second ``map_batches`` with ``batch_size=None``
  folds each block's partial rows into one row (register max), so the
  driver folds only O(#blocks) rows of 2^p bytes each.
* ``hll_estimate``  — classic bias-corrected estimator with the
  small-range linear-counting correction (the 64-bit hash makes the
  large-range collision correction unnecessary).

Determinism contract: same input multiset -> bit-identical registers ->
identical estimate, which is what lets tests pin the estimate as a golden
value and assert the error bound against the exact count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["hll_partials", "hll_estimate", "hll_count_distinct", "hll_count_distinct_by_group"]


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hashes of string/bytes values (first 8 bytes of
    sha256). Python loop over the (already deduped) batch values — bounded
    by distinct-per-batch, not rows."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = v if isinstance(v, bytes) else str(v).encode("utf-8")
        out[i] = np.frombuffer(hashlib.sha256(b).digest()[:8], dtype=np.uint64)[0]
    return out


def _registers_of(values: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(np.unique(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining (64-p) bits, +1; the pad makes
    # the all-zero tail impossible, capping rank at 64-p+1 automatically.
    # Exact vectorized CLZ (float log2 rounds up near powers of two >2^53):
    sh = np.zeros(len(rest), dtype=np.int64)
    x = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        y = x >> np.uint64(s)
        nzm = y != np.uint64(0)
        x = np.where(nzm, y, x)
        sh += s * nzm.astype(np.int64)
    rank = (64 - sh).astype(np.uint8)  # = clz + 1 = (63 - sh) + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_partials(ds, col: str, *, p: int = 12):
    """Dataset of merged per-block register rows (columns: regs binary)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        v = v[~(v == None)]  # noqa: E711  (drop nulls)
        regs = _registers_of(v, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary(m))})

    def merge_block(batch: pa.Table) -> pa.Table:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in batch["regs"].to_pylist()]
        regs = np.maximum.reduce(arrs) if arrs else np.zeros(m, dtype=np.uint8)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary(m))})

    return ds.map_batches(partial, batch_format="pyarrow").map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate from a dense register array."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return float(est)


def hll_count_distinct(ds, col: str, *, p: int = 12) -> float:
    """End-to-end: partials -> O(#blocks) driver fold -> estimate."""
    m = 1 << p
    parts = hll_partials(ds, col, p=p).to_pandas()
    arrs = [np.frombuffer(b, dtype=np.uint8) for b in parts["regs"]]
    regs = np.maximum.reduce(arrs) if arrs else np.zeros(m, dtype=np.uint8)
    return hll_estimate(regs)


def hll_count_distinct_by_group(ds, col: str, by: str, *, p: int = 12):
    """Per-group HLL estimates: one register row per (batch, group) partial
    (map-side combine), one keyed groupby merge over O(batches x groups)
    4 KB rows, estimates finalized inside the group task. Returns a Dataset
    of (by, estimate)."""
    import pandas as pd

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        grps = np.asarray(batch[by].to_pylist(), dtype=object)
        if len(grps) == 0:
            return pa.table({by: pa.array([], pa.string()), "regs": pa.array([], pa.binary(m))})
        order = np.argsort(grps, kind="mergesort")
        g_sorted, v_sorted = grps[order], vals[order]
        starts = np.r_[0, np.nonzero(g_sorted[1:] != g_sorted[:-1])[0] + 1]
        ends = np.r_[starts[1:], len(g_sorted)]
        regs, keys = [], []
        for s, e in zip(starts, ends):
            keys.append(g_sorted[s])
            regs.append(_registers_of(v_sorted[s:e], p).tobytes())
        return pa.table({by: pa.array(keys, pa.string()), "regs": pa.array(regs, pa.binary(m))})

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce([np.frombuffer(b, dtype=np.uint8) for b in df["regs"]])
        return pd.DataFrame({by: [df[by].iloc[0]], "estimate": [hll_estimate(regs)]})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(merge_group, batch_format="pandas")
    )
