"""Mergeable moment statistics (count / sum / sum-of-squares -> mean, var)
over integer columns, exact and bit-reproducible.

Float summation is order-dependent, so a distributed AVG/VAR over doubles
can never bit-match a single-node engine. Over INTEGER columns the moment
partials (n, sum x, sum x^2) are exact int64 arithmetic in any order; the
final mean/variance derive from those integers with ONE fixed float64
expression, so the result is bit-identical to any engine that evaluates
the same expression (the DuckDB oracles do exactly that instead of using
their own AVG/VAR aggregates).

Scale shape: per-batch ``pyarrow`` group-by partials (map-side combine),
then one keyed groupby-sum over O(batches x groups) tiny rows.
``sum x^2`` stays within int64 for values up to ~3e9 rows of 1e6-squared
magnitudes — asserted, not assumed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["grouped_moments"]

_I64_MAX = np.iinfo(np.int64).max


def grouped_moments(ds, col: str, by: str):
    """Dataset of (by, n, s1, s2, mean, var_pop) — exact integer partials,
    one fixed float64 finalization."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and (np.abs(v.astype(np.float64)) > np.sqrt(_I64_MAX / max(len(v), 1))).any():
            raise OverflowError(f"{col} values too large for exact int64 sum-of-squares")
        t = pa.table(
            {
                by: batch[by],
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
                "s1": pa.array(v),
                "s2": pa.array(v * v),
            }
        )
        g = t.group_by(by).aggregate([("n", "sum"), ("s1", "sum"), ("s2", "sum")])
        return g.rename_columns([by, "n", "s1", "s2"])

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .sum(["n", "s1", "s2"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        s1 = batch["sum(s1)"].to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = batch["sum(s2)"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        s1f = s1.astype(np.float64)
        mean = s1f / nf
        var = (s2.astype(np.float64) - (s1f * s1f) / nf) / nf
        return pa.table(
            {
                by: batch[by],
                "n": pa.array(n),
                "s1": pa.array(s1),
                "s2": pa.array(s2),
                "mean": pa.array(mean, pa.float64()),
                "var_pop": pa.array(var, pa.float64()),
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")
