"""Deterministic hash-based sampling: uniform and stratified (per-group
rates) over any integer id column.

Training-data pipelines rebalance corpora by language/domain with
*deterministic* per-row sampling (resumable: re-running a failed shard
keeps exactly the same rows — no RNG state to replay). The keep decision
is ``fmix32(id + seed) / 2**32 < rate[stratum]`` where ``fmix32`` is the
MurmurHash3 32-bit finalizer — avalanching, vectorizable as five numpy
uint64 ops per batch, and exactly replayable in ANSI SQL (the oracle runs
the same five ops via HUGEINT multiplies mod 2^32), so the sample is
bit-deterministic across engines.

Scale shape: stateless ``map_batches`` filter — zero shuffles, zero state;
the rates dict is a handful of floats captured in the task closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0x85EBCA6B)
_C2 = np.uint64(0xC2B2AE35)
_MASK32 = np.uint64(0xFFFFFFFF)


def fmix32(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix32 over a uint64 array holding 32-bit values."""
    h = x.astype(np.uint64) & _MASK32
    h ^= h >> np.uint64(16)
    h = (h * _C1) & _MASK32
    h ^= h >> np.uint64(13)
    h = (h * _C2) & _MASK32
    h ^= h >> np.uint64(16)
    return h


def keep_mask(ids: np.ndarray, rate: np.ndarray | float, *, seed: int = 0) -> np.ndarray:
    """Boolean keep mask: fmix32(id + seed) / 2^32 < rate (exact float64)."""
    h = fmix32((ids.astype(np.uint64) + np.uint64(seed)) & _MASK32)
    u = h.astype(np.float64) / 4294967296.0
    return u < rate


def sample_uniform(ds, rate: float, *, id_col: str = "doc_id", seed: int = 0):
    """Dataset -> Dataset keeping ~rate of rows, deterministically by id."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keep_mask(ids, rate, seed=seed)))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_stratified(
    ds,
    rates: dict[str, float],
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
):
    """Dataset -> Dataset with per-stratum keep rates (e.g. language
    rebalancing). Strata absent from ``rates`` keep ``default_rate``."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        strata = batch[strata_col].to_pylist()
        rate = np.fromiter(
            (rates.get(s, default_rate) for s in strata), dtype=np.float64, count=len(strata)
        )
        return batch.filter(pa.array(keep_mask(ids, rate, seed=seed)))

    return ds.map_batches(fn, batch_format="pyarrow")


def fmix32_sql(expr: str, seed: int = 0) -> str:
    """The identical fmix32 pipeline as a DuckDB SQL expression over a
    BIGINT ``expr`` (HUGEINT multiplies keep the 32x32-bit products exact,
    then mod 2^32)."""
    h0 = f"(({expr}) + {seed}) % 4294967296"
    h1 = f"xor({h0}, ({h0}) // 65536)"
    h2 = f"CAST((CAST(({h1}) AS HUGEINT) * {int(_C1)}) % 4294967296 AS BIGINT)"
    h3 = f"xor({h2}, ({h2}) // 8192)"
    h4 = f"CAST((CAST(({h3}) AS HUGEINT) * {int(_C2)}) % 4294967296 AS BIGINT)"
    return f"xor({h4}, ({h4}) // 65536)"
