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


def mixture_rates(
    ds,
    *,
    strata_col: str = "lang",
    tokens_col: str = "n_tokens",
    budget_num: int = 1,
    budget_den: int = 4,
) -> dict[str, float]:
    """Per-stratum keep rates that rebalance a corpus to EQUAL token share
    per stratum under a total budget of ``budget_num/budget_den`` of the
    corpus tokens — the training-mixture step (cf. The Pile / Llama data
    recipes, expressed as deterministic hash sampling so it is resumable
    and SQL-replayable).

    One tiny groupby over map-side token partials computes per-stratum
    totals; the integer target ``total * num // (den * k)`` and the float
    ``min(1.0, target / tok)`` use one fixed expression each, so the SQL
    oracle computing the identical formula gets bit-identical rates (and
    therefore, through the fmix32 threshold, the identical sample)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "s": t[strata_col].to_pylist(),
                "v": t[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("s", sort=False)["v"].sum().reset_index()
        return pa.table(
            {
                strata_col: pa.array(g["s"], type=pa.string()),
                "tok": pa.array(g["v"].to_numpy(), type=pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(strata_col)
        .aggregate(Sum("tok", alias_name="tok"))
        .to_pandas()
    )  # O(strata) rows
    toks = dict(zip(totals[strata_col], totals["tok"].astype(int)))
    total = sum(toks.values())
    k = len(toks)
    if k == 0:
        return {}
    target = total * budget_num // (budget_den * k)  # integer, exact
    return {s: min(1.0, float(target) / float(t)) for s, t in toks.items() if t > 0}


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


def sample_fixed_k(ds, k: int, *, id_col: str = "doc_id", seed: int = 0):
    """EXACT-size uniform sample of k rows, deterministic and mergeable
    (hash-key reservoir, Efraimidis-Spirakis with fmix32 priorities): rank
    every row by ``fmix32(id + seed)`` (a 32-bit BIJECTION — uniform and
    collision-free over int ids), keep the k smallest. The k-smallest set
    is a mergeable reduction: local top-k per batch, one single-group merge
    — zero shuffles, O(batches x k) exchanged.

    Replayable in SQL as ``ORDER BY fmix32(id), id LIMIT k`` (see
    :func:`fmix32_sql`), so the sample is bit-identical across engines and
    across resumed/re-run shards.
    """

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = fmix32((ids.astype(np.uint64) + np.uint64(seed)) & _MASK32)
        order = np.lexsort((ids, h))[:k]
        return batch.take(order).append_column("_h", pa.array(h[order].astype(np.int64)))

    def merge(df):
        out = df.sort_values(["_h", id_col], kind="mergesort").head(k)
        return out.drop(columns=["_h", "_g"]).reset_index(drop=True)

    import pandas as _pd

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return (
        local.add_column("_g", lambda b: _pd.Series(np.zeros(len(b), dtype=np.int64)))
        .groupby("_g")
        .map_groups(merge, batch_format="pandas")
    )


def sample_fixed_k_per_group(
    ds, k: int, *, group_col: str = "lang", id_col: str = "doc_id", seed: int = 0
):
    """Exactly k rows PER GROUP (min(k, group size)), same deterministic
    fmix32 priorities. Local per-(batch, group) top-k partials shrink the
    keyed shuffle to O(batches x groups x k) rows; one ``map_groups`` per
    group finishes the merge. SQL replica: ``row_number() OVER (PARTITION
    BY group ORDER BY fmix32(id), id) <= k``."""

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = fmix32((ids.astype(np.uint64) + np.uint64(seed)) & _MASK32)
        grp = np.asarray(batch[group_col].to_pylist(), dtype=object)
        order = np.lexsort((ids, h, grp))  # group-major, then priority
        g_sorted = grp[order]
        starts = np.r_[0, np.nonzero(g_sorted[1:] != g_sorted[:-1])[0] + 1]
        rank_in_group = np.arange(len(order)) - np.repeat(starts, np.diff(np.r_[starts, len(order)]))
        keep = order[rank_in_group < k]
        return batch.take(keep).append_column("_h", pa.array(h[keep].astype(np.int64)))

    def merge(df):
        out = df.sort_values(["_h", id_col], kind="mergesort").head(k)
        return out.drop(columns=["_h"]).reset_index(drop=True)

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby(group_col).map_groups(merge, batch_format="pandas")
