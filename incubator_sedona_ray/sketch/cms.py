"""Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable Ray Data
reduction, and the EXACT heavy-hitters query it unlocks.

Exact corpus-wide "tokens/n-grams with count >= T" needs a keyed shuffle of
the whole distinct-gram universe (billions of keys at 100 TB) even after
map-side combine. A CMS is a fixed (depth x width) int64 counter matrix
whose partials merge by element-wise ADDITION, and whose point estimate
NEVER underestimates a true count. That one-sided error is the lever:

1. build the CMS over the pre-combined (key, count) pair stream
   (``text/ngrams.ngram_partials`` — one pair per distinct gram per batch),
   folding per-block partial matrices to one driver-side matrix;
2. broadcast the matrix once and re-stream the pair stream, keeping only
   keys whose CMS estimate >= T — a SUPERSET of the true heavy hitters
   (overestimation can only let extra keys through, never drop one);
3. exact ``groupby(key).sum`` over ONLY the surviving pairs, then the true
   ``>= T`` filter.

The all-to-all exchange shrinks from every distinct key to the candidates
(true heavy hitters + the CMS collision tail — sized by width; depth=4,
width=2^18 is 8 MiB and a ~1e-4 per-key pass-through probability at 1 M
distinct keys). The final output is EXACT, so the DuckDB
``GROUP BY ... HAVING count >= T`` oracle hash-matches it.

Determinism: FNV-1a key hashes (``dedup/ngram.fnv_strings``, no Python
loop) + a murmur-finalizer second stream; same input multiset ->
bit-identical matrix on any cluster shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["CountMinSketch", "cms_partials", "cms_from_pairs", "heavy_hitters_exact"]


def _indices(keys: pa.Array, depth: int, width: int) -> np.ndarray:
    """(n, depth) int64 column indices for each key (fnv_strings first
    stream + the shared murmur-finalizer second stream)."""
    from ..dedup.ngram import fmix64, fnv_strings

    h1 = fnv_strings(keys)
    h2 = fmix64(h1) | np.uint64(1)
    ds_ = np.arange(depth, dtype=np.uint64)[None, :]
    return ((h1[:, None] + ds_ * h2[:, None]) % np.uint64(width)).astype(np.int64)


class CountMinSketch:
    """Immutable (depth x width) int64 matrix; vectorized point queries."""

    def __init__(self, mat: np.ndarray):
        self.mat = np.ascontiguousarray(mat, dtype=np.int64)
        self.depth, self.width = self.mat.shape

    def estimate(self, keys: pa.Array) -> np.ndarray:
        """Upper-bound count per key (min over rows) — never < truth."""
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
        idx = _indices(keys, self.depth, self.width)
        rows = np.arange(self.depth)[None, :]
        return self.mat[rows, idx].min(axis=1)


def _batch_matrix(batch: pa.Table, key_col: str, count_col: str, depth: int, width: int) -> np.ndarray:
    mat = np.zeros((depth, width), dtype=np.int64)
    keys = batch[key_col].combine_chunks() if batch.num_rows else batch[key_col]
    if batch.num_rows == 0:
        return mat
    cnt = batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = _indices(keys, depth, width)
    for d in range(depth):
        np.add.at(mat[d], idx[:, d], cnt)
    return mat


def cms_partials(pairs, key_col: str, count_col: str, *, depth: int = 4, width: int = 1 << 18):
    """Dataset of per-block summed matrices (column: mat binary) — same
    partial/fold shape as sketch/hll.py and sketch/bloom.py."""
    nbytes = depth * width * 8

    def partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, key_col, count_col, depth, width)
        return pa.table({"mat": pa.array([mat.tobytes()], pa.binary(nbytes))})

    def merge_block(batch: pa.Table) -> pa.Table:
        arrs = [np.frombuffer(b, dtype=np.int64) for b in batch["mat"].to_pylist()]
        mat = np.sum(arrs, axis=0, dtype=np.int64) if arrs else np.zeros(depth * width, np.int64)
        return pa.table({"mat": pa.array([mat.tobytes()], pa.binary(nbytes))})

    return pairs.map_batches(partial, batch_format="pyarrow").map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def cms_from_pairs(pairs, key_col: str, count_col: str, *, depth: int = 4, width: int = 1 << 18) -> CountMinSketch:
    """Distributed build -> one CountMinSketch on the driver."""
    parts = cms_partials(pairs, key_col, count_col, depth=depth, width=width).to_pandas()
    arrs = [np.frombuffer(b, dtype=np.int64).reshape(depth, width) for b in parts["mat"]]
    mat = np.sum(arrs, axis=0, dtype=np.int64) if arrs else np.zeros((depth, width), np.int64)
    return CountMinSketch(mat)


def heavy_hitters_exact(
    ds,
    *,
    threshold: int,
    n: int = 1,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1 << 18,
):
    """EXACT n-grams with total count >= threshold, CMS-pruned shuffle.

    Returns a Dataset of (ngram, cnt), cnt >= threshold. Two passes over
    the map-side-combined pair stream (``ngram_partials``); only CMS
    candidates enter the groupby. Ties need no breaking — output is the
    full qualifying set, deterministic by construction.
    """
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..partition.assign import broadcast_map_batches
    from ..text.ngrams import ngram_partials

    pairs = ngram_partials(ds, n=n, text_col=text_col)
    cms = cms_from_pairs(pairs, "ngram", "cnt", depth=depth, width=width)
    cms_ref = _ray.put(cms)

    def keep_candidates(batch: pa.Table, sketch) -> pa.Table:
        est = sketch.estimate(batch["ngram"].combine_chunks() if batch.num_rows else batch["ngram"])
        return batch.filter(pa.array(est >= threshold))

    cand = broadcast_map_batches(pairs, keep_candidates, {"sketch": cms_ref}, batch_size=None)
    summed = cand.groupby("ngram").aggregate(Sum("cnt", alias_name="cnt"))

    def true_hh(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["cnt"], threshold))

    return summed.map_batches(true_hh, batch_format="pyarrow")
