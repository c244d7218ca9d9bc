"""Hash-bucketed keyed group-sum — the repo's standard workaround for Ray
2.49's slow native aggregate over millions of distinct STRING keys.

Pattern (measured ~20x cheaper at 2M pages / 4M distinct bigrams, see
text/ngrams.py): tag every partial row with ``fnv(key) % num_buckets``,
``groupby(bucket)`` (a coarse-key sort exchange), and finish each bucket
with a pandas C-speed group-sum. Every key lands wholly in one bucket, so
per-bucket sums are exact.

This is the shared extraction of the kernel previously copied across
text/ngrams.py, text/bpe.py, text/backoff_lm.py, dedup/ssjoin.py and
dedup/spans.py (those keep their local variants — some fuse extra work
like top-k into the bucket kernel); new call sites should use this one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bucketed_group_sum", "default_num_buckets"]


def default_num_buckets() -> int:
    try:
        import ray as _ray

        return max(2, int(_ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 8


def bucketed_group_sum(ds, key_col: str, val_cols: list[str], *, num_buckets: int | None = None):
    """Dataset of partial (key, v1, v2, ...) rows -> Dataset of exact
    per-key sums, same column names. ``key_col`` must be a string column."""
    from ..dedup.ngram import fnv_strings

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        col = t[key_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        b = (fnv_strings(col) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_b", pa.array(b))

    def bucket_sum(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_col: g[key_col].to_pylist()})
        for v in val_cols:
            df[v] = g[v].to_numpy(zero_copy_only=False)
        agg = df.groupby(key_col, sort=False)[val_cols].sum().reset_index()
        cols = {key_col: pa.array(agg[key_col].to_numpy(), pa.string())}
        for v in val_cols:
            cols[v] = pa.array(agg[v].to_numpy(), pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )
