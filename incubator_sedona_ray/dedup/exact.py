"""Exact dedup: sha256(text) -> hash-partitioned groupby -> keep the row
with the minimum id per hash. One shuffle over (hash, id) — payload columns
can be re-attached afterwards by id to keep the exchange slim.

sha256 (not a faster non-crypto hash) so the DuckDB oracle computes the
identical keys (`sha256(text)`)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def add_text_hash_fn(text_col: str = "text", out_col: str = "text_hash"):
    def fn(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.sha256(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(hashes, type=pa.string()))

    return fn


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text", keep_cols: list[str] | None = None):
    """Dataset -> surviving rows (min id per distinct text). Returns columns
    [id_col, text_hash] + keep_cols.

    Fast path (no keep_cols): a native ``groupby.aggregate(Min)`` — partial
    per-block combine + one small shuffle, no per-group Python. With
    keep_cols the representative ROW must survive, so it falls back to
    per-group head(1)."""
    hashed = ds.map_batches(add_text_hash_fn(text_col), batch_format="pyarrow")
    if not keep_cols:
        from ray.data.aggregate import Min

        slim = hashed.select_columns([id_col, "text_hash"])
        return slim.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))

    cols = [id_col, "text_hash"] + keep_cols
    slim = hashed.select_columns(cols)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return slim.groupby("text_hash").map_groups(keep_min, batch_format="pandas")
