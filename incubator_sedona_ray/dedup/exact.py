"""Exact dedup: sha256(text) -> hash-partitioned groupby -> keep the row
with the minimum id per hash. One shuffle over (hash, id) — payload columns
can be re-attached afterwards by id to keep the exchange slim.

sha256 (not a faster non-crypto hash) so the DuckDB oracle computes the
identical keys (`sha256(text)`)."""

from __future__ import annotations

import hashlib

import pyarrow as pa


def add_text_hash_fn(text_col: str = "text", out_col: str = "text_hash"):
    def fn(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.sha256(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(hashes, type=pa.string()))

    return fn


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text", keep_cols: list[str] | None = None):
    """Dataset -> surviving rows (min id per distinct text). Returns columns
    [id_col, text_hash] + keep_cols.

    Both paths are per-group-Python-free: a native ``groupby.aggregate(Min)``
    (partial per-block combine + one small shuffle) picks the surviving id
    per hash; with keep_cols the representative ROW is then re-attached by
    a distributed hash join on ``id_col`` (``join/payload.py``) — two slim
    exchanges instead of one Python call per distinct document."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_text_hash_fn(text_col), batch_format="pyarrow")
    slim = hashed.select_columns([id_col, "text_hash"])
    survivors = slim.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))
    if not keep_cols:
        return survivors

    from ..join.payload import attach_payload

    payload = hashed.select_columns([id_col] + keep_cols)
    return attach_payload(
        survivors, payload, key=id_col, payload_key=id_col, strategy="hash"
    )
