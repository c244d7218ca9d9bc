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


def dedup_incremental(
    ds,
    seen_hashes,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "auto",
    num_partitions: int | None = None,
    broadcast_max_hashes: int = 100_000_000,
):
    """Recrawl/incremental exact dedup: drop rows whose sha256(text) already
    exists in a prior corpus snapshot.

    ``seen_hashes`` is either a Dataset with a ``text_hash`` column (the
    prior snapshot's hash manifest) or any iterable of hex digests.

    ``mode="broadcast"``: the seen set collapses to ONE sorted numpy array
    of hex digests shipped once (``ray.put``) and membership is a
    vectorized ``searchsorted`` per batch — the new corpus streams with
    ZERO shuffles. Right up to ~10^8-10^9 seen hashes (GBs of digests);
    past that use ``mode="join"``: a distributed left-anti hash join on
    the hash column (one shuffle each side, unbounded seen set). Same
    pattern pair as text/decontam.py. ``mode="auto"`` (default) picks by
    the seen snapshot's size: broadcast iff ``seen.count()`` (one cheap
    metadata pass) is at most ``broadcast_max_hashes`` — the same shape
    as the join auto-broadcast heuristic (VERDICT r03 #5).
    """
    import numpy as np

    hashed = ds.map_batches(add_text_hash_fn(text_col), batch_format="pyarrow")
    if mode == "auto":
        if hasattr(seen_hashes, "map_batches"):
            mode = "broadcast" if seen_hashes.count() <= broadcast_max_hashes else "join"
        else:
            mode = "broadcast"  # an in-memory iterable is already driver-sized
    if mode == "join":
        from ..state.blocks import safe_hash_join

        if num_partitions is None:
            # Ray's JoinOperator reserves actors per partition group — a fixed
            # large count deadlocks small clusters (seen: 64 parts @ 4 CPUs).
            try:
                import ray as _r

                num_partitions = max(2, int(_r.cluster_resources().get("CPU", 4)) // 2)
            except Exception:
                num_partitions = 4

        if not hasattr(seen_hashes, "map_batches"):
            import ray as _ray

            seen_hashes = _ray.data.from_arrow(
                pa.table({"text_hash": pa.array(sorted(set(seen_hashes)), type=pa.string())})
            )
        seen = seen_hashes.select_columns(["text_hash"])
        return safe_hash_join(
            hashed, seen, "left_anti", num_partitions, on=("text_hash",),
        )
    if mode != "broadcast":
        raise ValueError(f"mode must be 'broadcast' or 'join', got {mode!r}")

    import ray as _ray

    if hasattr(seen_hashes, "map_batches"):
        seen_list = seen_hashes.select_columns(["text_hash"]).to_pandas()["text_hash"].to_numpy()
    else:
        seen_list = np.asarray(list(seen_hashes), dtype=object)
    seen_arr = np.sort(np.unique(seen_list.astype("U64")))
    seen_ref = _ray.put(seen_arr)

    def keep_unseen(batch: pa.Table, seen_sorted) -> pa.Table:
        h = np.asarray(batch["text_hash"].to_pylist(), dtype="U64")
        idx = np.searchsorted(seen_sorted, h)
        idx_c = np.minimum(idx, len(seen_sorted) - 1) if len(seen_sorted) else idx
        member = (seen_sorted[idx_c] == h) if len(seen_sorted) else np.zeros(len(h), bool)
        return batch.filter(pa.array(~member))

    from ..partition.assign import broadcast_map_batches

    return broadcast_map_batches(hashed, keep_unseen, {"seen_sorted": seen_ref})
