"""Embedding-cosine near-duplicate detection.

Pairs with cosine similarity >= threshold. Candidate generation via
random-hyperplane LSH buckets (sign bits of R projections) so only
bucket-local pairs are compared; exact cosine verify. With ``brute=True``
(small tables / oracle parity) all pairs are compared via one blocked
matmul against the broadcast normalized matrix."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..partition.assign import resolve_ref


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embedding_dedup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    brute: bool = False,
):
    """Returns the verified duplicate pairs as a DATASET (a < b ids,
    ``cosine >= threshold``) — never a driver DataFrame: on a
    duplicate-heavy corpus the pair set itself is unbounded, so it stays
    in the object store end-to-end (VERDICT r02 #3). Callers that need a
    local frame on a known-small result call ``.to_pandas()`` themselves.

    ``brute=True`` (small tables / oracle parity) compares all pairs with
    one dense matmul on the driver — O(n^2), test-scale only."""
    if brute:
        df = ds.select_columns([id_col, vec_col]).to_pandas()
        ids = df[id_col].to_numpy()
        m = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        sim = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        # ids may be unsorted; emit canonical a<b by value
        a = ids[iu[0][mask]]
        b = ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a": lo, "b": hi, "cosine": sim[iu][mask]})
        out = out.sort_values(["a", "b"]).reset_index(drop=True)
        return ray.data.from_pandas(out)

    rng = np.random.default_rng(seed)
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    planes_ref = ray.put(rng.standard_normal((dim, n_planes)))

    def bucket(batch: pa.Table, planes) -> pa.Table:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        bits = (_normalize(m) @ planes) > 0
        key = np.zeros(len(m), dtype=np.int64)
        for j in range(bits.shape[1]):
            key |= bits[:, j].astype(np.int64) << j
        return pa.table({id_col: batch[id_col], "bucket": key, vec_col: batch[vec_col]})

    from ..partition.assign import broadcast_map_batches

    bucketed = broadcast_map_batches(ds.select_columns([id_col, vec_col]), bucket, {"planes": planes_ref})

    cap = 4096  # max rows for a dense all-pairs matmul inside one bucket

    def _emit(ids, m, sim_mask_pairs):
        a, b, cos = sim_mask_pairs
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": cos})

    def _pairs_recursive(ids: np.ndarray, m: np.ndarray, depth: int) -> list[pd.DataFrame]:
        """Bucket-size guard: an over-capacity bucket (skewed data — e.g.
        millions of identical vectors land in ONE LSH bucket) is split
        recursively with extra hyperplanes; a bucket that refuses to split
        (identical sign patterns) emits verified STAR pairs around its min
        id — O(n) output that still connects the duplicate component,
        instead of an O(n^2) dense matmul."""
        if len(ids) < 2:
            return []
        if len(ids) <= cap:
            sim = m @ m.T
            iu = np.triu_indices(len(ids), k=1)
            mask = sim[iu] >= threshold
            return [_emit(ids, m, (ids[iu[0][mask]], ids[iu[1][mask]], sim[iu][mask]))]
        if depth >= 4:
            i0 = int(np.argmin(ids))
            cos = m @ m[i0]
            mask = (cos >= threshold) & (np.arange(len(ids)) != i0)
            return [_emit(ids, m, (np.full(int(mask.sum()), ids[i0]), ids[mask], cos[mask]))]
        sub_rng = np.random.default_rng((seed, depth, len(ids)))
        p = sub_rng.standard_normal((m.shape[1], 8))
        bits = (m @ p) > 0
        key = np.zeros(len(ids), dtype=np.int64)
        for j in range(8):
            key |= bits[:, j].astype(np.int64) << j
        out: list[pd.DataFrame] = []
        for k in np.unique(key):
            sel = key == k
            out.extend(_pairs_recursive(ids[sel], m[sel], depth + 1))
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"), "cosine": pd.Series([], dtype="float64")})
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        frames = _pairs_recursive(ids, m, 0)
        if not frames:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"), "cosine": pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    from ray.data.aggregate import Max

    # distributed pair dedup (a pair can surface from several buckets with
    # the same cosine) — the deduped pairs STAY a Dataset; scrub the
    # schema-less empty blocks the groupby can emit so downstream joins
    # (components / survivors) never see them
    from ..state.blocks import scrub_empty_blocks

    pairs = (
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"]).aggregate(Max("cosine", alias_name="cosine"))
    )
    return scrub_empty_blocks(
        pairs,
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]),
    )


def embedding_dedup_survivors(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    brute: bool = False,
    num_partitions: int | None = None,
    scrub_input: bool = True,
):
    """(survivors, pairs) DATASETS — the minhash-style tail for embedding
    near-dups: connected components over the verified pairs via
    distributed min-label propagation, keep each component's min id,
    survivors = left-anti join of all ids against dropped ids. Mirrors
    :func:`..minhash.minhash_dedup`; nothing lands on the driver.

    ``scrub_input=False``: keep the ``ds``-derived id side streaming
    (fresh-source corpora; see minhash_dedup)."""
    from ..state.blocks import safe_hash_join, scrub_empty_blocks
    from .minhash import _default_join_partitions, connected_components_min_label

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    pairs = embedding_dedup(
        ds, id_col, vec_col, threshold=threshold, n_planes=n_planes, seed=seed, brute=brute
    )
    all_ids = ds.select_columns([id_col])
    if scrub_input:
        all_ids = scrub_empty_blocks(all_ids, schema=pa.schema([(id_col, pa.int64())]))
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return all_ids, pairs
    labels = connected_components_min_label(pairs, num_partitions=num_partitions)
    dropped = labels.map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["node"], t["label"])).select(["node"]),
        batch_format="pyarrow",
    )
    survivors = safe_hash_join(
        all_ids, dropped, "left_anti", num_partitions, on=(id_col,), right_on=("node",),
        scrub_left=scrub_input,
    )
    survivors = scrub_empty_blocks(survivors, schema=pa.schema([(id_col, pa.int64())]))
    return survivors, pairs
