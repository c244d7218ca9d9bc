"""MinHash + LSH near-duplicate detection.

Standard public pipeline (Broder '97 minhash; LSH banding as in MMDS ch.3):

1. ``map_batches``: per doc, k-char shingles -> ``num_perm`` minhash values
   via universal hashing ``(a*x + b) mod p``; emit one row per LSH band:
   (band_id, band_hash, doc_id). Signatures never leave the batch — only
   the (b x 16-byte) band keys shuffle.
2. ``groupby(band_id, band_hash)``: docs sharing a band bucket are
   candidate pairs (pre-aggregated per batch first is unnecessary — bucket
   rows are tiny).
3. verify candidates with exact shingle Jaccard >= threshold — texts are
   re-attached to pairs with two distributed hash joins, never a driver
   dict.
4. connected components over verified pairs -> keep the min doc id per
   component, via distributed iterative min-label propagation
   (:func:`connected_components_min_label`); survivors come from a
   left-anti hash join. Nothing in the pipeline materializes on the
   driver, so it holds at 100 TB candidate volumes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.blocks import safe_hash_join, scrub_empty_blocks
from .ngram import char_shingles, jaccard

_P = np.uint64((1 << 61) - 1)  # Mersenne prime for universal hashing


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``shingles``: set[int] or uint64 ndarray (the vectorized
    :func:`..ngram.char_shingles_arr` output)."""
    if isinstance(shingles, np.ndarray):
        x = shingles.astype(np.uint64, copy=False)
    else:
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    if len(x) == 0:
        return np.full(len(a), np.uint64(int(_P)), dtype=np.uint64)
    # (a*x + b) mod p, vectorized over (perm, shingle)
    vals = (x[None, :] * a[:, None] + b[:, None]) % _P
    return vals.min(axis=1)


def band_rows_fn(
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 1,
):
    """map_batches stage -> (doc_id, band_id, band_hash) rows.

    Shingling + the band hash are vectorized: FNV over sliding byte windows
    (see ``ngram.char_shingles_arr``), then a deterministic numpy
    mix-and-fold over the (docs x bands x rows) signature cube replaces the
    per-band blake2b calls (python's ``hash()`` is per-process salted and
    must never key a shuffle; this arithmetic hash is process-stable)."""
    from .ngram import char_shingles_arr

    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm, seed)
    _MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix constant (public)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        n = len(texts)
        sigs = np.empty((n, num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(char_shingles_arr(t, shingle_k), a, b)
        cube = sigs.reshape(n, bands, rows_per_band)
        h = np.full((n, bands), _FNV_BAND_OFFSET, dtype=np.uint64)
        for j in range(rows_per_band):
            h = (h ^ cube[:, :, j]) * _FNV_BAND_PRIME
            h ^= h >> np.uint64(33)
            h *= _MIX
        return pa.table(
            {
                id_col: np.repeat(ids, bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_hash": (h.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
            }
        )

    return fn


_FNV_BAND_OFFSET = np.uint64(14695981039346656037)
_FNV_BAND_PRIME = np.uint64(1099511628211)


def star_pairs_by_bucket(
    banded,
    bucket_cols: list[str],
    id_col: str,
    num_parts: int,
    carry_col: str | None = None,
):
    """Star pairs (bucket-min id ``a`` -> every other member ``b``) for every
    multi-member bucket, WITHOUT one Python call per bucket: buckets are
    hashed into ``num_parts`` coarse groups and each group's kernel finds
    all bucket boundaries with one lexsort — Python-call count is O(parts),
    not O(distinct buckets) (at web scale nearly every bucket is a
    singleton, so per-bucket ``map_groups`` is pure overhead).

    ``carry_col`` (optional, int64 values) is returned alongside as
    ``carry_a`` / ``carry_b`` (the bucket-first row's and the member row's
    value) for kernels that verify against the representative, e.g. simhash
    hamming distance."""

    def add_part(t: pa.Table) -> pa.Table:
        key = t[bucket_cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in bucket_cols[1:]:
            key = key * np.int64(1000003) + t[c].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (key % num_parts + num_parts) % num_parts
        return t.append_column("bpart", pa.array(part.astype(np.int32)))

    def kernel(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = [g[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in bucket_cols]
        order = np.lexsort((ids, *reversed(keys)))
        ids = ids[order]
        keys = [k[order] for k in keys]
        first = np.empty(len(ids), dtype=bool)
        first[:1] = True
        if len(ids) > 1:
            first[1:] = np.zeros(len(ids) - 1, dtype=bool)
            for k in keys:
                first[1:] |= k[1:] != k[:-1]
        grp = np.cumsum(first) - 1
        a_all = ids[np.flatnonzero(first)][grp]  # bucket-first id per row
        member = ~first
        cols = {"a": pa.array(a_all[member], type=pa.int64()), "b": pa.array(ids[member], type=pa.int64())}
        if carry_col is not None:
            cv = g[carry_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            cols["carry_a"] = pa.array(cv[np.flatnonzero(first)][grp][member], type=pa.int64())
            cols["carry_b"] = pa.array(cv[member], type=pa.int64())
        return pa.table(cols)

    parted = banded.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("bpart").map_groups(kernel, batch_format="pyarrow")


def _default_join_partitions() -> int:
    """Join/aggregator parallelism sized to the cluster: each hash-join
    partition is backed by an aggregator actor, so asking for more
    partitions than CPUs on a small session just thrashes worker processes
    (and two cascaded joins at 16 partitions can stall a 4-CPU session)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(64, cpus // 2))


def connected_components_min_label(pairs, *, a_col: str = "a", b_col: str = "b", num_partitions: int | None = None, max_rounds: int = 50):
    """Distributed connected components over an edge Dataset via iterative
    min-label propagation (the standard BSP/Pregel formulation): every node
    starts labeled with itself; each round every node takes the min of its
    own label and its neighbors' labels (one hash join + one groupby-min).
    Labels decrease monotonically, so an unchanged label SUM certifies
    convergence — no driver-side edge list, no union-find.

    Returns a Dataset (node, label) where label is the component's min id.
    Rounds needed = graph diameter; near-dup clusters are stars/cliques, so
    2-3 rounds in practice."""
    import ray
    from ray.data.aggregate import Min, Sum

    if num_partitions is None:
        num_partitions = _default_join_partitions()

    def sym(t: pa.Table) -> pa.Table:
        x = pa.concat_arrays([t[a_col].combine_chunks(), t[b_col].combine_chunks()])
        y = pa.concat_arrays([t[b_col].combine_chunks(), t[a_col].combine_chunks()])
        return pa.table({"x": x, "y": y})

    # pairs may itself be join-derived (minhash/simhash verify chains):
    # scrub schema-less empty partition blocks before the join loop
    edges = scrub_empty_blocks(
        pairs.map_batches(sym, batch_format="pyarrow"),
        schema=pa.schema([("x", pa.int64()), ("y", pa.int64())]),
    )

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["x"], "cand": t["x"]})

    _label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    labels = scrub_empty_blocks(
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node").aggregate(Min("cand"))
        .map_batches(lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"),
        schema=_label_schema,
    )
    prev_sum = None
    for _ in range(max_rounds):
        msgs = (
            safe_hash_join(edges, labels, "inner", num_partitions, on=("x",), right_on=("node",))
            .map_batches(lambda t: pa.table({"node": t["y"], "cand": t["label"]}), batch_format="pyarrow")
        )
        own = labels.map_batches(lambda t: pa.table({"node": t["node"], "cand": t["label"]}), batch_format="pyarrow")
        # the join/aggregate emit SCHEMA-LESS empty blocks for empty hash
        # partitions; they'd crash the NEXT round's join (state/blocks.py)
        # — drop them by ref, zero copy
        labels = scrub_empty_blocks(
            own.union(msgs)
            .groupby("node").aggregate(Min("cand"))
            .map_batches(lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"),
            schema=_label_schema,
        )
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def minhash_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 1,
    num_partitions: int | None = None,
    scrub_input: bool = True,
):
    """Returns (survivors, dup_pairs) as DATASETS: surviving doc ids after
    near-dup removal, and the verified duplicate pairs (a < b, jaccard).

    ``scrub_input=False`` skips the defensive empty-block scrub /
    materialization of ``ds``-derived join sides: pass it when ``ds``
    streams from a fresh source (``read_parquet`` / ``map_batches``) —
    the verification joins then consume the corpus fully streaming, which
    is the 100 TB-scale path. Leave True for join-derived inputs, which
    can carry the schema-less empty blocks that crash Ray 2.49's
    hash-shuffle joins (state/blocks.py).

    Every stage is distributed — no candidate list, text dict, or
    union-find ever lands on the driver:

    * candidate pairs: banded LSH groupby, star-pairs per bucket,
      distributed pair-dedup (groupby count).
    * verify: two hash joins re-attach both texts to each pair; exact
      shingle-Jaccard runs per joined row inside map_batches.
    * components: :func:`connected_components_min_label` (join + groupby
      rounds). Survivors = left-anti join of all ids against dropped ids.
    """
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    banded = ds.map_batches(
        band_rows_fn(id_col, text_col, num_perm, bands, shingle_k, seed),
        batch_format="pyarrow",
    )

    # star pairs around each bucket's min id — enough for connected
    # components, avoids quadratic blowup on giant buckets; vectorized
    # across buckets (no per-bucket Python)
    cand = star_pairs_by_bucket(
        banded, ["band_id", "band_hash"], id_col, num_parts=num_partitions * 4
    )
    # distributed pair dedup (a star pair can surface from many bands)
    cand = (
        cand.groupby(["a", "b"]).count()
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
        .materialize()
    )
    # scrub: ``ds`` may be join-derived (e.g. dedup_exact keep_cols output)
    # and carry schema-less empty blocks; if one races to be the FIRST
    # block entering the survivors join's shuffle, the schema broadcast is
    # empty and the join crashes (state/blocks.py). With scrub_input=False
    # (fresh-source corpus) the ids stay a lazy streaming projection.
    all_ids = ds.select_columns([id_col])
    if scrub_input:
        all_ids = scrub_empty_blocks(all_ids, schema=pa.schema([(id_col, pa.int64())]))
    if cand.count() == 0:
        import ray

        empty_pairs = ray.data.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")}))
        return all_ids, empty_pairs

    # verify: hash-join texts onto both endpoints, then exact jaccard per row
    docs = ds.select_columns([id_col, text_col])
    j1 = safe_hash_join(
        cand, docs, "inner", num_partitions, on=("a",), right_on=(id_col,), right_suffix="_ra",
        scrub_right=scrub_input,
    )
    j1 = j1.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    j2 = safe_hash_join(
        j1, docs, "inner", num_partitions, on=("b",), right_on=(id_col,), right_suffix="_rb",
        scrub_right=scrub_input,
    )

    def verify(t: pa.Table) -> pa.Table:
        from .ngram import char_shingles_arr, jaccard_arr

        ta = t["text_a"].to_pylist()
        tb = t[text_col].to_pylist()
        jac = np.array(
            [jaccard_arr(char_shingles_arr(x, shingle_k), char_shingles_arr(y, shingle_k)) for x, y in zip(ta, tb)]
        ) if t.num_rows else np.empty(0)
        keep = jac >= threshold
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": lo[keep], "b": hi[keep], "jaccard": jac[keep]})

    pairs = j2.map_batches(verify, batch_format="pyarrow").materialize()
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
    # survivors is a JOIN output handed back to user pipelines that may
    # join it again (e.g. re-attaching payload rows) — scrub the
    # schema-less empty partition blocks it may carry (state/blocks.py)
    survivors = scrub_empty_blocks(survivors, schema=pa.schema([(id_col, pa.int64())]))
    return survivors, pairs
