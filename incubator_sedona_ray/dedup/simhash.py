"""64-bit SimHash near-dup (Charikar '02 / Manku et al. '07).

Per doc: token FNV hashes vote per bit -> 64-bit fingerprint. Candidates =
docs sharing any of 4 16-bit bands (catches all pairs with hamming distance
<= 3); verify by exact hamming distance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ngram import fnv_tokens


def simhash64(text: str) -> int:
    """Vectorized: all token hashes at once (``fnv_tokens``), then one
    (tokens x 64) bit-vote — no per-token Python work."""
    tokens = [t.encode() for t in text.lower().split()]
    if not tokens:
        return 0
    h = fnv_tokens(tokens)
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    fp = np.uint64(0)
    pos = np.nonzero(acc > 0)[0]
    for i in pos:
        fp |= np.uint64(1) << np.uint64(i)
    return int(fp)


def simhash_batch_fn(id_col: str = "doc_id", text_col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        fps = np.array([simhash64(t) for t in batch[text_col].to_pylist()], dtype=np.uint64)
        out = {id_col: batch[id_col], "simhash": pa.array(fps.view(np.int64))}
        return pa.table(out)

    return fn


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    # vectorized popcount: bytes -> unpacked bits -> per-value sum
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3, scrub_input: bool = True):
    """Returns (survivors, pairs) as DATASETS. Band-bucket candidates,
    verify by hamming distance <= max_hamming, drop non-min ids per
    component — components via distributed min-label propagation and
    survivors via a left-anti hash join (same scale design as
    :func:`..minhash.minhash_dedup`; nothing materializes on the driver).

    ``scrub_input=False``: skip the defensive empty-block scrub of the
    ``ds``-derived id side — keeps it streaming; pass when ``ds`` comes
    from a fresh source (see minhash_dedup)."""
    fps = ds.map_batches(simhash_batch_fn(id_col, text_col), batch_format="pyarrow")
    return fingerprint_dedup(
        fps, ds, id_col=id_col, hash_col="simhash", max_hamming=max_hamming, scrub_input=scrub_input
    )


def fingerprint_dedup(
    fps,
    ds,
    *,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    scrub_input: bool = True,
):
    """The banded-hamming dedup tail, reusable for ANY 64-bit fingerprint
    column (text simhash, image dHash, audio chromaprint-style bits):
    ``fps`` is a Dataset with (id_col, hash_col int64-viewed uint64 bits);
    ``ds`` is the full id universe for the survivors join. Returns
    (survivors, pairs) Datasets — same distributed shape as simhash_dedup
    (4x16-bit band buckets, star pairs, hamming verify, min-label
    components, left-anti survivors join; nothing on the driver)."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        out_i, out_b, out_k = [], [], []
        for bi in range(4):
            key = (sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            out_i.append(ids)
            out_b.append(np.full(len(ids), bi, dtype=np.int32))
            out_k.append(key.astype(np.int64))
        return pa.table(
            {
                id_col: np.concatenate(out_i),
                "band_id": np.concatenate(out_b),
                "band_key": np.concatenate(out_k),
                hash_col: pa.array(np.tile(sh.view(np.int64), 4)),
            }
        )

    banded = fps.map_batches(band_rows, batch_format="pyarrow")

    from ray.data.aggregate import Min

    from .minhash import _default_join_partitions, connected_components_min_label, star_pairs_by_bucket

    num_partitions = _default_join_partitions()
    # star pairs per bucket with each endpoint's simhash carried along —
    # vectorized across buckets (no per-bucket Python), hamming computed
    # per pair row in one batch pass
    stars = star_pairs_by_bucket(
        banded, ["band_id", "band_key"], id_col, num_parts=num_partitions * 4, carry_col=hash_col
    )

    def add_ham(t: pa.Table) -> pa.Table:
        ca = t["carry_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        cb = t["carry_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "ham": pa.array(hamming(ca, cb).astype(np.int64)),
            }
        )

    cand = stars.map_batches(add_ham, batch_format="pyarrow")

    def verify(t: pa.Table) -> pa.Table:
        ham = t["ham"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ham <= max_hamming))

    pairs = (
        cand.map_batches(verify, batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Min("ham"))
        .map_batches(lambda t: t.rename_columns(["a", "b", "ham"]), batch_format="pyarrow")
        .materialize()
    )
    # scrub join-derived inputs: an empty first block entering the
    # survivors join's shuffle breaks its one-shot schema broadcast
    from ..state.blocks import safe_hash_join, scrub_empty_blocks

    all_ids = ds.select_columns([id_col])
    if scrub_input:
        all_ids = scrub_empty_blocks(all_ids, schema=pa.schema([(id_col, pa.int64())]))
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
    # join output returned to user pipelines — scrub schema-less empty
    # partition blocks so a downstream join can't crash (state/blocks.py)
    from ..state.blocks import scrub_empty_blocks

    survivors = scrub_empty_blocks(survivors, schema=pa.schema([(id_col, pa.int64())]))
    return survivors, pairs
