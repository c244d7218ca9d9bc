"""Bloom-filter membership sketch as a mergeable Ray Data reduction, plus
the exact "bloom prefilter + verify join" dedup it enables.

The 100 TB motivation: dropping rows already present in a prior snapshot
(recrawl dedup, decontamination, blocklists-by-key) is a distributed
anti-join — BOTH sides shuffle. A Bloom filter built over the seen side is
a fixed-size bitmap whose partials merge by bitwise OR (the canonical
mergeable aggregate, like the HLL register max in sketch/hll.py); broadcast
once, it answers "definitely not seen" with zero shuffles. Only the rows
the bloom claims as hits (true hits + the ~1% false-positive tail) need the
exact verification join, so the all-to-all exchange shrinks from the whole
new corpus to roughly the overlap. The final output is EXACT — false
positives are weeded out by the verify join; false negatives are
impossible — which is what lets the DuckDB anti-join oracle hash-match it.

Sizing: m bits for n keys at k hashes gives FPR ~= (1 - e^{-kn/m})^k;
m = 10 bits/key with k=7 is ~1%. 10^10 seen keys -> ~12 GiB bitmap:
broadcast via ``ray.put`` once per node (object-store shared memory, NOT
per task), or shard the key space and route batches by key-hash prefix.

Determinism contract: double hashing (Kirsch-Mitzenmacher: idx_i = h1 +
i*h2 mod m) over vectorized FNV-1a (``dedup/ngram.fnv_strings`` — straight
from the Arrow buffers, no Python loop) with a murmur-finalizer second
stream; the same seen set yields a bit-identical bitmap on any cluster
shape / batch split — partials OR to the same bytes. (Not sha256: the
bitmap never reaches an oracle — result exactness comes from the verify
join — so the hash only needs speed and determinism.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["BloomFilter", "bloom_partials", "bloom_from_dataset", "bloom_anti_join"]


def _hash2_64(values) -> tuple[np.ndarray, np.ndarray]:
    """Two deterministic uint64 hash streams per value, vectorized: FNV-1a
    over the Arrow string buffers + its murmur-finalizer mix. Accepts an
    Arrow array or any sequence (converted once)."""
    from ..dedup.ngram import fmix64, fnv_strings

    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(np.asarray(values, dtype=object), type=pa.string())
    elif not pa.types.is_string(values.type) and not pa.types.is_large_string(values.type):
        values = values.cast(pa.string())
    h1 = fnv_strings(values)
    return h1, fmix64(h1)


def _bit_indices(h1: np.ndarray, h2: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(n, k) int64 bit positions via double hashing. h2 is forced odd so
    the k probes never collapse onto one index for any value."""
    m = np.uint64(num_bits)
    h2 = h2 | np.uint64(1)
    ks = np.arange(num_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + ks * h2[:, None]) % m).astype(np.int64)


class BloomFilter:
    """Immutable bitmap + params; vectorized membership probe."""

    def __init__(self, bits: bytes, num_bits: int, num_hashes: int):
        if num_bits % 8:
            raise ValueError("num_bits must be a multiple of 8")
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self._bytes = np.frombuffer(bits, dtype=np.uint8)
        if len(self._bytes) != num_bits // 8:
            raise ValueError("bitmap length does not match num_bits")

    @classmethod
    def build(cls, values, *, num_bits: int, num_hashes: int = 7) -> "BloomFilter":
        bm = np.zeros(num_bits // 8, dtype=np.uint8)
        if len(values):
            h1, h2 = _hash2_64(values)
            idx = _bit_indices(h1, h2, num_bits, num_hashes).ravel()
            np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return cls(bm.tobytes(), num_bits, num_hashes)

    def contains(self, values) -> np.ndarray:
        """Boolean mask: True = possibly seen (needs verify), False = NEW."""
        if not len(values):
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash2_64(values)
        idx = _bit_indices(h1, h2, self.num_bits, self.num_hashes)
        bits = (self._bytes[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return bits.all(axis=1)

    def to_bytes(self) -> bytes:
        return self._bytes.tobytes()


def bloom_partials(ds, col: str, *, num_bits: int = 1 << 20, num_hashes: int = 7):
    """Dataset of per-block OR-merged bitmap rows (column: bits binary).
    Same two-stage shape as hll_partials: per-batch partial, then a
    batch_size=None fold so the driver sees only O(#blocks) rows."""
    nbytes = num_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = pc.unique(batch[col].combine_chunks().drop_null())
        bf = BloomFilter.build(v, num_bits=num_bits, num_hashes=num_hashes)
        return pa.table({"bits": pa.array([bf.to_bytes()], pa.binary(nbytes))})

    def merge_block(batch: pa.Table) -> pa.Table:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in batch["bits"].to_pylist()]
        bm = np.bitwise_or.reduce(arrs) if arrs else np.zeros(nbytes, dtype=np.uint8)
        return pa.table({"bits": pa.array([bm.tobytes()], pa.binary(nbytes))})

    return ds.map_batches(partial, batch_format="pyarrow").map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def bloom_from_dataset(ds, col: str, *, num_bits: int = 1 << 20, num_hashes: int = 7) -> BloomFilter:
    """Distributed build -> one BloomFilter on the driver (fixed-size fold)."""
    parts = bloom_partials(ds, col, num_bits=num_bits, num_hashes=num_hashes).to_pandas()
    arrs = [np.frombuffer(b, dtype=np.uint8) for b in parts["bits"]]
    bm = np.bitwise_or.reduce(arrs) if arrs else np.zeros(num_bits // 8, dtype=np.uint8)
    return BloomFilter(bm.tobytes(), num_bits, num_hashes)


def bloom_anti_join(
    ds,
    seen,
    *,
    col: str,
    seen_col: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 7,
    num_partitions: int | None = None,
):
    """EXACT anti-join (rows of ``ds`` whose ``col`` is NOT in ``seen``),
    with the bloom as a shuffle-avoiding prefilter.

    1. Build the bloom over ``seen[seen_col]`` distributed (bitmap partials,
       OR fold) and broadcast it once via ``ray.put``.
    2. Stream ``ds``: bloom-miss rows are PROVABLY unseen -> emitted with
       zero shuffles. Bloom-hit rows (true overlap + ~FPR of the rest) are
       tagged for verification.
    3. Verify ONLY the hit stream with the distributed left-anti hash join
       (state/blocks.safe_hash_join) against the seen keys; survivors (the
       false positives) are unioned back.

    At 1% FPR and small true overlap, the exchange moves ~1% of the data an
    anti-join would. Returns ``ds``'s schema unchanged.

    The miss/hit split is TWO streaming passes over ``ds`` (Ray Data has no
    one-pass fork without materializing): the source re-scan is the cheap
    column-pruned parquet read, and the probe is re-paid once — the same
    deliberate trade as text/decontam.py's split. To probe once, tag a
    ``hit`` column yourself and materialize before filtering — only worth
    it when ``ds`` is an expensive derived lineage, not a raw read.
    """
    import ray as _ray

    from ..partition.assign import broadcast_map_batches
    from ..state.blocks import safe_hash_join

    seen_col = seen_col or col
    bf = bloom_from_dataset(seen, seen_col, num_bits=num_bits, num_hashes=num_hashes)
    bf_ref = _ray.put(bf)

    def split(flag_hits: bool):
        def fn(batch: pa.Table, bloom) -> pa.Table:
            hit = bloom.contains(batch[col].combine_chunks())
            return batch.filter(pa.array(hit if flag_hits else ~hit))

        return fn

    misses = broadcast_map_batches(ds, split(False), {"bloom": bf_ref}, batch_size=None)
    hits = broadcast_map_batches(ds, split(True), {"bloom": bf_ref}, batch_size=None)

    if num_partitions is None:
        try:
            num_partitions = max(2, int(_ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4
    seen_keys = seen.select_columns([seen_col])
    verified = safe_hash_join(
        hits, seen_keys, "left_anti", num_partitions, on=(col,), right_on=(seen_col,)
    )
    return misses.union(verified)
