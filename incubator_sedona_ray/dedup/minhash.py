"""MinHash + LSH near-duplicate detection.

Standard public pipeline (Broder '97 minhash; LSH banding as in MMDS ch.3):

1. ``map_batches``: per doc, k-char shingles -> ``num_perm`` minhash values
   via universal hashing ``(a*x + b) mod p``; emit one row per LSH band:
   (band_id, band_hash, doc_id). Signatures never leave the batch — only
   the (b x 16-byte) band keys shuffle.
2. ``groupby(band_id, band_hash)``: docs sharing a band bucket are
   candidate pairs (pre-aggregated per batch first is unnecessary — bucket
   rows are tiny).
3. verify candidates with exact shingle Jaccard >= threshold.
4. connected components over verified pairs -> keep the min doc id per
   component. Components run on the driver over the verified PAIRS only
   (pairs are rare by construction); for adversarial inputs swap in the
   iterative min-label-propagation variant noted in the docstring of
   :func:`_components`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ngram import char_shingles, jaccard

_P = np.uint64((1 << 61) - 1)  # Mersenne prime for universal hashing


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(len(a), np.uint64(int(_P)), dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorized over (perm, shingle); python-int matmul
    # avoided by doing modmul in float128-free uint64 via object fallback:
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
    """map_batches stage -> (doc_id, band_id, band_hash) rows."""
    import hashlib

    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_ids, out_band, out_hash = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            sig = minhash_signature(char_shingles(t, shingle_k), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                # deterministic across worker processes (python's hash() is
                # per-process salted — never use it for shuffle keys)
                digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_ids.append(ids[i])
                out_band.append(bi)
                out_hash.append(int.from_bytes(digest, "big") & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                id_col: np.array(out_ids),
                "band_id": np.array(out_band, dtype=np.int32),
                "band_hash": np.array(out_hash, dtype=np.int64),
            }
        )

    return fn


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
):
    """Returns (survivors_df, dup_pairs_df): surviving doc ids after
    near-dup removal, and the verified duplicate pairs (a < b, jaccard).

    Note: verification re-reads candidate texts via a broadcast lookup of
    candidate ids only (texts of candidates must fit in driver memory —
    acceptable because candidates are a tiny fraction; at 100 TB scale swap
    step 3 for a hash-join of candidate ids back to the documents table).
    """
    banded = ds.map_batches(
        band_rows_fn(id_col, text_col, num_perm, bands, shingle_k, seed),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        # emit the bucket as a star around the min id — enough for connected
        # components; avoids quadratic blowup on giant buckets
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0]), "b": ids[1:]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(bucket_pairs, batch_format="pandas")
    cand_df = cand.to_pandas().drop_duplicates()

    if len(cand_df) == 0:
        all_ids = ds.select_columns([id_col]).to_pandas()[id_col]
        return pd.DataFrame({id_col: np.sort(all_ids.to_numpy())}), pd.DataFrame({"a": [], "b": [], "jaccard": []})

    # verify with exact jaccard over the candidate doc texts
    need = np.unique(np.concatenate([cand_df.a.to_numpy(), cand_df.b.to_numpy()]))
    texts = (
        ds.select_columns([id_col, text_col])
        .map_batches(
            lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=pa.array(need))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index(id_col)[text_col]
        .to_dict()
    )
    sh = {i: char_shingles(texts[i], shingle_k) for i in need if i in texts}
    keep_pairs = []
    for a_, b_ in zip(cand_df.a.to_numpy(), cand_df.b.to_numpy()):
        j = jaccard(sh.get(a_, set()), sh.get(b_, set()))
        if j >= threshold:
            keep_pairs.append((min(a_, b_), max(a_, b_), j))
    pairs_df = pd.DataFrame(keep_pairs, columns=["a", "b", "jaccard"])

    # connected components (union-find over verified pairs only)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_, b_ in zip(pairs_df.a, pairs_df.b):
        ra, rb = find(int(a_)), find(int(b_))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = ds.select_columns([id_col]).to_pandas()[id_col].to_numpy()
    drop = {x for x in parent if find(x) != x}
    survivors = np.sort(np.array([i for i in all_ids if int(i) not in drop]))
    return pd.DataFrame({id_col: survivors}), pairs_df
