"""64-bit SimHash near-dup (Charikar '02 / Manku et al. '07).

Per doc: token FNV hashes vote per bit -> 64-bit fingerprint. Candidates =
docs sharing any of 4 16-bit bands (catches all pairs with hamming distance
<= 3); verify by exact hamming distance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ngram import _fnv


def simhash64(text: str) -> int:
    tokens = text.lower().split()
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = _fnv(tok.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    fp = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
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
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
    """Returns (survivors_df, pairs_df). Band-bucket candidates, verify by
    hamming distance <= max_hamming, drop non-min ids per component."""
    fps = ds.map_batches(simhash_batch_fn(id_col, text_col), batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
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
                "simhash": pa.array(np.tile(sh.view(np.int64), 4)),
            }
        )

    banded = fps.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().view(np.uint64) if g["simhash"].dtype != object else g["simhash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "ham": []})
        d = hamming(np.full(len(ids) - 1, sh[0]), sh[1:])
        return pd.DataFrame({"a": ids[0], "b": ids[1:], "ham": d})

    pairs = banded.groupby(["band_id", "band_key"]).map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    pairs = pairs[pairs.ham <= max_hamming].drop_duplicates(["a", "b"])

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_, b_ in zip(pairs.a, pairs.b):
        ra, rb = find(int(a_)), find(int(b_))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = ds.select_columns([id_col]).to_pandas()[id_col].to_numpy()
    drop = {x for x in parent if find(x) != x}
    survivors = np.sort(np.array([i for i in all_ids if int(i) not in drop]))
    return pd.DataFrame({id_col: survivors}), pairs.reset_index(drop=True)
