"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

Distributed EXACT n-gram-Jaccard pair finding — unlike the MinHash path
(:mod:`.minhash`), no probabilistic candidate generation: every pair with
Jaccard >= threshold is guaranteed found. Public algorithm: prefix
filtering with a global token order (Chaudhuri et al. SSJoin / Xiao et
al. PPJoin; distributed formulation per Vernica, Carey, Li, "Efficient
Parallel Set-Similarity Joins Using MapReduce", SIGMOD 2010).

Plan (one shuffle):

1. ``map_batches``: doc -> sorted unique shingle-hash array ``s``; a pair
   with ``J >= t`` shares >= ``ceil(t*|s|)`` tokens with each member, so it
   must share a token inside each member's PREFIX (first
   ``|s| - ceil(t*|s|) + 1`` tokens under any fixed global order — we use
   hash order, which needs no document-frequency broadcast). Explode one
   row per prefix token carrying the full shingle array.
2. ``groupby(token).map_groups``: inside each token group, length-filter
   (``|a| >= t*|b|``), emit each candidate pair exactly once (only the
   group whose token is the MINIMUM shared prefix token emits it), and
   verify exact Jaccard on the carried arrays — no second shuffle, no
   driver-side state.

Scale note: rows carry their full shingle arrays through the exchange
(the "full-record" variant of Vernica et al.). For very large documents
switch to id-only candidates + a hash-join back to the shingle table
(the pattern :mod:`.minhash` uses for its verify step).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .ngram import fnv_tokens


def word_shingles_arr(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique uint64 FNV hashes of word n-grams (lowercased,
    whitespace-tokenized); <n words -> one shingle of the joined words;
    empty -> empty array. Hash-set Jaccard == string-set Jaccard modulo
    64-bit collisions."""
    words = text.lower().split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < n:
        toks = [" ".join(words).encode()]
    else:
        toks = [" ".join(words[i : i + n]).encode() for i in range(len(words) - n + 1)]
    return np.unique(fnv_tokens(toks))


def _prefix_len(size: int, threshold: float) -> int:
    return size - int(math.ceil(threshold * size)) + 1


def jaccard_self_join(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
):
    """All pairs of rows whose word-``n``-gram Jaccard >= ``threshold``.

    Returns a Dataset (a, b, jac) with ``a < b`` (ids), exact Jaccard.
    Rows with an empty shingle set never pair (Jaccard undefined).
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out_tok: list[int] = []
        out_id: list[int] = []
        out_sig: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            s = word_shingles_arr(t or "", n)
            if len(s) == 0:
                continue
            p = _prefix_len(len(s), threshold)
            for tok in s[:p]:
                out_tok.append(int(tok))
                out_id.append(int(i))
                out_sig.append(s)
        return pa.table(
            {
                "token": pa.array(out_tok, type=pa.uint64()),
                "rid": pa.array(out_id, type=pa.int64()),
                "sig": pa.array([s.tolist() for s in out_sig], type=pa.list_(pa.uint64())),
            }
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        tok = int(g["token"].iloc[0])
        rids = g["rid"].to_numpy()
        sigs = [np.asarray(s, dtype=np.uint64) for s in g["sig"]]
        # dedup docs repeated in one group (same doc can't carry the same
        # prefix token twice — shingles are unique — but guard anyway)
        order = np.argsort(rids, kind="mergesort")
        a_out, b_out, j_out = [], [], []
        for ii in range(len(order)):
            i = order[ii]
            si = sigs[i]
            li = len(si)
            pi = si[: _prefix_len(li, threshold)]
            for jj in range(ii + 1, len(order)):
                j = order[jj]
                if rids[i] == rids[j]:
                    continue
                sj = sigs[j]
                lj = len(sj)
                # length filter: J >= t requires min/max >= t
                if min(li, lj) < threshold * max(li, lj):
                    continue
                pj = sj[: _prefix_len(lj, threshold)]
                shared = np.intersect1d(pi, pj, assume_unique=True)
                if len(shared) == 0 or int(shared[0]) != tok:
                    continue  # another (the minimal) token's group owns this pair
                inter = len(np.intersect1d(si, sj, assume_unique=True))
                jac = inter / (li + lj - inter)
                if jac >= threshold:
                    lo, hi = sorted((int(rids[i]), int(rids[j])))
                    a_out.append(lo)
                    b_out.append(hi)
                    j_out.append(jac)
        return pd.DataFrame({"a": a_out, "b": b_out, "jac": j_out})

    return ex.groupby("token").map_groups(pairs, batch_format="pandas")
