"""Distributed BM25 scoring + top-k retrieval over a text column.

The classic training-data / retrieval primitive (Robertson-Sparck Jones
BM25) expressed Ray-Data-first in two streaming passes:

1. **stats pass** — one ``map_batches`` that tokenizes each batch
   (lowercase, ``\\s+`` split, empties dropped — the exact tokenization the
   jaccard/decontam oracles use) and emits a single partial-aggregate row
   per batch: doc count, total token count, and per-query-term document
   frequency. A driver-side sum over those rows (O(#batches), not O(rows))
   yields N, avgdl and df(t) — the *only* global state BM25 needs, and it
   is tiny regardless of corpus size because df is computed **only for the
   query terms**, never a full vocabulary.
2. **score pass** — broadcast the per-term idf table + (k1, b, avgdl) and
   score every doc vectorized (flatten the token lists, ``np.bincount`` the
   term hits per row), keeping a local top-k per batch; a single-group
   ``map_groups`` merges local top-ks exactly (top-k is mergeable).

Scale: no shuffle anywhere — the stats row stream and the candidate stream
are both O(#batches * |terms|); the corpus is read twice (stats + score),
which at 100 TB is the standard two-pass trade for exact global idf.

Determinism contract with the DuckDB oracle: identical tokenization,
identical float64 evaluation order (idf = ln(1 + (N - df + .5)/(df + .5)),
tf-saturation term-by-term left-to-right sum), ties broken by id — scores
are bit-equal so ranks agree.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _tokenize(col) -> pa.ListArray:
    toks = pc.split_pattern_regex(pc.utf8_lower(col), pattern=r"\s+")
    # drop empty tokens (leading/trailing whitespace artifacts)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parent.to_numpy(zero_copy_only=False)[keep.to_numpy(zero_copy_only=False)]


def _term_tf_matrix(flat: pa.Array, parent: np.ndarray, n_rows: int, terms: list[str]) -> np.ndarray:
    """(n_rows, n_terms) int64 term-frequency matrix, vectorized."""
    tf = np.zeros((n_rows, len(terms)), dtype=np.int64)
    for j, t in enumerate(terms):
        hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        if hit.any():
            tf[:, j] = np.bincount(parent[hit], minlength=n_rows)
    return tf


def corpus_stats(ds, terms: list[str], *, text_col: str = "text") -> dict:
    """One streaming pass -> {n, dl_sum, avgdl, df: {term: df}}."""
    terms = list(terms)

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize(batch[text_col])
        n = batch.num_rows
        tf = _term_tf_matrix(flat, parent, n, terms)
        row = {
            "n": [np.int64(n)],
            "dl_sum": [np.int64(len(parent))],
        }
        for j in range(len(terms)):
            row[f"df_{j}"] = [np.int64((tf[:, j] > 0).sum())]
        return pa.table(row)

    cols = ["n", "dl_sum"] + [f"df_{j}" for j in range(len(terms))]
    sums = ds.map_batches(partial, batch_format="pyarrow").sum(cols)
    n = int(sums["sum(n)"])
    dl_sum = int(sums["sum(dl_sum)"])
    return {
        "n": n,
        "dl_sum": dl_sum,
        "avgdl": float(dl_sum) / n if n else 0.0,
        "df": {t: int(sums[f"sum(df_{j})"]) for j, t in enumerate(terms)},
    }


def bm25_topk(
    ds,
    terms: list[str],
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
):
    """Dataset -> Dataset (id, score, rank) of the global BM25 top-k for the
    bag-of-terms query. Only docs containing >= 1 query term participate."""
    terms = list(terms)
    if stats is None:
        stats = corpus_stats(ds, terms, text_col=text_col)
    n, avgdl = stats["n"], stats["avgdl"]
    idf = np.array(
        [math.log(1.0 + (n - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5)) for t in terms],
        dtype=np.float64,
    )
    params = ray.put({"idf": idf, "avgdl": avgdl, "k1": float(k1), "b": float(b), "terms": terms})

    def local_topk(batch: pa.Table, p) -> pa.Table:
        flat, parent = _tokenize(batch[text_col])
        nrows = batch.num_rows
        tf = _term_tf_matrix(flat, parent, nrows, p["terms"]).astype(np.float64)
        dl = np.bincount(parent, minlength=nrows).astype(np.float64)
        denom_base = p["k1"] * (1.0 - p["b"] + p["b"] * dl / p["avgdl"])  # (nrows,)
        # term-by-term left-to-right sum — matches the SQL's t0 + t1 + ...
        score = np.zeros(nrows, dtype=np.float64)
        for j in range(tf.shape[1]):
            score = score + p["idf"][j] * (tf[:, j] * (p["k1"] + 1.0)) / (tf[:, j] + denom_base)
        pos = np.flatnonzero(score > 0.0)
        if len(pos) > k:
            pos = pos[np.argpartition(-score[pos], k - 1)[:k]]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[pos]
        return pa.table(
            {
                id_col: pa.array(ids),
                "score": pa.array(score[pos], type=pa.float64()),
                "_g": pa.array(np.zeros(len(pos), dtype=np.int64)),
            }
        )

    from ..partition.assign import broadcast_map_batches

    cand = broadcast_map_batches(ds, local_topk, {"p": params})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.drop(columns=["_g"]).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby("_g").map_groups(merge, batch_format="pandas")
