"""Hashed TF-IDF document vectors (the "hashing trick", Weinberger et al.
2009) — the deterministic text -> sparse-feature stage that feeds
similarity search / clustering / linear probes when no neural embedder is
in the loop.

Output is the SPARSE representation ``(id, bucket, weight)`` — one row per
(document, non-zero feature) — which is what a 100 TB corpus needs: dense
``dim``-wide vectors would be ~1 MB/doc at dim=2^18, while real documents
touch only |distinct tokens| buckets. Downstream dense consumers (ANN
matmuls) densify per batch.

EXACT INTEGER ARITHMETIC (same rationale as text/backoff_lm.py): the usual
idf = ln(N/df) is float and summation-order-dependent; we use the rational
fixed-point idf

    idf_int(t) = (N * scale) // df(t)          (scale defaults to 10^6)
    weight(d, b) = sum over tokens t of d hashing to bucket b:
                   tf(d, t) * idf_int(t)

which is bit-equal on any cluster shape and SQL-reproducible. It is
monotone in 1/df exactly like ln(N/df) per token, so ranking/filtering
behavior is preserved. OVERFLOW BOUND: max_tf * N * scale < 2^63 — at
10^10 docs drop scale to 10^2, or shard N.

Bucket hash: first 60 bits of sha256(token) mod dim — DuckDB reproduces it
verbatim (``CAST(CONCAT('0x', substr(sha256(t), 1, 15)) AS UBIGINT)``),
and the per-batch cost is bounded by DISTINCT tokens per batch, not rows.

Distributed shape (two passes, standard exact-global-idf trade):
1. df pass — per-batch (token, docs-containing) partials (each doc lives
   in exactly one batch, so partials sum to the exact df), then
   ``groupby(token).sum`` — the one shuffle, bounded by the vocabulary.
2. score pass — broadcast the (token, df) table once (vocabulary-bounded,
   like bm25's idf broadcast; for web-scale vocabularies use the join
   variant: hash-join token pairs against the df table) and emit sparse
   rows with ZERO further shuffles.

Tokenization is the repo-wide contract (text/bm25.py ``_tokenize``:
lowercase, split \\s+, drop empties) so the SQL oracle sees identical
tokens.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .bm25 import _tokenize

__all__ = ["hashed_tfidf", "token_df"]


def _bucket_of(tokens: np.ndarray, dim: int) -> np.ndarray:
    """sha256-derived bucket per token (Python loop over DISTINCT tokens)."""
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        out[i] = int(hashlib.sha256(str(t).encode("utf-8")).hexdigest()[:15], 16) % dim
    return out


def _batch_doc_tokens(batch: pa.Table, text_col: str):
    """(vocab, tf, row_idx, tok_idx): per-batch factorized (row, token)
    term frequencies — vocab is the batch-distinct token array, and
    (row_idx[i], tok_idx[i]) -> tf[i]."""
    flat, parent = _tokenize(batch[text_col])
    toks = flat.to_numpy(zero_copy_only=False)
    if len(toks) == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, z
    vocab, inv = np.unique(toks, return_inverse=True)
    key = parent.astype(np.int64) * len(vocab) + inv
    uk, tf = np.unique(key, return_counts=True)
    return vocab, tf.astype(np.int64), uk // len(vocab), uk % len(vocab)


def token_df(ds, *, text_col: str = "text"):
    """Exact document frequency per token: Dataset of (tok, df). One
    vocabulary-bounded shuffle over pre-combined per-batch partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vocab, _tf, _rows, tok_idx = _batch_doc_tokens(batch, text_col)
        if len(vocab) == 0:
            return pa.table({"tok": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        # distinct (row, token) pairs are already unique -> count per token
        per_tok = np.bincount(tok_idx, minlength=len(vocab)).astype(np.int64)
        return pa.table({"tok": pa.array(vocab.astype(object), pa.string()), "df": pa.array(per_tok)})

    return ds.map_batches(partial, batch_format="pyarrow").groupby("tok").aggregate(
        Sum("df", alias_name="df")
    )


def hashed_tfidf(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 18,
    scale: int = 10**6,
):
    """Dataset -> sparse Dataset (id_col, bucket, weight), weight int64 > 0,
    one row per (doc, non-empty bucket)."""
    import ray as _ray

    n_docs = ds.count()
    df_tbl = token_df(ds, text_col=text_col).to_pandas()
    order = np.argsort(df_tbl["tok"].to_numpy(), kind="mergesort")
    vocab_sorted = df_tbl["tok"].to_numpy()[order]
    idf_sorted = (np.int64(n_docs) * np.int64(scale)) // df_tbl["df"].to_numpy()[order]
    model_ref = _ray.put({"vocab": vocab_sorted, "idf": idf_sorted})

    def score(batch: pa.Table, model) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        vocab, tf, row_idx, tok_idx = _batch_doc_tokens(batch, text_col)
        if len(vocab) == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "bucket": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        pos = np.searchsorted(model["vocab"], vocab)
        idf = model["idf"][np.minimum(pos, len(model["idf"]) - 1)].copy()
        idf[model["vocab"][np.minimum(pos, len(model["idf"]) - 1)] != vocab] = 0
        buckets = _bucket_of(vocab, dim)
        wt = tf * idf[tok_idx]
        key = row_idx * np.int64(dim) + buckets[tok_idx]
        uk, inv2 = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv2, wt)
        keep = sums > 0
        uk, sums = uk[keep], sums[keep]
        return pa.table(
            {
                id_col: pa.array(ids[(uk // dim).astype(np.int64)]),
                "bucket": pa.array((uk % dim).astype(np.int64)),
                "weight": pa.array(sums),
            }
        )

    from ..partition.assign import broadcast_map_batches

    return broadcast_map_batches(ds, score, {"model": model_ref})
