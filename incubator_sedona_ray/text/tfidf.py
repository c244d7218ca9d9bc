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
verbatim (``CAST(CONCAT('0x', substr(sha256(t), 1, 15)) AS UBIGINT)``).
The sha256 loop runs ONCE PER VOCABULARY ENTRY inside the distributed
model pass — never per batch of the corpus.

Distributed shape (two passes, standard exact-global-idf trade):
1. df pass — per-batch (token, docs-containing) partials (each doc lives
   in exactly one batch, so partials sum to the exact df), summed with the
   repo's hash-BUCKETED group-sum (fnv(token) % buckets tag + pandas
   C-speed per-bucket sum — Ray 2.49's native aggregate over millions of
   distinct string keys is ~20x slower, same finding as text/ngrams.py).
2. model pass — map over the df table computing (fnv64(token), idf_int,
   bucket) and collect ONLY those three int64 columns (48 MB at a 2M
   vocabulary — no token strings reach the driver or the broadcast).
3. score pass — broadcast the hash-keyed model once; per batch the lookup
   is a uint64 ``searchsorted`` over the batch's DISTINCT tokens, then
   sparse rows stream out with ZERO further shuffles. fnv64 collisions
   inside the vocabulary are DETECTED at model build (duplicate hash keys)
   and those few tokens are resolved through an exact string-keyed side
   dict, so the integer-exactness contract survives any hash behavior.

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


def _bucket_of(tokens, dim: int) -> np.ndarray:
    """sha256-derived bucket per token (loop bounded by vocabulary rows of
    one model-pass batch, not corpus rows)."""
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


def token_df(ds, *, text_col: str = "text", num_buckets: int | None = None):
    """Exact document frequency per token: Dataset of (tok, df). One
    vocabulary-bounded hash-bucketed exchange over per-batch partials
    (state/keyedsum.py — the shared Ray-2.49 high-cardinality-aggregate
    workaround)."""
    from ..state.keyedsum import bucketed_group_sum

    def partial(batch: pa.Table) -> pa.Table:
        vocab, _tf, _rows, tok_idx = _batch_doc_tokens(batch, text_col)
        if len(vocab) == 0:
            return pa.table({"tok": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        # distinct (row, token) pairs are already unique -> count per token
        per_tok = np.bincount(tok_idx, minlength=len(vocab)).astype(np.int64)
        return pa.table(
            {"tok": pa.array(vocab.astype(object), pa.string()), "df": pa.array(per_tok)}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_sum(partials, "tok", ["df"], num_buckets=num_buckets)


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

    from ..dedup.ngram import fnv_strings

    n_docs = ds.count()
    # materialize the VOCABULARY-bounded df table (not the corpus): the
    # model pass and the rare fnv-collision fetch both read it, and
    # without this the collision path would re-tokenize the whole corpus
    df_ds = token_df(ds, text_col=text_col).materialize()

    def model_part(batch: pa.Table) -> pa.Table:
        tok = batch["tok"].combine_chunks() if batch.num_rows else batch["tok"]
        dfv = batch["df"].to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"h": z, "idf": z, "bucket": z})
        h = fnv_strings(tok).view(np.int64)
        idf = (np.int64(n_docs) * np.int64(scale)) // dfv.astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h),
                "idf": pa.array(idf),
                "bucket": pa.array(_bucket_of(tok.to_numpy(zero_copy_only=False), dim)),
            }
        )

    mod = df_ds.map_batches(model_part, batch_format="pyarrow").to_pandas()
    h = mod["h"].to_numpy().view(np.uint64)
    order = np.argsort(h, kind="mergesort")
    h_sorted = h[order]
    idf_sorted = mod["idf"].to_numpy()[order]
    bucket_sorted = mod["bucket"].to_numpy()[order]

    # fnv64 collisions inside the vocabulary: duplicate sorted hashes.
    # Resolve those few tokens exactly via a string-keyed side dict.
    dup_mask = np.zeros(len(h_sorted), dtype=bool)
    if len(h_sorted) > 1:
        eq = h_sorted[1:] == h_sorted[:-1]
        dup_mask[1:] |= eq
        dup_mask[:-1] |= eq
    collided: dict = {}
    if dup_mask.any():
        bad = set(h_sorted[dup_mask].tolist())

        def fetch_bad(batch: pa.Table) -> pa.Table:
            tok = batch["tok"].combine_chunks() if batch.num_rows else batch["tok"]
            if batch.num_rows == 0:
                return batch
            hh = fnv_strings(tok)
            keep = np.fromiter((int(x) in bad for x in hh), bool, len(hh))
            return batch.filter(pa.array(keep))

        bad_tbl = df_ds.map_batches(fetch_bad, batch_format="pyarrow").to_pandas()
        for t, d in zip(bad_tbl["tok"], bad_tbl["df"]):
            collided[t] = (
                (np.int64(n_docs) * np.int64(scale)) // np.int64(d),
                int(hashlib.sha256(str(t).encode("utf-8")).hexdigest()[:15], 16) % dim,
            )

    model_ref = _ray.put(
        {
            "h": h_sorted,
            "idf": idf_sorted,
            "bucket": bucket_sorted,
            "dup": dup_mask,
            "collided": collided,
        }
    )

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
        hv = fnv_strings(pa.array(vocab.astype(object), pa.string()))
        pos = np.searchsorted(model["h"], hv)
        pos_c = np.minimum(pos, len(model["h"]) - 1)
        found = model["h"][pos_c] == hv
        idf = np.where(found, model["idf"][pos_c], np.int64(0))
        buckets = np.where(found, model["bucket"][pos_c], np.int64(0))
        needs_dict = found & model["dup"][pos_c]
        if needs_dict.any():
            for j in np.nonzero(needs_dict)[0]:
                ent = model["collided"].get(vocab[j])
                if ent is None:
                    idf[j] = 0
                else:
                    idf[j], buckets[j] = ent
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

    return broadcast_map_batches(ds, score, {"model": model_ref}, batch_size=None)
