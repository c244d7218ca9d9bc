"""Fixed-length sequence chunking: split each document's token stream into
training-example-sized chunks (the LM-pretraining prep step).

Each doc tokenizes (``\\s+`` split, empties dropped, case preserved) and
emits ``ceil(n_tok / seq_len)`` rows ``(doc_id, chunk_id, n_tokens,
chunk)``; a trailing partial chunk survives iff it has at least
``min_tokens`` tokens. Chunking is PER-DOCUMENT on purpose: greedy
cross-document bin packing is order-dependent, so under a distributed,
block-parallel execution it is neither reproducible nor resumable — the
per-doc form is deterministic row-for-row at any parallelism (same
argument as the deterministic hash sampler in :mod:`..dedup.sample`).

Scale shape: one stateless ``map_batches`` — the kernel is fully
vectorized (flatten token lists once, derive chunk offsets with numpy
arithmetic, re-join with one ``binary_join`` over a rebuilt ListArray);
output rows ≈ input tokens / seq_len, streaming through with no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_batch(
    batch: pa.Table,
    *,
    seq_len: int,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    stride: int | None = None,
) -> pa.Table:
    """One Arrow batch of docs -> chunk rows (id, chunk_id, n_tokens, chunk).

    ``stride`` < ``seq_len`` yields OVERLAPPING windows (RAG-passage
    convention: starts 0, stride, 2*stride, ... with the last window the
    first one reaching the doc end — no fully-redundant tail windows);
    the default ``stride=None`` means ``seq_len`` (disjoint chunks,
    original semantics)."""
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    n = batch.num_rows
    ntok = np.bincount(parent, minlength=n)  # tokens per doc

    S = seq_len if stride is None else int(stride)
    if S < 1:
        raise ValueError(f"stride must be >= 1, got {S}")
    # windows per doc: starts 0, S, 2S, ... until one covers the doc end
    nchunks = np.where(ntok > 0, 1 + (np.maximum(ntok - seq_len, 0) + S - 1) // S, 0).astype(np.int64)

    doc_idx = np.repeat(np.arange(n), nchunks)  # one entry per output chunk
    # chunk_id within each doc: 0..nchunks[d]-1
    starts = np.zeros(len(doc_idx), dtype=np.int64)
    if len(doc_idx):
        first = np.r_[0, np.cumsum(nchunks)[:-1]]
        chunk_id = np.arange(len(doc_idx)) - np.repeat(first, nchunks)
    else:
        chunk_id = starts
    tok_first = np.r_[0, np.cumsum(ntok)[:-1]]  # each doc's first token in flat
    c_start = tok_first[doc_idx] + chunk_id * S
    c_len = np.minimum(seq_len, ntok[doc_idx] - chunk_id * S)
    # drop partial chunks below min_tokens (only possible on the last chunk)
    ok = c_len >= min_tokens
    doc_idx, chunk_id, c_start, c_len = doc_idx[ok], chunk_id[ok], c_start[ok], c_len[ok]

    # rebuild a ListArray over flat tokens with the chunk offsets, join once
    offsets = np.empty(len(c_start) + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(c_len, out=offsets[1:])
    # chunks are contiguous but may skip nothing (c_start is strictly the
    # running token cursor when min_tokens <= 1); with min_tokens > 1 the
    # flat array must be re-gathered
    total = int(offsets[-1]) if len(c_len) else 0
    within = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], c_len)
    gather = np.repeat(c_start, c_len) + within
    chunk_tokens = flat.take(pa.array(gather, type=pa.int64()))
    if isinstance(chunk_tokens, pa.ChunkedArray):
        chunk_tokens = chunk_tokens.combine_chunks()
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), chunk_tokens)
    joined = pc.binary_join(lst, " ")

    ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
    return pa.table(
        {
            id_col: pa.array(ids),
            "chunk_id": pa.array(chunk_id.astype(np.int64)),
            "n_tokens": pa.array(c_len.astype(np.int64)),
            "chunk": joined,
        }
    )


def count_tokens_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens`` (\\s+ split, empties dropped — the seq_chunks
    tokenization) as one vectorized kernel."""
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    ntok = np.bincount(parent[keep], minlength=batch.num_rows).astype(np.int64)
    return batch.append_column("n_tokens", pa.array(ntok, type=pa.int64()))


def pack_offsets(
    ds,
    capacity: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_ranges: int | None = None,
):
    """Cross-document sequence packing, GPT-style ("concatenate the corpus
    in ``id_col`` order, cut every ``capacity`` tokens"): each doc gets its
    global ``token_start`` via a distributed exclusive prefix sum
    (:func:`..state.scan.range_prefix_sum`) and therefore its pack-window
    span — ``first_pack = token_start // capacity``, ``last_pack`` from its
    final token. Unlike greedy bin packing this layout is deterministic at
    any parallelism and resumable, and it is the packing LM pretraining
    actually uses (docs flow across window boundaries).

    Returns Dataset(id_col, n_tokens, token_start, first_pack, last_pack);
    zero-token docs sit at their offset with ``last_pack = first_pack``.
    """
    from ..state.scan import range_prefix_sum

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    counted = ds.map_batches(
        lambda b: count_tokens_batch(b, text_col=text_col), batch_format="pyarrow"
    ).select_columns([id_col, "n_tokens"])
    scanned = range_prefix_sum(
        counted, id_col, "n_tokens", out_col="token_start", num_ranges=num_ranges
    )

    def windows(t: pa.Table) -> pa.Table:
        start = t["token_start"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        first = start // capacity
        last = np.where(n > 0, (start + np.maximum(n, 1) - 1) // capacity, first)
        t = t.append_column("first_pack", pa.array(first, type=pa.int64()))
        return t.append_column("last_pack", pa.array(last, type=pa.int64()))

    return scanned.map_batches(windows, batch_format="pyarrow")


def seq_chunks(
    ds,
    seq_len: int,
    *,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Dataset of docs -> Dataset of fixed-length token chunks."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    return ds.map_batches(
        lambda b: chunk_batch(
            b, seq_len=seq_len, min_tokens=min_tokens, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
    )


def sliding_chunks(
    ds,
    seq_len: int,
    stride: int,
    *,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Dataset of docs -> OVERLAPPING token windows (RAG passage prep):
    window k covers tokens [k*stride, k*stride + seq_len); the last window
    is the first one reaching the doc end. Stateless streaming map."""
    if seq_len < 1 or stride < 1:
        raise ValueError(f"seq_len/stride must be >= 1, got {seq_len}/{stride}")
    return ds.map_batches(
        lambda b: chunk_batch(
            b,
            seq_len=seq_len,
            min_tokens=min_tokens,
            id_col=id_col,
            text_col=text_col,
            stride=stride,
        ),
        batch_format="pyarrow",
    )
