"""Repetition quality metrics (Gopher-style, Rae et al. 2021 "Scaling
Language Models" §A1.1): per-document duplicate-word fraction, top-word
fraction, and duplicate-2-gram fraction. Repetitious documents are the
single biggest quality filter in web-corpus prep; these three scores are
the word-level analogues of Gopher's duplicate-line / most-common-n-gram
rules (the synthetic corpus has no newlines, so the word granularity is
the meaningful one — the kernel is granularity-agnostic).

Fully vectorized per batch: one Arrow RE2 split over the flat utf-8
buffer, one dictionary-encode (C-level word -> int32 code), then numpy
lexsort/bincount passes over (row, code) composites. No Python per row or
per word; no shuffle — a pure streaming map stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_codes(col):
    """Split + lowercase + dictionary-encode a string column: returns
    (row_id, code, n_rows) over all non-empty whitespace-separated tokens,
    in document order."""
    lst = pc.split_pattern_regex(pc.utf8_lower(col), pattern=r"\s+")
    lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
    n = len(lst)
    offs = np.asarray(lst.offsets)
    values = lst.flatten()  # offset-safe: aligned with concatenated rows
    dic = pc.dictionary_encode(values)
    codes = np.asarray(dic.indices, dtype=np.int64)
    row_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    # drop empty tokens (leading/trailing/multiple whitespace artifacts)
    nonempty = np.asarray(pc.utf8_length(values)) > 0
    return row_id[nonempty], codes[nonempty], n


def _distinct_and_top(row_id: np.ndarray, key: np.ndarray, n: int):
    """Per-row (distinct_count, max_multiplicity) of ``key`` grouped by
    ``row_id`` — one lexsort + run-length pass, no per-row work."""
    distinct = np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    if len(row_id) == 0:
        return distinct, top
    order = np.lexsort((key, row_id))
    r, k = row_id[order], key[order]
    first = np.empty(len(r), dtype=bool)
    first[0] = True
    first[1:] = (r[1:] != r[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(first)
    runlen = np.diff(np.append(starts, len(r)))
    distinct += np.bincount(r[starts], minlength=n)
    np.maximum.at(top, r[starts], runlen)
    return distinct, top


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_words``, ``dup_word_frac``, ``top_word_frac``,
    ``dup_2gram_frac`` to the batch. Zero-word documents score 0.0 on every
    fraction; documents with < 2 words have ``dup_2gram_frac`` 0.0."""
    n = batch.num_rows
    if n == 0:
        out = batch
        for name, typ in (
            ("n_words", pa.int64()),
            ("dup_word_frac", pa.float64()),
            ("top_word_frac", pa.float64()),
            ("dup_2gram_frac", pa.float64()),
        ):
            out = out.append_column(name, pa.array([], type=typ))
        return out
    row_id, codes, _ = _flat_codes(batch[text_col])
    total = np.bincount(row_id, minlength=n)
    distinct, top = _distinct_and_top(row_id, codes, n)
    safe = np.maximum(total, 1).astype(np.float64)
    dup_word = np.where(total > 0, 1.0 - distinct / safe, 0.0)
    top_word = top / safe

    # consecutive-position 2-grams within a row: positions are already in
    # document order, so a pair exists wherever adjacent entries share a row
    if len(row_id) > 1:
        adj = row_id[1:] == row_id[:-1]
        g_row = row_id[:-1][adj]
        nvoc = int(codes.max()) + 1 if len(codes) else 1
        g_key = codes[:-1][adj] * np.int64(nvoc) + codes[1:][adj]
        total2 = np.bincount(g_row, minlength=n)
        distinct2, _ = _distinct_and_top(g_row, g_key, n)
    else:
        total2 = np.zeros(n, dtype=np.int64)
        distinct2 = np.zeros(n, dtype=np.int64)
    dup_2gram = np.where(
        total2 > 0, 1.0 - distinct2 / np.maximum(total2, 1).astype(np.float64), 0.0
    )

    out = batch.append_column("n_words", pa.array(total, type=pa.int64()))
    out = out.append_column("dup_word_frac", pa.array(dup_word, type=pa.float64()))
    out = out.append_column("top_word_frac", pa.array(top_word, type=pa.float64()))
    out = out.append_column("dup_2gram_frac", pa.array(dup_2gram, type=pa.float64()))
    return out


def repetition_scores(ds, text_col: str = "text"):
    """Dataset -> Dataset with the four repetition columns appended.
    Streaming map stage — no state, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        return repetition_batch(batch, text_col=text_col)

    return ds.map_batches(fn, batch_format="pyarrow")
