"""Corpus-level exact paragraph dedup (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better" — the exact-substring pass at
paragraph granularity): every paragraph that appears anywhere else in the
corpus keeps only its FIRST occurrence (min (doc_id, position)); documents
are then reassembled from their surviving paragraphs, and documents with
no survivors drop out.

Distributed shape — two shuffles, both unavoidable:
  1. explode docs into (paragraph, packed doc-position) rows (streaming
     map), then one native ``groupby(paragraph).aggregate(Min(packed))`` —
     partial per-block combine, then the paragraph text crosses the wire
     exactly once (it must: the winner's text is in the output).
  2. regroup winners by doc: coarse-partitioned ``map_groups`` (Python
     calls O(parts), not O(docs)) — lexsort by (doc, position), run-length
     list offsets, one vectorized ``pc.binary_join`` per partition.

No sha256 / re-attach join: grouping on the paragraph string directly is
one text exchange total, versus hash-then-join's slim exchange PLUS a text
exchange inside the join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_IDX_BITS = 20  # paragraphs per doc < 2^20; doc_id < 2^43 -> packed fits int64
_IDX_MASK = (1 << _IDX_BITS) - 1


def chunk_into_lines_fn(words_per_line: int = 12, text_col: str = "text"):
    """Batch fn: rewrite ``text_col`` with every ``words_per_line``-th word
    gap turned into a newline — gives a no-newline corpus a deterministic
    paragraph structure (the SQL-oracle equivalent is a ``list_transform``
    over 1-based word-slice ranges). Fully vectorized: one RE2 split, one
    element-wise word+separator concat, one ``binary_join`` per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = np.asarray(lst.offsets, dtype=np.int64)
        offs = offs - offs[0]
        flat = lst.flatten()
        keep = np.asarray(pc.utf8_length(flat)) > 0
        # filtered per-row lengths -> new offsets over only non-empty words
        c = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
        new_offs = c[offs]
        flat = flat.filter(pa.array(keep))
        lens = np.diff(new_offs)
        widx = np.arange(len(flat), dtype=np.int64) - np.repeat(new_offs[:-1], lens)
        last = widx == np.repeat(lens - 1, lens)
        nl = (widx % words_per_line == words_per_line - 1) & ~last
        seps = np.full(len(flat), " ", dtype="<U1")
        seps[nl] = "\n"
        seps[last] = ""
        # last argument is the separator: word + "" + sep  ==  concat
        pieces = pc.binary_join_element_wise(flat, pa.array(seps), "")
        rows = pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()), pieces)
        joined = pc.binary_join(rows, "")
        return batch.set_column(batch.schema.get_field_index(text_col), text_col, joined)

    return fn


def explode_paragraphs_fn(id_col: str = "doc_id", text_col: str = "text", sep: str = "\n"):
    """Batch fn: (id, text) -> (para, packed) rows, one per non-empty
    paragraph, ``packed = doc_id << 20 | position``."""

    def fn(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(batch[text_col], pattern=sep)
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = np.asarray(lst.offsets, dtype=np.int64)
        offs = offs - offs[0]  # rebase: flatten() is 0-based even on slices
        flat = lst.flatten()
        lens = np.diff(offs)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc_ids) and (doc_ids.max() >= (1 << 43) or doc_ids.min() < 0):
            raise ValueError("doc_id out of packable range [0, 2^43)")
        if lens.size and lens.max() > _IDX_MASK:
            raise ValueError(f"document has more than 2^{_IDX_BITS} paragraphs")
        rep_ids = np.repeat(doc_ids, lens)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens)
        keep = np.asarray(pc.utf8_length(flat)) > 0
        packed = (rep_ids[keep] << _IDX_BITS) | pos[keep]
        return pa.table(
            {
                "para": flat.filter(pa.array(keep)),
                "packed": pa.array(packed, type=pa.int64()),
            }
        )

    return fn


def _reassemble_kernel(sep: str, id_col: str, text_col: str):
    def kernel(g: pa.Table) -> pa.Table:
        packed = g["packed"].to_numpy(zero_copy_only=False)
        doc = packed >> _IDX_BITS
        idx = packed & _IDX_MASK
        order = np.lexsort((idx, doc))
        doc = doc[order]
        para = g["para"].combine_chunks().take(pa.array(order))
        if isinstance(para, pa.ChunkedArray):
            para = para.combine_chunks()
        first = np.empty(len(doc), dtype=bool)
        if len(doc):
            first[0] = True
            first[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(first)
        offsets = pa.array(np.append(starts, len(doc)).astype(np.int32))
        lst = pa.ListArray.from_arrays(offsets, para)
        return pa.table(
            {
                id_col: pa.array(doc[starts], type=pa.int64()),
                text_col: pc.binary_join(lst, sep),
            }
        )

    return kernel


def dedup_paragraphs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_parts: int = 64,
):
    """Dataset(id, text) -> Dataset(id, text) with every non-first
    occurrence of each distinct paragraph removed corpus-wide and documents
    rebuilt from their surviving paragraphs (document order preserved;
    documents with no survivors are dropped, matching the SQL GROUP BY
    oracle)."""
    from ray.data.aggregate import Min

    exploded = ds.map_batches(
        explode_paragraphs_fn(id_col, text_col, sep), batch_format="pyarrow"
    )
    winners = exploded.groupby("para").aggregate(Min("packed", alias_name="packed"))

    def add_part(t: pa.Table) -> pa.Table:
        packed = t["packed"].to_numpy(zero_copy_only=False)
        part = ((packed >> _IDX_BITS) % num_parts).astype(np.int32)
        return t.append_column("dpart", pa.array(part))

    parted = winners.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("dpart").map_groups(
        _reassemble_kernel(sep, id_col, text_col), batch_format="pyarrow"
    )
