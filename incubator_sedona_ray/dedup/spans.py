"""Exact duplicate-span detection — the ExactSubstr family of corpus dedup
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better"): find word n-gram spans that occur verbatim in >= ``min_docs``
distinct documents and report, per document, how much of it is made of
such shared spans. Unlike MinHash/SimHash (whole-document near-dup) this
catches boilerplate, licence blocks, and template text PASTED INTO
otherwise-unique pages — the dominant duplication mode in web corpora.

Distributed shape (everything corpus-sized stays in the object store):

  1. explode      map_batches: one vectorized RE2 split per batch, FNV
                  n-gram hashes straight off the Arrow buffers
                  (text.decontam._doc_ngram_hashes), in-batch dedup to
                  DISTINCT (doc, gram) pairs — exact because docs never
                  span batches — each tagged ``gram_hash % num_buckets``.
  2. bucket df    ONE coarse exchange: ``groupby(bucket).map_groups``;
                  every occurrence of a gram lands in one bucket, so the
                  kernel's np.unique/bincount df counts are exact, and it
                  collapses its pairs to per-(doc, bucket) partials
                  (dup_grams, total_grams) — O(docs x buckets) rows out.
  3. combine      groupby(doc) Sum of the tiny partials; docs with zero
                  shared spans are filtered (at web scale the flagged set
                  is the small output).

This replaces the v1 plan (gram-keyed groupby-count + a pairs x dup-grams
hash join): Ray 2.49's generic aggregate over millions of distinct gram
hashes and the extra join cost ~4x the single coarse exchange (measured
10.1 s -> see BASELINE; the repo-wide "hash-bucket the high-cardinality
keys" finding). Bucket keys are uniform by FNV construction — no skew
salting needed.

The SQL oracle groups by the gram STRING; parity holds up to
(astronomically unlikely) FNV-1a collisions, the same contract
``text/decontam.py`` ships with.

No counterpart in the reference repo (Sedona has no text dedup); the
n-gram semantics (lowercase, whitespace split, n-word windows) match
``text/decontam.py`` exactly so the two ops share one oracle shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _explode_fn(n: int, id_col: str, text_col: str, num_buckets: int):
    def explode(batch: pa.Table) -> pa.Table:
        # local import: text.decontam itself imports from dedup.ngram, so a
        # module-level import here would be circular via dedup/__init__
        from ..text.decontam import _doc_ngram_hashes

        g_row, h, _ = _doc_ngram_hashes(batch, n, text_col, id_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(h):
            pair = np.unique(np.stack([g_row.astype(np.uint64), h], axis=1), axis=0)
            pr = pair[:, 0].astype(np.int64)
            out_id = ids[pr].astype(np.int64)
            out_h = pair[:, 1].astype(np.int64)  # int64 view of the uint64 hash
            bucket = (pair[:, 1] % np.uint64(num_buckets)).astype(np.int64)
        else:
            out_id = np.empty(0, dtype=np.int64)
            out_h = np.empty(0, dtype=np.int64)
            bucket = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "h": pa.array(out_h),
                "_b": pa.array(bucket),
            }
        )

    return explode


def dup_span_report(
    ds,
    *,
    n: int = 4,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Dataset(id, dup_grams, total_grams, dup_frac) for every document
    that shares at least one verbatim word ``n``-gram with >= ``min_docs``
    documents (itself included). ``dup_grams`` / ``total_grams`` count
    DISTINCT grams; ``dup_frac`` is their ratio — the usual removal
    signal (drop or trim docs above a threshold)."""
    import ray
    from ray.data.aggregate import Sum

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_partitions = 4

    pairs = ds.map_batches(
        _explode_fn(n, id_col, text_col, num_partitions), batch_format="pyarrow"
    )

    def bucket_kernel(g: pa.Table) -> pa.Table:
        doc = g[id_col].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        _, inv, df = np.unique(h, return_inverse=True, return_counts=True)
        is_dup = df[inv] >= min_docs  # pairs are distinct per doc: count == df
        ud, dinv = np.unique(doc, return_inverse=True)
        tot = np.bincount(dinv, minlength=len(ud))
        dup = np.bincount(dinv[is_dup], minlength=len(ud))
        return pa.table(
            {
                id_col: pa.array(ud.astype(np.int64)),
                "dup_grams": pa.array(dup.astype(np.int64)),
                "total_grams": pa.array(tot.astype(np.int64)),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        dg = t["dup_grams"].cast(pa.int64())
        tot = t["total_grams"].cast(pa.int64())
        dgn = dg.to_numpy(zero_copy_only=False)
        keep = dgn >= 1
        frac = np.zeros(len(dgn), dtype=np.float64)
        totn = tot.to_numpy(zero_copy_only=False)
        frac[keep] = dgn[keep] / totn[keep]
        out = pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "dup_grams": dg,
                "total_grams": tot,
                "dup_frac": pa.array(frac, type=pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return (
        pairs.groupby("_b")
        .map_groups(bucket_kernel, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Sum("dup_grams", alias_name="dup_grams"),
            Sum("total_grams", alias_name="total_grams"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def _explode_pos_fn(n: int, id_col: str, text_col: str, num_buckets: int):
    """Positional explode: (doc_id, pos, h, _b) for EVERY n-gram start —
    the removal path needs positions, not the distinct-pair stream."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        from ..dedup.ngram import fnv_fold, fnv_strings

        lst = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        nrows = len(lst)
        offs = np.asarray(lst.offsets, dtype=np.int64)
        offs = offs - offs[0]
        flat = lst.flatten()
        keep = np.asarray(pc.utf8_length(flat)) > 0
        c = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
        new_offs = c[offs]
        flat = flat.filter(pa.array(keep))
        lens = np.diff(new_offs)
        row_id = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        nw = len(row_id)
        i0 = (
            np.flatnonzero(row_id[: nw - n + 1] == row_id[n - 1 :])
            if nw >= n
            else np.empty(0, dtype=np.int64)
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(i0):
            h = fnv_fold(fnv_strings(flat), i0, n)
            g_row = row_id[i0]
            pos = i0 - new_offs[:-1][g_row]  # 0-based token index within doc
            out_id = ids[g_row].astype(np.int64)
            out_h = h.astype(np.int64)
            bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        else:
            out_id = pos = out_h = bucket = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "pos": pa.array(pos.astype(np.int64)),
                "h": pa.array(out_h, type=pa.int64()),
                "_b": pa.array(bucket, type=pa.int64()),
            }
        )

    return explode


def remove_dup_spans(
    ds,
    *,
    n: int = 4,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """The REMOVAL half of ExactSubstr dedup (Lee et al. 2021 cut the
    duplicated bytes out of every document, not just the flagged docs):
    every token covered by a word n-gram that occurs verbatim in >=
    ``min_docs`` distinct documents is removed; the cleaned document is
    the space-joined remainder of the NORMALIZED token stream (lowercase,
    whitespace-split — the corpus tokenization contract, which is what a
    training pipeline feeds the tokenizer anyway).

    Returns Dataset(id, text_clean, n_tokens, n_removed) covering EVERY
    input document (docs with nothing removed pass through normalized).

    Distributed shape — TWO coarse exchanges, no join:
      1. positional explode -> ``groupby(gram-hash bucket)``: every
         occurrence of a gram lands in one bucket, so the kernel computes
         exact distinct-doc df AND filters its own position rows to the
         duplicated grams in one pass — emitting only (doc, pos) starts
         of duplicated spans (web-scale output: the boilerplate subset).
      2. duplicated starts ∪ original text rows -> ``groupby(doc
         bucket)``: the per-doc kernel re-tokenizes its documents, marks
         covered = union of [pos, pos+n), and rebuilds the remainder.
    Hash-vs-string gram identity carries the module's documented FNV
    collision contract.
    """
    import pyarrow.compute as pc

    if num_partitions is None:
        import ray

        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_partitions = 8
    B = num_partitions

    pos_stream = ds.map_batches(
        _explode_pos_fn(n, id_col, text_col, B), batch_format="pyarrow"
    )

    def dup_starts_kernel(g: pa.Table) -> pa.Table:
        doc = g[id_col].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        # distinct-doc df per hash: unique (h, doc) pairs, then counts per h
        pair_h = np.unique(np.stack([h, doc], axis=1), axis=0)[:, 0]
        uh, df = np.unique(pair_h, return_counts=True)
        dup_h = uh[df >= min_docs]
        m = np.isin(h, dup_h)
        return pa.table(
            {
                id_col: pa.array(doc[m].astype(np.int64)),
                "pos": pa.array(pos[m].astype(np.int64)),
            }
        )

    starts = pos_stream.groupby("_b").map_groups(dup_starts_kernel, batch_format="pyarrow")

    def start_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "pos": t["pos"].cast(pa.int64()),
                text_col: pa.nulls(t.num_rows, pa.string()),
                "_db": pa.array(ids % B),
            }
        )

    def text_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "pos": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                text_col: t[text_col],
                "_db": pa.array(ids % B),
            }
        )

    merged = ds.select_columns([id_col, text_col]).map_batches(
        text_rows, batch_format="pyarrow"
    ).union(starts.map_batches(start_rows, batch_format="pyarrow"))

    def rebuild(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = g[id_col].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        is_text = pos < 0
        text_rows_idx = np.flatnonzero(is_text)
        # Tokenize with the SAME Arrow contract as _explode_pos_fn
        # (pc.utf8_lower + RE2 \s+ split + empty filter): Python
        # str.split() splits on Unicode whitespace (e.g. U+00A0) that
        # RE2 \s does not, which would misalign positions.
        txt_arr = g[text_col].take(pa.array(text_rows_idx, type=pa.int64()))
        if isinstance(txt_arr, pa.ChunkedArray):
            txt_arr = txt_arr.combine_chunks()
        txt_arr = pc.fill_null(txt_arr, "")
        lst = pc.split_pattern_regex(pc.utf8_lower(txt_arr), pattern=r"\s+")
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = np.asarray(lst.offsets, dtype=np.int64)
        offs = offs - offs[0]
        flat = lst.flatten()
        keep = np.asarray(pc.utf8_length(flat)) > 0
        c = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
        new_offs = c[offs]
        toks_all = flat.filter(pa.array(keep)).to_pylist()
        out_id, out_txt, out_nt, out_nr = [], [], [], []
        # group the start positions per doc once (sorted scan)
        order = np.argsort(ids[~is_text], kind="stable")
        s_ids = ids[~is_text][order]
        s_pos = pos[~is_text][order]
        bounds = np.searchsorted(s_ids, ids[is_text])
        bounds_hi = np.searchsorted(s_ids, ids[is_text], side="right")
        for k, row in enumerate(text_rows_idx):
            lo, hi = int(new_offs[k]), int(new_offs[k + 1])
            toks = toks_all[lo:hi]
            cov = np.zeros(hi - lo, dtype=bool)
            for p in s_pos[bounds[k] : bounds_hi[k]]:
                cov[p : p + n] = True
            kept = [w for w, c2 in zip(toks, cov) if not c2]
            out_id.append(int(ids[row]))
            out_txt.append(" ".join(kept))
            out_nt.append(len(toks))
            out_nr.append(int(cov.sum()))
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "text_clean": pa.array(out_txt, type=pa.string()),
                "n_tokens": pa.array(out_nt, type=pa.int64()),
                "n_removed": pa.array(out_nr, type=pa.int64()),
            }
        )

    return merged.groupby("_db").map_groups(rebuild, batch_format="pyarrow")
