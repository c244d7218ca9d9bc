"""Test-set decontamination — the n-gram-overlap filter every LLM training
pipeline runs before training (remove documents that leak benchmark/eval
text; Brown et al. 2020 §C used 13-gram overlap, PaLM/Llama use 8-10).

A train document is CONTAMINATED when it shares at least one word n-gram
with the held-out set. Two distributed shapes, chosen by the test-set size:

  broadcast (default — real eval suites are MBs, not TBs):
    test set -> distinct n-gram FNV hashes (per-batch unique + driver
    merge, O(|test n-grams|) driver memory by contract) -> ``ray.put``
    once -> every train batch probes the sorted array with
    ``np.searchsorted``. ZERO shuffles over the 100 TB train side — the
    only full pass is the streaming probe itself.

  join (both sides large):
    explode both sides to (id, hash) with in-batch dedup -> distinct test
    hashes via groupby -> distributed hash join -> per-doc distinct-hit
    count. No driver collection anywhere.

N-grams are lowercased, whitespace-split, single-space-joined — exactly
``array_to_string(ws[i:i+n-1], ' ')`` over DuckDB's
``regexp_split_to_array(lower(text), '\\s+')``, so the SQL oracle matches
up to (astronomically unlikely) FNV-1a collisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dedup.ngram import fnv_fold, fnv_strings


def _doc_ngram_hashes(batch: pa.Table, n: int, text_col: str, id_col: str | None):
    """(row_ids, uint64 hashes) of every word n-gram in the batch, plus the
    per-row n-gram total. Vectorized end-to-end: one RE2 split over the
    whole batch, per-word FNV straight from the Arrow buffers, and an
    n-pass word-hash fold — no joined strings, no Python loop over grams."""
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
    if nw >= n:
        # a start index i is valid when words i..i+n-1 sit in the same row
        i0 = np.flatnonzero(row_id[: nw - n + 1] == row_id[n - 1 :])
    else:
        i0 = np.empty(0, dtype=np.int64)
    if len(i0):
        word_h = fnv_strings(flat)
        h = fnv_fold(word_h, i0, n)
        g_row = row_id[i0]
    else:
        h = np.empty(0, dtype=np.uint64)
        g_row = np.empty(0, dtype=np.int64)
    n_grams = np.bincount(g_row, minlength=nrows)
    return g_row, h, n_grams


def heldout_ngram_hashes(test_ds, n: int = 8, text_col: str = "text") -> np.ndarray:
    """Sorted distinct uint64 n-gram hashes of the test set, collected to
    the driver. SMALL-SIDE ONLY by contract (eval suites, not corpora) —
    per-batch unique shrinks what ships; use mode='join' when the held-out
    side is itself web-scale."""

    def hashes(batch: pa.Table) -> pa.Table:
        _, h, _ = _doc_ngram_hashes(batch, n, text_col, None)
        return pa.table({"h": pa.array(np.unique(h))})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in test_ds.map_batches(hashes, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def contamination_report(
    train_ds,
    test_ds=None,
    *,
    test_hashes: np.ndarray | None = None,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "broadcast",
    num_partitions: int | None = None,
):
    """Dataset(id, n_hits) for every contaminated train document, where
    ``n_hits`` counts DISTINCT test n-grams the document contains."""
    import ray

    if mode == "join":
        return _report_join(train_ds, test_ds, n, id_col, text_col, num_partitions)
    if test_hashes is None:
        test_hashes = heldout_ngram_hashes(test_ds, n=n, text_col=text_col)
    ref = ray.put(test_hashes)

    class Probe:
        def __init__(self):
            self.table = ray.get(ref)  # fetched ONCE per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            g_row, h, _ = _doc_ngram_hashes(batch, n, text_col, id_col)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            if len(h):
                # distinct (row, hash) before probing so n_hits counts
                # distinct contaminated n-grams, not occurrences
                pair = np.unique(np.stack([g_row.astype(np.uint64), h], axis=1), axis=0)
                pr, ph = pair[:, 0].astype(np.int64), pair[:, 1]
                pos = np.searchsorted(self.table, ph)
                pos[pos >= len(self.table)] = max(len(self.table) - 1, 0)
                hit = (
                    self.table[pos] == ph
                    if len(self.table)
                    else np.zeros(len(ph), dtype=bool)
                )
                hits = np.bincount(pr[hit], minlength=batch.num_rows)
            else:
                hits = np.zeros(batch.num_rows, dtype=np.int64)
            m = hits > 0
            return pa.table(
                {
                    id_col: pa.array(ids[m], type=pa.int64()),
                    "n_hits": pa.array(hits[m], type=pa.int64()),
                }
            )

    return train_ds.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 8))


def _report_join(train_ds, test_ds, n, id_col, text_col, num_partitions):
    """Both-sides-large shape: distinct test hashes via groupby, distributed
    hash join, per-doc count. Streaming everywhere."""
    import ray
    from ray.data.aggregate import Count

    from ..state.blocks import safe_hash_join

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4

    def explode(batch: pa.Table) -> pa.Table:
        g_row, h, _ = _doc_ngram_hashes(batch, n, text_col, id_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(h):
            pair = np.unique(np.stack([g_row.astype(np.uint64), h], axis=1), axis=0)
            out_id = ids[pair[:, 0].astype(np.int64)]
            out_h = pair[:, 1].astype(np.int64)  # int64 view for Arrow keys
        else:
            out_id = np.empty(0, dtype=np.int64)
            out_h = np.empty(0, dtype=np.int64)
        return pa.table(
            {id_col: pa.array(out_id, type=pa.int64()), "h": pa.array(out_h)}
        )

    def test_explode(batch: pa.Table) -> pa.Table:
        _, h, _ = _doc_ngram_hashes(batch, n, text_col, None)
        return pa.table({"h": pa.array(np.unique(h).astype(np.int64))})

    test_distinct = (
        test_ds.map_batches(test_explode, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    train_pairs = train_ds.map_batches(explode, batch_format="pyarrow")
    joined = safe_hash_join(
        train_pairs,
        test_distinct,
        "inner",
        num_partitions,
        on=("h",),
        scrub_left=False,  # train side streams; test side is groupby-derived
        scrub_right=True,
    )
    return (
        joined.groupby(id_col)
        .aggregate(Count(alias_name="n_hits"))
        .map_batches(
            lambda t: pa.table(
                {id_col: t[id_col].cast(pa.int64()), "n_hits": t["n_hits"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )


def decontaminate(
    train_ds,
    test_ds,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "broadcast",
    num_partitions: int | None = None,
):
    """Train docs with every contaminated document REMOVED (the actual
    pre-training filter). Broadcast mode filters inline in one streaming
    pass; join mode anti-joins the report back."""
    import ray

    if mode == "broadcast":
        hashes = heldout_ngram_hashes(test_ds, n=n, text_col=text_col)
        ref = ray.put(hashes)

        class Filter:
            def __init__(self):
                self.table = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                g_row, h, _ = _doc_ngram_hashes(batch, n, text_col, id_col)
                bad = np.zeros(batch.num_rows, dtype=bool)
                if len(h) and len(self.table):
                    pos = np.searchsorted(self.table, h)
                    pos[pos >= len(self.table)] = len(self.table) - 1
                    hit = self.table[pos] == h
                    bad[np.unique(g_row[hit])] = True
                return batch.filter(pa.array(~bad))

        return train_ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))

    report = contamination_report(
        train_ds, test_ds, n=n, id_col=id_col, text_col=text_col,
        mode="join", num_partitions=num_partitions,
    )
    from ..state.blocks import safe_hash_join

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4
    return safe_hash_join(
        train_ds,
        report,
        "left_anti",
        num_partitions,
        on=(id_col,),
        scrub_left=False,
        scrub_right=True,
    )
