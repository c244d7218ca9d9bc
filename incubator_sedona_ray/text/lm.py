"""Corpus-level bigram familiarity scoring — the from-scratch analogue of
CCNet's LM-perplexity quality filter (Wenzek et al. 2020): fit n-gram
statistics on the corpus itself, then score every document by how familiar
its word transitions are. Documents of unusual/garbled text score low.

The score is deliberately integer-exact (no log/exp): per document,
``familiarity = sum(corpus_count[bigram] for seen bigrams) / n_bigrams``
where the model keeps only bigrams with corpus count >= ``min_count``
(singleton pruning — the step that makes the model table web-scale viable).
One IEEE division at the end means the DuckDB oracle reproduces the value
bit-identically, unlike a log-prob whose libm could differ in the last ulp.

Distributed shape (all stages streaming):
  fit:   explode+local-combine (Arrow group_by per batch) -> one
         ``groupby(bigram).sum`` shuffle -> count filter. The model is a
         DATASET, never collected to the driver.
  score: explode (doc_id, bigram, multiplicity) -> distributed hash join
         against the model (no broadcast — the model may exceed worker
         memory at 100 TB) -> per-doc sum, merged with the locally-computed
         denominator by a union + groupby (avoids outer-join block faults).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _doc_bigrams(batch: pa.Table, text_col: str, id_col: str | None):
    """(ids?, bigram strings) for all adjacent non-empty word pairs, plus
    per-input-row bigram totals. Vectorized: RE2 split, row-masked adjacent
    pair join, Arrow take."""
    lst = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), pattern=r"\s+")
    lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
    n = len(lst)
    offs = np.asarray(lst.offsets, dtype=np.int64)
    offs = offs - offs[0]
    flat = lst.flatten()
    keep = np.asarray(pc.utf8_length(flat)) > 0
    c = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
    new_offs = c[offs]
    flat = flat.filter(pa.array(keep))
    lens = np.diff(new_offs)
    row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(row_id) > 1:
        adj = row_id[1:] == row_id[:-1]
        i0 = np.flatnonzero(adj)
        bigrams = pc.binary_join_element_wise(
            flat.take(pa.array(i0)), flat.take(pa.array(i0 + 1)), " "
        )
        b_row = row_id[i0]
    else:
        bigrams = pa.array([], type=pa.string())
        b_row = np.empty(0, dtype=np.int64)
    n_bigrams = np.bincount(b_row, minlength=n)
    ids = (
        batch[id_col].to_numpy(zero_copy_only=False)[b_row] if id_col is not None else None
    )
    return ids, bigrams, n_bigrams


def bigram_counts_fn(text_col: str = "text"):
    """Batch fn for the FIT pass: local (bigram, m) partial counts — the
    per-batch Arrow ``group_by`` combine shrinks the shuffle by the average
    in-batch multiplicity before the global sum."""

    def fn(batch: pa.Table) -> pa.Table:
        _, bigrams, _ = _doc_bigrams(batch, text_col, None)
        t = pa.table({"bigram": bigrams})
        g = t.group_by("bigram").aggregate([("bigram", "count")])
        return g.rename_columns(["bigram", "m"])

    return fn


def fit_bigram_model(ds, text_col: str = "text", min_count: int = 2):
    """Corpus bigram model: Dataset(bigram, c) with c >= min_count."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(bigram_counts_fn(text_col), batch_format="pyarrow")
    counts = partials.groupby("bigram").aggregate(Sum("m", alias_name="c"))

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["c"], min_count))

    return counts.map_batches(filt, batch_format="pyarrow")


def familiarity_scores(
    ds,
    model=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    num_partitions: int | None = None,
):
    """Dataset(id, text) -> Dataset(id, n_bigrams, familiarity). ``model``
    defaults to fitting on ``ds`` itself (the CCNet self-fit setup)."""
    import ray
    from ray.data.aggregate import Sum

    from ..state.blocks import safe_hash_join

    if model is None:
        model = fit_bigram_model(ds, text_col=text_col, min_count=min_count)
    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4

    def explode(batch: pa.Table) -> pa.Table:
        ids, bigrams, _ = _doc_bigrams(batch, text_col, id_col)
        t = pa.table({id_col: pa.array(ids, type=pa.int64()), "bigram": bigrams})
        g = t.group_by([id_col, "bigram"]).aggregate([("bigram", "count")])
        return g.rename_columns([id_col, "bigram", "m"])

    def denom(batch: pa.Table) -> pa.Table:
        _, _, n_bigrams = _doc_bigrams(batch, text_col, None)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "s": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                "n": pa.array(n_bigrams, type=pa.int64()),
            }
        )

    doc_bigrams = ds.map_batches(explode, batch_format="pyarrow")
    # doc side streams (scrub would materialize the exploded corpus); the
    # model side is groupby-derived, so it takes the empty-block scrub
    joined = safe_hash_join(
        doc_bigrams,
        model,
        "inner",
        num_partitions,
        on=("bigram",),
        scrub_left=False,
        scrub_right=True,
    )

    def contrib(t: pa.Table) -> pa.Table:
        s = pc.multiply(t["m"].cast(pa.int64()), t["c"].cast(pa.int64()))
        return pa.table(
            {
                id_col: t[id_col],
                "s": s,
                "n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    num = joined.map_batches(contrib, batch_format="pyarrow")
    den = ds.map_batches(denom, batch_format="pyarrow")
    merged = num.union(den).groupby(id_col).aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False)
        fam = np.where(n > 0, s / np.maximum(n, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_bigrams": t["n"].cast(pa.int64()),
                "familiarity": pa.array(fam, type=pa.float64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")
