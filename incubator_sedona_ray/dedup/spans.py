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
                  DISTINCT (doc, gram) pairs, and the per-doc distinct
                  total carried on every pair row (docs never span
                  batches, so the total is exact map-side — it rides the
                  pair shuffle instead of costing a second groupby).
  2. dup grams    groupby(gram hash) count: pairs are distinct per doc, so
                  the count IS the distinct-document frequency; keep
                  grams with count >= min_docs.
  3. attribute    distributed hash join pairs x dup-grams on the hash,
                  then groupby(doc): Count -> dup_grams, Max -> the
                  carried total. Docs with zero shared spans are simply
                  absent (inner join) — at web scale the flagged set is
                  the small output, the clean corpus is never re-shipped.

Both shuffles are keyed on the uint64 FNV gram hash — uniform by
construction, no skew salting needed. The SQL oracle groups by the gram
STRING; parity holds up to (astronomically unlikely) FNV-1a collisions,
the same contract ``text/decontam.py`` ships with.

No counterpart in the reference repo (Sedona has no text dedup); the
n-gram semantics (lowercase, whitespace split, n-word windows) match
``text/decontam.py`` exactly so the two ops share one oracle shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _explode_fn(n: int, id_col: str, text_col: str):
    def explode(batch: pa.Table) -> pa.Table:
        # local import: text.decontam itself imports from dedup.ngram, so a
        # module-level import here would be circular via dedup/__init__
        from ..text.decontam import _doc_ngram_hashes

        g_row, h, _ = _doc_ngram_hashes(batch, n, text_col, id_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(h):
            pair = np.unique(np.stack([g_row.astype(np.uint64), h], axis=1), axis=0)
            pr = pair[:, 0].astype(np.int64)
            out_id = ids[pr]
            out_h = pair[:, 1].astype(np.int64)  # int64 view: Arrow join key
            # distinct-gram total per doc, repeated onto its pair rows
            tot = np.bincount(pr, minlength=batch.num_rows)[pr]
        else:
            out_id = np.empty(0, dtype=np.int64)
            out_h = np.empty(0, dtype=np.int64)
            tot = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "h": pa.array(out_h),
                "tot": pa.array(tot, type=pa.int64()),
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
    from ray.data.aggregate import Count, Max

    from ..state.blocks import safe_hash_join

    if num_partitions is None:
        try:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            num_partitions = 4

    pairs = ds.map_batches(_explode_fn(n, id_col, text_col), batch_format="pyarrow")

    def keep_dup(t: pa.Table) -> pa.Table:
        m = t["_df"].to_numpy(zero_copy_only=False) >= min_docs
        return t.filter(pa.array(m)).drop_columns(["_df"])

    dup = (
        pairs.select_columns(["h"])
        .groupby("h")
        .aggregate(Count(alias_name="_df"))
        .map_batches(keep_dup, batch_format="pyarrow")
    )

    joined = safe_hash_join(
        pairs,
        dup,
        "inner",
        num_partitions,
        on=("h",),
        scrub_left=False,  # pairs stream straight from map_batches
        scrub_right=True,  # groupby-derived: may lead with empty blocks
    )

    def finalize(t: pa.Table) -> pa.Table:
        dg = t["dup_grams"].cast(pa.int64())
        tot = t["total_grams"].cast(pa.int64())
        frac = dg.to_numpy(zero_copy_only=False) / tot.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "dup_grams": dg,
                "total_grams": tot,
                "dup_frac": pa.array(frac, type=pa.float64()),
            }
        )

    return (
        joined.groupby(id_col)
        .aggregate(Count(alias_name="dup_grams"), Max("tot", alias_name="total_grams"))
        .map_batches(finalize, batch_format="pyarrow")
    )
