"""DSIR-style data selection via hashed/exact n-gram importance
resampling (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169): fit a bag-of-ngrams model on
a small TARGET domain and on the RAW corpus, score every raw document by
how much more target-like than raw-like its n-grams are, and keep the
top-scoring documents.

EXACT INTEGER VARIANT: the paper's importance weight is a log-ratio sum
(irrational, float-summation-order-dependent — impossible to bit-compare
against a SQL oracle). Here each word's importance is the FIXED-POINT
LINEAR ratio

    r(w) = ((ct(w) + 1) * scale) // (cr(w) + 1)

(``ct``/``cr`` = target/raw unigram counts, add-one smoothed) and a
document's score is the BIGINT sum of ``r`` over its token multiset —
order-independent, integer-exact, and monotone in the same per-token
target-affinity the log weight ranks on. OVERFLOW: (max ct + 1) * scale
must stay < 2^62; the default scale 10^6 holds to ~4x10^12 target
tokens.

Tokenization is the corpus-wide whitespace/lowercase contract shared
with bm25/ngrams/backoff_lm (text/bm25.py ``_tokenize``), so engine and
SQL see identical tokens.

Distributed shape (the same two-regime design as text/backoff_lm.py):
- counts: two ``_keyed_counts`` passes (per-batch value_counts partials
  -> fnv-bucketed group-sum; vocabulary-bounded output Datasets).
- mode="broadcast" (default): both count tables collect ONCE into
  sorted numpy arrays (vocabulary-bounded — the DSIR paper's own hashed
  feature space is 10^4 buckets; a raw web vocabulary is ~10^8 rows,
  a few GB), the ratio table is computed vectorized on the driver and
  ``ray.put`` once, and scoring is a single zero-shuffle map_batches
  pass (searchsorted + np.add.at per-doc sums).
- mode="join" (the path for vocabularies beyond driver memory): the
  ratio table is built distributed (cr INNER JOIN ct, UNION cr ANTI ct
  at ct=0 — safe_hash_join has no outer join), the token stream explodes
  to (doc_id, w) rows, one hash join attaches r, and per-doc sums run as
  an fnv-bucketed groupby. Zero-token documents re-enter at score 0 via
  a left-anti join. Both modes bit-identical.
- selection: deterministic top-k by (score DESC, doc_id ASC) as a
  mergeable reduction — local top-k per batch, single-group merge —
  zero extra shuffles (same kernel shape as dedup/sample.py
  ``sample_fixed_k``).

No counterpart in the reference repo (Sedona has no text ops); part of
the training-data-pipeline family the project brief makes first-class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .backoff_lm import _collect_counts, _keyed_counts
from .bm25 import _tokenize

__all__ = ["dsir_scores", "dsir_select"]

DSIR_SCALE = 1_000_000


def dsir_scores(
    ds,
    target,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = DSIR_SCALE,
    mode: str = "broadcast",
    num_buckets: int | None = None,
):
    """Dataset(doc_id, score) for every row of ``ds`` — BIGINT target-
    affinity scores per the module formula. ``target`` is a Dataset of
    target-domain documents (same text column contract)."""
    import ray

    cr_ds = _keyed_counts(ds, n=1, text_col=text_col, num_buckets=num_buckets)
    ct_ds = _keyed_counts(target, n=1, text_col=text_col, num_buckets=num_buckets)

    if mode == "broadcast":
        import concurrent.futures

        import pyarrow.compute as pc

        # the two count pipelines are independent — drive both Dataset
        # executions concurrently (same pattern as spatial_join's two
        # side-summary passes)
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
            crf = ex.submit(_collect_counts, cr_ds)
            ctf = ex.submit(_collect_counts, ct_ds)
            cr_w, cr_c = crf.result()
            ct_w, ct_c = ctf.result()
        # project target counts onto the raw vocabulary (the raw model IS
        # this corpus, so it covers every token the scoring pass will see)
        ct_full = np.zeros(len(cr_w), dtype=np.int64)
        if len(ct_w) and len(cr_w):
            ids = (
                pc.index_in(ct_w, value_set=cr_w)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            hit = ids >= 0
            ct_full[ids[hit]] = ct_c[hit]
        ratio = ((ct_full + 1) * int(scale)) // (cr_c + 1)
        lut = ray.put({"w": cr_w, "r": ratio})

        def score_fn(batch: pa.Table, lut) -> pa.Table:
            flat, parent = _tokenize(batch[text_col])
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            out = np.zeros(batch.num_rows, dtype=np.int64)
            if len(flat) and len(lut["w"]):
                fid = (
                    pc.index_in(flat, value_set=lut["w"])
                    .fill_null(-1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                r = np.where(fid >= 0, lut["r"][np.maximum(fid, 0)], 0)
                np.add.at(out, parent, r)
            return pa.table(
                {id_col: batch[id_col], "score": pa.array(out, pa.int64())}
            )

        from ..partition.assign import broadcast_map_batches

        return broadcast_map_batches(
            ds.select_columns([id_col, text_col]),
            score_fn,
            {"lut": lut},
            # whole-block batches: index_in re-hashes the vocabulary
            # value_set on EVERY call, so 1024-row default batches pay
            # the O(|vocab|) build ~30x per block (measured 14.5s -> the
            # hash build dominating the scoring pass at 2M pages)
            batch_size=None,
        )

    if mode != "join":
        raise ValueError(f"unknown dsir mode: {mode!r}")

    from ..state.blocks import safe_hash_join

    # distributed ratio table: cr INNER ct (+1 smoothing) UNION cr ANTI ct
    both = safe_hash_join(
        cr_ds, ct_ds, "inner", on=("ngram",), right_on=("ngram",),
        num_partitions=_jp(), right_suffix="_t",
    )

    def ratio_both(b: pa.Table) -> pa.Table:
        cr = b["cnt"].to_numpy(zero_copy_only=False)
        ct = b["cnt_t"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": b["ngram"],
                "r": pa.array(((ct + 1) * int(scale)) // (cr + 1), pa.int64()),
            }
        )

    missing = safe_hash_join(
        cr_ds, ct_ds, "left_anti", on=("ngram",), right_on=("ngram",),
        num_partitions=_jp(),
    )

    def ratio_missing(b: pa.Table) -> pa.Table:
        cr = b["cnt"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"w": b["ngram"], "r": pa.array(int(scale) // (cr + 1), pa.int64())}
        )

    ratio_ds = both.map_batches(ratio_both, batch_format="pyarrow").union(
        missing.map_batches(ratio_missing, batch_format="pyarrow")
    )

    def explode(batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[parent].astype(np.int64)),
                "w": flat if isinstance(flat, pa.Array) else pa.array(flat, pa.string()),
            }
        )

    toks = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    j = safe_hash_join(
        toks, ratio_ds, "inner", on=("w",), right_on=("w",), num_partitions=_jp()
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({id_col: b[id_col], "score": b["r"]})
        return (
            t.group_by(id_col).aggregate([("score", "sum")]).rename_columns([id_col, "score"])
        )

    scored = (
        j.map_batches(partial, batch_format="pyarrow").groupby(id_col).sum("score")
    ).map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "score": pa.array(np.asarray(b["sum(score)"], dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    # zero-token docs never reached the join — re-enter at score 0
    empties = safe_hash_join(
        ds.select_columns([id_col]), scored.select_columns([id_col]),
        "left_anti", on=(id_col,), right_on=(id_col,), num_partitions=_jp(),
    ).map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "score": pa.array(np.zeros(b.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    return scored.union(empties)


def _jp() -> int:
    from ..dedup.minhash import _default_join_partitions

    return _default_join_partitions()


def dsir_select(
    ds,
    target,
    k: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = DSIR_SCALE,
    mode: str = "broadcast",
    num_buckets: int | None = None,
):
    """Dataset(doc_id, score, rank) — the k most target-like documents,
    deterministic (score DESC, doc_id ASC), rank 1-based. Top-k is a
    mergeable reduction: local top-k per batch, one single-group merge;
    only k rows per batch ever move."""
    scored = dsir_scores(
        ds, target, text_col=text_col, id_col=id_col, scale=scale, mode=mode,
        num_buckets=num_buckets,
    )

    def local(b: pa.Table) -> pa.Table:
        df = b.select([id_col, "score"]).to_pandas()
        df = df.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df.drop(columns=["_g"])

    cand = scored.map_batches(local, batch_format="pyarrow", batch_size=None)
    return (
        cand.add_column("_g", lambda b: pd.Series(np.zeros(len(b), dtype=np.int64)))
        .groupby("_g")
        .map_groups(merge, batch_format="pandas")
    )
