"""Corpus-wide top-k word n-grams — the training-data vocabulary /
heavy-hitter primitive (e.g. boilerplate detection, contamination
phrases, BPE seed statistics).

Exact, with the shuffle bounded by DISTINCT n-grams rather than rows:

1. **map-side combine** — one ``map_batches`` tokenizes each batch (the
   repo-standard tokenization: lowercase, split ``\\s+``, drop empties —
   identical to bm25/decontam so the DuckDB oracle reproduces it), forms
   the n-grams positionally within each row, and emits each batch's
   ``np.unique`` (ngram, count) pairs — the partial aggregate.
2. **keyed sum** — ``groupby(ngram).sum`` over the pre-aggregated pair
   stream; the all-to-all moves one row per distinct n-gram per batch,
   not one per occurrence.
3. **mergeable top-k** — after the sum each n-gram exists exactly once,
   so a local top-k per block followed by one single-group merge is the
   exact global top-k (same reduction shape as join/knn.py top-k).

Ties break deterministically: (count desc, ngram asc).

At 100 TB the distinct-bigram universe is itself large (billions); the
groupby shuffle is unavoidable for exactness but its payload is the
already-combined pair stream. For an approximate/bounded variant, feed the
per-batch partials into a count-min or SpaceSaving stage instead of the
groupby — the map-side combine here is reusable as-is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bm25 import _tokenize

__all__ = ["ngram_partials", "top_ngrams"]


def _batch_ngrams_arrow(batch: pa.Table, text_col: str, n: int) -> pa.Array:
    """All word n-grams of every row in the batch, space-joined, as one
    Arrow string array — zero Python objects: one flat token buffer,
    positional masks, and a single ``binary_join_element_wise``."""
    import pyarrow.compute as pc

    flat, parent = _tokenize(batch[text_col])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    nt = len(flat)
    if nt < n:
        return pa.array([], pa.string())
    # position j starts an n-gram iff positions j..j+n-1 share a row
    ok = np.ones(nt - n + 1, dtype=bool)
    for d in range(1, n):
        ok &= parent[d : nt - n + 1 + d] == parent[: nt - n + 1]
    starts = np.nonzero(ok)[0]
    if len(starts) == 0:
        return pa.array([], pa.string())
    parts = [flat.take(pa.array(starts + d, type=pa.int64())) for d in range(n)]
    return pc.binary_join_element_wise(*parts, " ")


def _batch_ngrams(batch: pa.Table, text_col: str, n: int) -> np.ndarray:
    """Object-ndarray view of :func:`_batch_ngrams_arrow` (legacy callers)."""
    return np.asarray(_batch_ngrams_arrow(batch, text_col, n).to_pylist(), dtype=object)


def ngram_partials(ds, *, n: int = 2, text_col: str = "text"):
    """Dataset of per-batch (ngram, cnt) partial counts."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        grams = _batch_ngrams_arrow(batch, text_col, n)
        if len(grams) == 0:
            return pa.table({"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(grams)
        return pa.table(
            {
                "ngram": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def top_ngrams(ds, *, n: int = 2, k: int = 20, text_col: str = "text", num_buckets: int | None = None):
    """Exact global top-k (ngram, cnt) Dataset, (count desc, ngram asc).

    The keyed sum runs as a HASH-BUCKETED exchange: partials are tagged
    ``fnv(ngram) % num_buckets`` and a ``groupby(bucket).map_groups``
    kernel (pandas C-speed group-sum + local top-k) finishes each bucket —
    every n-gram lands wholly in one bucket, so per-bucket counts and
    top-ks are exact and their merge is the exact global answer. Ray
    2.49's generic aggregate over millions of distinct STRING keys paid
    ~40 s at 2M pages / 4M distinct bigrams; the coarse-key sort of the
    identical partial stream is ~20x cheaper (the same finding as the
    pagerank/heatmap dense kernels)."""
    import ray as _ray

    from ..dedup.ngram import fnv_strings

    if num_buckets is None:
        try:
            num_buckets = max(2, int(_ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_buckets = 8

    def tag(t: pa.Table) -> pa.Table:
        col = t["ngram"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        b = (fnv_strings(col) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_b", pa.array(b))

    def bucket_topk(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ngram": g["ngram"].to_pylist(),
                "cnt": g["cnt"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby("ngram", sort=False)["cnt"].sum().reset_index()
        top = agg.sort_values(["cnt", "ngram"], ascending=[False, True]).head(k)
        return pa.table(
            {
                "ngram": pa.array(top["ngram"].to_numpy(), pa.string()),
                "cnt": pa.array(top["cnt"].to_numpy(), pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["cnt", "ngram"], ascending=[False, True]).head(k)
        return out[["ngram", "cnt"]].reset_index(drop=True)

    local = (
        ngram_partials(ds, n=n, text_col=text_col)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )
    return (
        local.add_column("_g", lambda b: pd.Series(np.zeros(len(b), dtype=np.int64)))
        .groupby("_g")
        .map_groups(merge, batch_format="pandas")
    )


def top_collocations(
    ds,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    mode: str = "auto",
    broadcast_max_words: int = 5_000_000,
    num_partitions: int | None = None,
):
    """Top-k word-pair collocations by LIFT — PMI's argument without the
    log: lift(a,b) = P(ab) / (P(a) P(b)) computed as
    ``(c_ab * N_uni * N_uni) / (c_a * c_b * N_bi)`` from EXACT integer
    counts in one fixed float64 expression (a log would re-introduce libm
    rounding differences across engines; the ordering is identical).

    Three count layers, each map-side combined: unigram counts and bigram
    counts are distinct-key groupby sums. The per-bigram unigram lookup
    has two shapes (``mode``):

    * ``broadcast`` — the (word, count) table collects to the driver,
      sorts once, ships via ``ray.put`` and every bigram batch probes it
      with ``np.searchsorted``. Right for vocabularies up to
      ``broadcast_max_words``.
    * ``join`` — NO driver collection: the min_count-surviving bigram
      table splits its two words into columns and hash-joins the unigram
      table twice (left word, then right word) — the 100 TB path where
      the distinct-unigram table is itself tens of GB (same shape as
      text/decontam.py join mode).
    * ``auto`` — join iff ``uni.count() > broadcast_max_words``.

    Both shapes are exact and identical (inner joins drop nothing: every
    bigram word IS a corpus unigram). Output: (ngram, cnt, lift), ties
    (lift desc, ngram asc).
    """
    import ray

    uni = (
        ngram_partials(ds, n=1, text_col=text_col)
        .groupby("ngram")
        .sum("cnt")
    )
    bi = (
        ngram_partials(ds, n=2, text_col=text_col)
        .groupby("ngram")
        .sum("cnt")
    )

    # global totals: O(blocks) partial sums
    def total_of(d):
        parts = d.map_batches(
            lambda b: pa.table(
                {"t": pa.array([int(np.sum(b["sum(cnt)"].to_numpy(zero_copy_only=False)))], pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).to_pandas()
        return int(parts["t"].sum())

    n_uni, n_bi = total_of(uni), total_of(bi)

    if mode == "auto":
        mode = "broadcast" if uni.count() <= broadcast_max_words else "join"

    def topk_table(grams: np.ndarray, cnt: np.ndarray, ca: np.ndarray, cb: np.ndarray) -> pa.Table:
        lift = (
            cnt.astype(np.float64) * np.float64(n_uni) * np.float64(n_uni)
        ) / (ca.astype(np.float64) * cb.astype(np.float64) * np.float64(n_bi))
        order = np.lexsort((grams, -lift))[:k]
        return pa.table(
            {
                "ngram": pa.array(grams[order], pa.string()),
                "cnt": pa.array(cnt[order], pa.int64()),
                "lift": pa.array(lift[order], pa.float64()),
            }
        )

    _EMPTY = pa.table(
        {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()), "lift": pa.array([], pa.float64())}
    )

    if mode == "broadcast":
        uni_df = uni.to_pandas().sort_values("ngram")
        uref = ray.put(
            {
                "w": uni_df["ngram"].to_numpy(dtype=object).astype("U"),
                "c": uni_df["sum(cnt)"].to_numpy().astype(np.int64),
            }
        )

        def score(batch: pa.Table, u) -> pa.Table:
            cnt = batch["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
            grams = np.asarray(batch["ngram"].to_pylist(), dtype=object)
            keep = cnt >= min_count
            grams, cnt = grams[keep], cnt[keep]
            if len(grams) == 0:
                return _EMPTY
            splits = np.char.partition(grams.astype("U"), " ")
            ca = u["c"][np.searchsorted(u["w"], splits[:, 0])]
            cb = u["c"][np.searchsorted(u["w"], splits[:, 2])]
            return topk_table(grams, cnt, ca, cb)

        from ..partition.assign import broadcast_map_batches

        local = broadcast_map_batches(bi, score, {"u": uref}, batch_size=None)
    elif mode == "join":
        from ..state.blocks import safe_hash_join

        if num_partitions is None:
            try:
                num_partitions = max(4, int(ray.cluster_resources().get("CPU", 4)))
            except Exception:
                num_partitions = 8

        def split_words(t: pa.Table) -> pa.Table:
            cnt = t["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = cnt >= min_count
            grams = np.asarray(t["ngram"].to_pylist(), dtype=object)[keep]
            if len(grams) == 0:
                return pa.table(
                    {
                        "ngram": pa.array([], pa.string()),
                        "cnt": pa.array([], pa.int64()),
                        "wa": pa.array([], pa.string()),
                        "wb": pa.array([], pa.string()),
                    }
                )
            splits = np.char.partition(grams.astype("U"), " ")
            return pa.table(
                {
                    "ngram": pa.array(grams, pa.string()),
                    "cnt": pa.array(cnt[keep], pa.int64()),
                    "wa": pa.array(splits[:, 0], pa.string()),
                    "wb": pa.array(splits[:, 2], pa.string()),
                }
            )

        def uni_as(word_col: str, cnt_col: str):
            return uni.map_batches(
                lambda t, _w=word_col, _c=cnt_col: pa.table(
                    {_w: t["ngram"], _c: t["sum(cnt)"].cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )

        joined = safe_hash_join(
            bi.map_batches(split_words, batch_format="pyarrow"),
            uni_as("wa", "ca"),
            "inner",
            num_partitions,
            on=("wa",),
        )
        joined = safe_hash_join(
            joined, uni_as("wb", "cb"), "inner", num_partitions, on=("wb",)
        )

        def score_joined(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _EMPTY
            grams = np.asarray(batch["ngram"].to_pylist(), dtype=object)
            cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
            ca = batch["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
            cb = batch["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
            return topk_table(grams, cnt, ca, cb)

        local = joined.map_batches(score_joined, batch_format="pyarrow", batch_size=None)
    else:
        raise ValueError(f"unknown top_collocations mode {mode!r}")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["lift", "ngram"], ascending=[False, True]).head(k)
        return out[["ngram", "cnt", "lift"]].reset_index(drop=True)

    return (
        local.add_column("_g", lambda b: pd.Series(np.zeros(len(b), dtype=np.int64)))
        .groupby("_g")
        .map_groups(merge, batch_format="pandas")
    )
