"""Conditional n-gram language-model scoring with stupid backoff — the
proper-LM sibling of text/lm.py's corpus-familiarity filter (CCNet,
Wenzek et al. 2020, trains a small LM and keeps documents whose text the
model finds likely; Kneser-Ney/KenLM in the paper, stupid backoff here —
Brants et al. 2007 showed backoff-without-discounting is the right trade
at web scale). Where lm.py scores raw bigram familiarity (sum of corpus
counts), this module scores CONDITIONAL transition probabilities
p(w2|w1) with an unseen-bigram backoff — the quantity a perplexity
filter actually thresholds — and supports scoring a corpus DIFFERENT
from the training corpus (the eval-set / recrawl setup).

EXACT INTEGER ARITHMETIC: the backoff factor 0.4 is the RATIONAL 2/5, so
every per-token probability is a single floor division in fixed point
(``scale`` units per unit of probability):

    p(w2 | w1) = (cnt2(w1 w2) * scale) // cnt1(w1)        if bigram seen
               = (2 * cnt1(w2) * scale) // (5 * T)        else (backoff)
               = 0                                        if w2 unseen

and a document's score is the integer mean ``sum(p) // n_pairs`` over
its adjacent-token pairs (0 for docs with <2 tokens). Log-space
perplexity would need irrational logs — summation-order-dependent in
float and impossible to bit-compare against a SQL engine; the linear
mean-probability score is order-independent, integer-exact, and ranks
documents for filtering just as well (it is monotone in the same
per-token likelihoods). OVERFLOW BOUND: max_count x scale < 2^62 —
the default scale 10^6 holds to ~4x10^12 total training tokens; lower
``scale`` beyond that.

Tokenization is the corpus-wide whitespace/lowercase contract shared
with bm25/ngrams (text/bm25.py ``_tokenize``) so counts, scoring, and
the SQL oracle all see identical tokens.

Distributed shape:
- train: per-batch ``value_counts`` partials -> fnv-hash-bucketed
  group-sum (the repo's standard fix for Ray 2.49's slow
  high-cardinality aggregate; same as text/ngrams.py) — two passes,
  one coarse exchange each; count tables stay distributed Datasets.
- score, broadcast mode: the count tables are collected once into
  sorted numpy key arrays and ``ray.put`` (unigrams are
  vocabulary-bounded; bigrams must fit the driver — the small-model
  contract, like bm25's idf broadcast); scoring is then a SINGLE
  zero-shuffle ``map_batches`` pass (searchsorted lookups + bincount
  per-doc sums).
- score, join mode (the 100 TB path — web-scale bigram tables are
  billions of rows): explode adjacent pairs, three hash joins against
  the distributed count tables (state/blocks.py ``safe_hash_join``),
  then a bucketed per-doc integer sum. Both modes bit-identical.

No counterpart in the reference repo (Sedona has no text ops); the
operator belongs to the training-data-pipeline family the project brief
makes first-class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import _tokenize
from .ngrams import ngram_partials

__all__ = ["ngram_lm_train", "lm_score"]

BACKOFF_NUM = 2  # stupid-backoff alpha = 2/5 = 0.4, kept rational
BACKOFF_DEN = 5


def _keyed_counts(ds, *, n: int, text_col: str, num_buckets: int | None = None):
    """Exact global (ngram, cnt) Dataset via partials + fnv-bucketed
    group-sum (full table — top_ngrams' kernel without the top-k)."""
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

    def bucket_sum(g: pa.Table) -> pa.Table:
        # Arrow-native hash aggregate — no to_pylist / pandas object dtype
        agg = (
            g.select(["ngram", "cnt"])
            .group_by("ngram")
            .aggregate([("cnt", "sum")])
        )
        return pa.table(
            {
                "ngram": agg["ngram"],
                "cnt": pc.cast(agg["cnt_sum"], pa.int64()),
            }
        )

    return (
        ngram_partials(ds, n=n, text_col=text_col)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )


def ngram_lm_train(ds, *, text_col: str = "text", num_buckets: int | None = None) -> dict:
    """Train the bigram LM: {"uni": Dataset(ngram, cnt), "bi":
    Dataset(ngram, cnt), "total": int} — ``total`` is the corpus token
    count (the unigram count mass). Count tables stay distributed.

    ONE corpus pass computes both orders' partials (tokenization is the
    dominant cost — a separate pass per order measured ~2x the train
    wall): unigram keys never contain a space and bigram keys always do,
    so the mixed count table splits back loss-free."""
    import pyarrow.compute as pc
    import ray as _ray

    from ..dedup.ngram import fnv_strings

    if num_buckets is None:
        try:
            num_buckets = max(2, int(_ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_buckets = 8
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        # tokenize ONCE; unigram counts straight off the flat tokens,
        # bigram counts off the masked adjacent join of the same buffer
        flat, parent = _tokenize(batch[text_col])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        outs = []
        if len(flat):
            vc = pc.value_counts(flat)
            outs.append(
                pa.table(
                    {"ngram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
                )
            )
            if len(flat) >= 2:
                ok = parent[1:] == parent[:-1]
                starts = np.nonzero(ok)[0]
                if len(starts):
                    grams = pc.binary_join_element_wise(
                        flat.take(pa.array(starts, type=pa.int64())),
                        flat.take(pa.array(starts + 1, type=pa.int64())),
                        " ",
                    )
                    vc = pc.value_counts(grams)
                    outs.append(
                        pa.table(
                            {
                                "ngram": vc.field("values"),
                                "cnt": vc.field("counts").cast(pa.int64()),
                            }
                        )
                    )
        if not outs:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        return pa.concat_tables(outs)

    def tag(t: pa.Table) -> pa.Table:
        col = t["ngram"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        b = (fnv_strings(col) % np.uint64(nb)).astype(np.int64)
        return t.append_column("_b", pa.array(b))

    def bucket_sum(g: pa.Table) -> pa.Table:
        # Arrow-native hash aggregate — no to_pylist / pandas object dtype
        agg = (
            g.select(["ngram", "cnt"])
            .group_by("ngram")
            .aggregate([("cnt", "sum")])
        )
        return pa.table(
            {
                "ngram": agg["ngram"],
                "cnt": pc.cast(agg["cnt_sum"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pyarrow")
        .materialize()
    )

    def is_uni(t: pa.Table, want: bool) -> pa.Table:
        import pyarrow.compute as _pc

        m = _pc.equal(_pc.count_substring(t["ngram"], " "), 0)
        return t.filter(m if want else _pc.invert(m))

    uni = counts.map_batches(lambda t: is_uni(t, True), batch_format="pyarrow").materialize()
    bi = counts.map_batches(lambda t: is_uni(t, False), batch_format="pyarrow").materialize()
    total = int(uni.sum("cnt") or 0)
    return {"uni": uni, "bi": bi, "total": total}


def _doc_pairs(batch: pa.Table, text_col: str):
    """(w1, w2, gram, pair_parent) of every adjacent token pair in the
    batch — flat Arrow arrays + the owning row index."""
    import pyarrow.compute as pc

    flat, parent = _tokenize(batch[text_col])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    nt = len(flat)
    if nt < 2:
        e = pa.array([], pa.string())
        return e, e, e, np.empty(0, dtype=np.int64)
    ok = parent[1:] == parent[:-1]
    starts = np.nonzero(ok)[0]
    if len(starts) == 0:
        e = pa.array([], pa.string())
        return e, e, e, np.empty(0, dtype=np.int64)
    w1 = flat.take(pa.array(starts, type=pa.int64()))
    w2 = flat.take(pa.array(starts + 1, type=pa.int64()))
    gram = pc.binary_join_element_wise(w1, w2, " ")
    return w1, w2, gram, parent[starts]


def _arrow_lookup(keys: pa.Array, cnts: np.ndarray, q: pa.Array) -> np.ndarray:
    """cnt for each q string (0 when absent) via the vectorized C++ hash
    lookup ``pc.index_in`` — exact string equality, no Python compares."""
    import pyarrow.compute as pc

    if len(q) == 0:
        return np.empty(0, dtype=np.int64)
    if len(keys) == 0:
        return np.zeros(len(q), dtype=np.int64)
    idx = pc.index_in(q, value_set=keys)
    miss = idx.is_null().to_numpy(zero_copy_only=False)
    pos = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    out = cnts[pos]
    out[miss] = 0
    return out


def _pair_probs(cnt2, cnt1, cntw2, total: int, scale: int) -> np.ndarray:
    """The exact fixed-point stupid-backoff probability per pair. cnt1 is
    guarded to >=1 — a seen bigram implies a seen w1 in any model trained
    on a superset of the scored text, so the guard never changes a value,
    it only keeps a zero-denominator out of the kernel on foreign docs."""
    p = np.zeros(len(cnt2), dtype=np.int64)
    seen = cnt2 > 0
    p[seen] = (cnt2[seen] * scale) // np.maximum(cnt1[seen], 1)
    bo = (~seen) & (cntw2 > 0)
    if total > 0:
        p[bo] = (BACKOFF_NUM * cntw2[bo] * scale) // (BACKOFF_DEN * total)
    return p


def lm_score(
    docs,
    model: dict,
    *,
    scale: int = 10**6,
    doc_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "broadcast",
    num_buckets: int | None = None,
):
    """Dataset(doc_id, n_pairs:int64, score_fp:int64) — the integer mean
    stupid-backoff probability over each document's adjacent token pairs
    (``scale`` fixed-point; 0 for docs with <2 tokens). Every input doc
    appears exactly once. ``mode``: "broadcast" (small-model contract,
    zero-shuffle scoring pass) or "join" (both-sides-large path)."""
    if mode == "broadcast":
        return _lm_score_broadcast(docs, model, scale, doc_col, text_col)
    if mode == "join":
        return _lm_score_join(docs, model, scale, doc_col, text_col, num_buckets)
    raise ValueError(f"unknown lm_score mode: {mode!r}")


def _collect_counts(ds) -> tuple[pa.Array, np.ndarray]:
    batches = list(
        ds.select_columns(["ngram", "cnt"]).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if not batches:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    t = pa.concat_tables(batches)  # iter_batches(pyarrow) yields Tables
    keys = t["ngram"].combine_chunks()  # ChunkedArray -> single Array
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.chunk(0) if keys.num_chunks else pa.array([], pa.string())
    cnts = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    return keys, cnts


def _lm_score_broadcast(docs, model, scale, doc_col, text_col):
    """Scoring pass: ONE index_in of the flat token buffer against the
    unigram vocabulary; bigram lookup is then an int64 searchsorted on
    precomputed pair codes (w1_id * V + w2_id) — no per-pair string
    construction, no second string hash (the former gram-string join was
    ~40% of the scoring wall at 2M docs)."""
    import pyarrow.compute as pc
    import ray

    uk, uc = _collect_counts(model["uni"])
    V = len(uk) + 1
    # bigram keys as integer pair codes over the unigram vocab (a model's
    # bigram words are drawn from its own unigram table by construction;
    # an entry with an out-of-vocab word could never be matched anyway).
    # The string split + vocab lookup runs DISTRIBUTED over the bigram
    # table (it was a ~2s serial driver step at 4M bigrams); the driver
    # only collects (code, cnt) int64 pairs and sorts them.
    uk_ref = ray.put(uk)

    def to_codes(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["ngram"], " ")
        flatp = pc.list_flatten(parts)
        ids = (
            pc.index_in(flatp, value_set=ray.get(uk_ref))
            .fill_null(V - 1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {"code": pa.array(ids[0::2] * V + ids[1::2]), "cnt": b["cnt"]}
        )

    code_parts = [
        t
        for t in model["bi"].map_batches(
            to_codes, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if code_parts:
        tbl = pa.concat_tables(code_parts)
        codes = tbl["code"].to_numpy(zero_copy_only=False)
        bc = tbl["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(codes)
        bi_keys, bi_cnts = codes[order], bc[order]
    else:
        bi_keys, bi_cnts = np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    model_ref = ray.put((uk, uc, bi_keys, bi_cnts))
    total = int(model["total"])

    def score(batch: pa.Table) -> pa.Table:
        uk, uc, bi_keys, bi_cnts = ray.get(model_ref)  # zero-copy per worker
        flat, parent = _tokenize(batch[text_col])
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_rows = batch.num_rows
        if len(flat) < 2:
            n_pairs = np.zeros(n_rows, dtype=np.int64)
            sums = np.zeros(n_rows, dtype=np.int64)
        else:
            starts = np.nonzero(parent[1:] == parent[:-1])[0]
            pair_parent = parent[starts]
            n_pairs = np.bincount(pair_parent, minlength=n_rows).astype(np.int64)
            sums = np.zeros(n_rows, dtype=np.int64)
            if len(starts):
                fid = (
                    pc.index_in(flat, value_set=uk)
                    .fill_null(-1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                fcnt = np.where(fid >= 0, uc[np.maximum(fid, 0)], 0)
                i1, i2 = fid[starts], fid[starts + 1]
                cnt1, cntw2 = fcnt[starts], fcnt[starts + 1]
                cnt2 = np.zeros(len(starts), dtype=np.int64)
                both = (i1 >= 0) & (i2 >= 0)
                if both.any() and len(bi_keys):
                    q = i1[both] * V + i2[both]
                    pos = np.searchsorted(bi_keys, q)
                    posc = np.minimum(pos, len(bi_keys) - 1)
                    hit = bi_keys[posc] == q
                    vals = np.zeros(len(q), dtype=np.int64)
                    vals[hit] = bi_cnts[posc[hit]]
                    cnt2[both] = vals
                p = _pair_probs(cnt2, cnt1, cntw2, total, scale)
                np.add.at(sums, pair_parent, p)
        score_fp = np.zeros(n_rows, dtype=np.int64)
        nz = n_pairs > 0
        score_fp[nz] = sums[nz] // n_pairs[nz]
        return pa.table(
            {
                doc_col: batch[doc_col],
                "n_pairs": pa.array(n_pairs),
                "score_fp": pa.array(score_fp),
            }
        )

    return docs.select_columns([doc_col, text_col]).map_batches(
        # whole-block batches — index_in re-hashes the unigram value_set
        # per call, so the 1024-row default re-pays the O(V) build ~30x
        # per block
        score, batch_format="pyarrow", batch_size=None
    )


def _lm_score_join(docs, model, scale, doc_col, text_col, num_buckets=None):
    """Scale path, inner/anti joins only (safe_hash_join has no outer):

      seen path     pairs ⋈ bi on gram (inner, gives cnt2) ⋈ uni on w1
                    (inner — a seen bigram implies a seen w1) -> p rows
      backoff path  pairs ▷ bi on gram (left_anti) ⋈ uni on w2 (inner —
                    pairs with unseen w2 score 0 and need no row) -> p rows
      denominator   per-doc pair counts come straight from the explode
                    pass (each doc is one input row, so its count is
                    final per batch — no aggregation, and zero-pair docs
                    are present with n_pairs = 0)

    union(seen p, backoff p, zero-sum count rows) -> one bucketed per-doc
    integer sum -> score_fp = sum // n_pairs. Bit-identical to broadcast.
    """
    import ray as _ray

    from ..state.blocks import safe_hash_join

    if num_buckets is None:
        try:
            num_buckets = max(2, int(_ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_buckets = 8
    total = int(model["total"])
    np_join = max(2, num_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        w1, w2, gram, pair_parent = _doc_pairs(batch, text_col)
        ids = batch[doc_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                doc_col: pa.array(ids[pair_parent]),
                "_w1": w1,
                "_w2": w2,
                "_gram": gram,
            }
        )

    slim = docs.select_columns([doc_col, text_col])
    pairs = slim.map_batches(explode, batch_format="pyarrow").materialize()  # consumed twice

    def counts_fn(batch: pa.Table) -> pa.Table:
        _, _, _, pair_parent = _doc_pairs(batch, text_col)
        n_pairs = np.bincount(pair_parent, minlength=batch.num_rows).astype(np.int64)
        return pa.table(
            {
                doc_col: batch[doc_col],
                "_n": pa.array(n_pairs),
                "_s": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            }
        )

    counts = slim.map_batches(counts_fn, batch_format="pyarrow")

    def _renamed(ds, key, cnt_name):
        def rn(t: pa.Table) -> pa.Table:
            return pa.table({key: t["ngram"], cnt_name: t["cnt"]})

        return ds.map_batches(rn, batch_format="pyarrow")

    seen = safe_hash_join(
        pairs, _renamed(model["bi"], "_gram", "_cnt2"), "inner", np_join, on=("_gram",)
    )
    seen = safe_hash_join(
        seen, _renamed(model["uni"], "_w1", "_cnt1"), "inner", np_join, on=("_w1",)
    )

    def p_seen(batch: pa.Table) -> pa.Table:
        c2 = batch["_cnt2"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = batch["_cnt1"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = (c2 * scale) // np.maximum(c1, 1)
        n = len(p)
        return pa.table(
            {
                doc_col: batch[doc_col],
                "_n": pa.array(np.zeros(n, dtype=np.int64)),
                "_s": pa.array(p),
            }
        )

    unseen = safe_hash_join(
        pairs,
        model["bi"].map_batches(
            lambda t: pa.table({"_gram": t["ngram"]}), batch_format="pyarrow"
        ),
        "left_anti",
        np_join,
        on=("_gram",),
    )
    bo = safe_hash_join(
        unseen, _renamed(model["uni"], "_w2", "_cntw2"), "inner", np_join, on=("_w2",)
    )

    def p_backoff(batch: pa.Table) -> pa.Table:
        cw2 = batch["_cntw2"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = (
            (BACKOFF_NUM * cw2 * scale) // (BACKOFF_DEN * total)
            if total > 0
            else np.zeros(len(cw2), dtype=np.int64)
        )
        n = len(cw2)
        return pa.table(
            {
                doc_col: batch[doc_col],
                "_n": pa.array(np.zeros(n, dtype=np.int64)),
                "_s": pa.array(p),
            }
        )

    rows = counts.union(
        seen.map_batches(p_seen, batch_format="pyarrow"),
        bo.map_batches(p_backoff, batch_format="pyarrow"),
    )

    def tag(t: pa.Table) -> pa.Table:
        ids = t[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_b", pa.array(ids % num_buckets))

    def bucket_doc_sum(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                doc_col: g[doc_col].to_numpy(zero_copy_only=False),
                "_n": g["_n"].to_numpy(zero_copy_only=False),
                "_s": g["_s"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(doc_col, sort=False).agg({"_n": "sum", "_s": "sum"}).reset_index()
        n = agg["_n"].to_numpy().astype(np.int64)
        s = agg["_s"].to_numpy().astype(np.int64)
        return pa.table(
            {
                doc_col: pa.array(agg[doc_col].to_numpy(), pa.int64()),
                "n_pairs": pa.array(n),
                "score_fp": pa.array(np.where(n > 0, s // np.maximum(n, 1), 0)),
            }
        )

    return (
        rows.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_doc_sum, batch_format="pyarrow")
    )
