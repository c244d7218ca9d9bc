"""Exact set-similarity self-join via prefix filtering (PPJoin-style).

Distributed EXACT n-gram-Jaccard pair finding — unlike the MinHash path
(:mod:`.minhash`), no probabilistic candidate generation: every pair with
Jaccard >= threshold is guaranteed found. Public algorithm: prefix
filtering with a global token order (Chaudhuri et al. SSJoin / Xiao et
al. PPJoin; distributed formulation per Vernica, Carey, Li, "Efficient
Parallel Set-Similarity Joins Using MapReduce", SIGMOD 2010).

Plan (one shuffle in ``order="hash"`` mode, two in ``order="df"``):

1. ``map_batches``: doc -> sorted unique shingle-hash array ``sig``; a
   pair with ``J >= t`` shares >= ``ceil(t*|s|)`` tokens with each member,
   so it must share a token inside each member's PREFIX (the first
   ``|s| - ceil(t*|s|) + 1`` tokens under any fixed global token order).
   Explode one row per prefix token carrying the full shingle array.
2. ``groupby(token).map_groups``: inside each token group, length-filter
   (``|a| >= t*|b|``), emit each candidate pair exactly once (only the
   group of the MINIMUM-VALUE shared prefix token emits it), and verify
   exact Jaccard on the carried arrays — no second shuffle, no
   driver-side state.

Token order — the skew lever:

* ``order="hash"`` (default): prefix = lowest hash values. No extra pass,
  but a shingle common to many documents can land in many prefixes and
  its group does O(group^2) work.
* ``order="df"``: Vernica et al.'s document-frequency-ascending order —
  one extra tokens-only ``groupby().count()`` pass; only tokens with
  ``df >= 2`` need ranks (singletons can never join a pair), so the
  broadcast rank table holds just the REPEATED shingles. Prefixes then
  prefer the rarest shingles and hot common phrases drop out of prefixes
  entirely — group sizes stay near df-bounded, the exact result is
  unchanged (prefix filtering is correct under any fixed total order).

Carry layout — the document-size lever: ``carry="full"`` ships each
doc's whole shingle array through the exchange (the "full-record"
variant of Vernica et al., right for short documents);
``carry="ids"`` ships only slim candidate rows and hash-joins pairs
back to the materialized signature table for verification (the
indirection for very large documents). Both produce identical results.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .ngram import fnv_tokens


def word_shingles_arr(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique uint64 FNV hashes of word n-grams (lowercased,
    whitespace-tokenized); <n words -> one shingle of the joined words;
    empty -> empty array. Hash-set Jaccard == string-set Jaccard modulo
    64-bit collisions."""
    words = text.lower().split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < n:
        toks = [" ".join(words).encode()]
    else:
        toks = [" ".join(words[i : i + n]).encode() for i in range(len(words) - n + 1)]
    return np.unique(fnv_tokens(toks))


def _prefix_len(size: int, threshold: float) -> int:
    return size - int(math.ceil(threshold * size)) + 1


def _shingles_i64(text: str, n: int) -> np.ndarray:
    """Shingle hashes as SORTED int64 (the uint64 FNV values reinterpreted
    bitwise). Prefix filtering is correct under ANY fixed total order, and
    int64 tokens keep Ray's groupby/count key columns native Arrow — uint64
    values above 2^63-1 overflow the aggregate builder's int64 inference
    and fall back to pickled-object extension arrays (a scale killer)."""
    return np.sort(word_shingles_arr(text, n).view(np.int64))


def _sig_rows_fn(text_col: str, id_col: str, n: int):
    """map_batches stage: text rows -> compact (rid, sig) signature rows,
    sig packed as little-endian int64 bytes (binary survives both the
    object store and Acero hash joins; empty shingle sets dropped)."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rids, sigs = [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            s = _shingles_i64(t or "", n)
            if len(s):
                rids.append(int(i))
                sigs.append(s.tobytes())
        return pa.table(
            {"rid": pa.array(rids, type=pa.int64()), "sig": pa.array(sigs, type=pa.binary())}
        )

    return sig_rows


def _unpack_sigs(batch: pa.Table):
    ids = batch["rid"].to_numpy(zero_copy_only=False)
    return ids, [np.frombuffer(b, dtype=np.int64) for b in batch["sig"].to_pylist()]


def _df_rank_table(sigs_ds, max_entries: int = 5_000_000):
    """(tok_by_val, rank_by_val) for tokens with document frequency >= 2,
    computed over the materialized signature table: tokens value-sorted,
    each with its position under the global (df asc, value asc) order.
    Tokens absent from the table are singletons and rank after every table
    entry (they cannot join a pair).

    Scale cap: a web corpus's repeated-shingle vocabulary is unbounded, so
    at most ``max_entries`` tokens (the HIGHEST-df ones — the heavy
    hitters whose groups the df order exists to shrink) are pulled to the
    driver and broadcast; tokens below the cut rank BEFORE every table
    entry, ordered by value. Any fixed total order keeps prefix filtering
    exact, so capping changes group sizes only, never results."""

    def toks(batch: pa.Table) -> pa.Table:
        _, sigs = _unpack_sigs(batch)
        allt = np.concatenate(sigs) if sigs else np.empty(0, dtype=np.int64)
        return pa.table({"token": pa.array(allt, type=pa.int64())})

    counts = sigs_ds.map_batches(toks, batch_format="pyarrow").groupby("token").count()

    def keep_repeated(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.greater_equal(batch["count()"], 2))

    rep_ds = counts.map_batches(keep_repeated, batch_format="pyarrow")
    n_rep = rep_ds.count()
    if n_rep > max_entries:
        # keep only the heavy hitters: mergeable per-block top-M by df
        def local_top(batch: pa.Table) -> pa.Table:
            dfs = batch["count()"].to_numpy(zero_copy_only=False)
            sel = np.argsort(-dfs, kind="mergesort")[:max_entries]
            return batch.take(np.sort(sel))

        rep = rep_ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
        rep = rep.sort_values("count()", ascending=False, kind="mergesort").head(max_entries)
    else:
        rep = rep_ds.to_pandas()
    toks_arr = rep["token"].to_numpy().astype(np.int64)
    dfs = rep["count()"].to_numpy().astype(np.int64)
    order = np.lexsort((toks_arr, dfs))  # global rank order: (df, value)
    rank_orig = np.empty(len(toks_arr), dtype=np.int64)
    rank_orig[order] = np.arange(len(toks_arr))
    byval = np.argsort(toks_arr, kind="mergesort")
    return toks_arr[byval], rank_orig[byval]


def _prefix_of(s: np.ndarray, threshold: float, lookup) -> np.ndarray:
    """Value-sorted prefix tokens of one doc under the chosen global order
    (hash order when ``lookup`` is None, else df-ascending ranks).

    Tokens ABSENT from the rank table (singletons, and everything below a
    capped table's heavy-hitter cut) rank BEFORE every table entry,
    ordered by value: prefixes prefer the rarest tokens and hot shingles
    drop out of prefixes entirely. Fixed total order = (absent-by-value,
    then table entries df-asc), identical for every document, so prefix
    filtering stays exact."""
    p = _prefix_len(len(s), threshold)
    if lookup is None:
        return s[:p]
    tok_by_val, rank_by_val = lookup
    idx = np.searchsorted(tok_by_val, s)
    idx_c = np.minimum(idx, max(len(tok_by_val) - 1, 0))
    found = (len(tok_by_val) > 0) & (tok_by_val[idx_c] == s)
    key = np.where(found, rank_by_val[idx_c] + 1, 0)
    sel = np.lexsort((s, key))[:p]
    return np.sort(s[sel])


def _token_parts() -> int:
    from .minhash import _default_join_partitions

    return _default_join_partitions() * 4


def _add_tpart_fn(num_parts: int):
    """Coarse partition of the token column: token groups are numerous (one
    per distinct prefix token), so ``groupby(token).map_groups`` would pay
    one Python call per token; hashing tokens into O(parts) groups and
    finding bucket boundaries with one sort keeps the call count flat."""

    def add_tpart(batch: pa.Table) -> pa.Table:
        tok = batch["token"].to_numpy(zero_copy_only=False)
        part = ((tok * np.int64(0x9E3779B1)) % num_parts + num_parts) % num_parts
        return batch.append_column("tpart", pa.array(part.astype(np.int32)))

    return add_tpart


def _list_slices(col):
    """(offsets, values) numpy views of a (large_)list column."""
    arr = col.combine_chunks()
    return arr.offsets.to_numpy(), arr.values.to_numpy(zero_copy_only=False)


def _jaccard_self_join_ids(ds, text_col, id_col, threshold, n, order):
    """carry="ids" plan: slim (token, rid, |sig|, prefix) rows through the
    token shuffle; candidate (a, b) pairs hash-join back to the (rid, sig)
    table for exact verification — two extra exchanges of tiny rows
    instead of shipping large shingle arrays once per prefix token."""
    import ray

    from ..join.payload import attach_payload

    # shingle ONCE into the materialized signature table: it feeds the
    # df-count pass, the slim explode AND the verification joins
    sigs_ds = ds.map_batches(_sig_rows_fn(text_col, id_col, n), batch_format="pyarrow").materialize()
    rank_ref = ray.put(_df_rank_table(sigs_ds)) if order == "df" else None

    def explode(batch: pa.Table) -> pa.Table:
        from ..partition.assign import resolve_ref

        lookup = resolve_ref(rank_ref) if rank_ref is not None else None
        ids, sig_arrays = _unpack_sigs(batch)
        prefixes = [_prefix_of(s, threshold, lookup) for s in sig_arrays]
        plens = np.fromiter((len(p) for p in prefixes), dtype=np.int64, count=len(prefixes))
        slens = np.fromiter((len(s) for s in sig_arrays), dtype=np.int64, count=len(sig_arrays))
        tok = np.concatenate(prefixes) if prefixes else np.empty(0, dtype=np.int64)
        # one output row per (doc, prefix token), each carrying the doc's
        # full prefix as a list column — built with repeat/ListArray, no
        # per-row Python list appends
        pre_vals = np.concatenate(
            [np.tile(p, max(len(p), 0)) for p in prefixes if len(p)]
        ) if plens.sum() else np.empty(0, dtype=np.int64)
        pre_offsets = np.concatenate(
            [[0], np.cumsum(np.repeat(plens, plens))]
        ).astype(np.int64)
        return pa.table(
            {
                "token": pa.array(tok, type=pa.int64()),
                "rid": pa.array(np.repeat(np.asarray(ids, dtype=np.int64), plens), type=pa.int64()),
                "slen": pa.array(np.repeat(slens, plens), type=pa.int64()),
                "prefix": pa.LargeListArray.from_arrays(pa.array(pre_offsets, type=pa.int64()), pa.array(pre_vals, type=pa.int64())),
            }
        )

    ex = sigs_ds.map_batches(explode, batch_format="pyarrow")

    def cand_part(g: pa.Table) -> pa.Table:
        tok_col = g["token"].to_numpy(zero_copy_only=False)
        rid_col = g["rid"].to_numpy(zero_copy_only=False)
        len_col = g["slen"].to_numpy(zero_copy_only=False)
        offs, vals = _list_slices(g["prefix"])
        order_ = np.lexsort((rid_col, tok_col))
        st = tok_col[order_]
        bnd = np.flatnonzero(np.concatenate(([True], st[1:] != st[:-1]))) if len(st) else np.empty(0, dtype=np.int64)
        bnd = np.append(bnd, len(st))
        a_out, b_out = [], []
        for bi in range(len(bnd) - 1):
            idxs = order_[bnd[bi] : bnd[bi + 1]]
            tok = int(st[bnd[bi]])
            m = len(idxs)
            for ii in range(m):
                i = idxs[ii]
                pi = vals[offs[i] : offs[i + 1]]
                for jj in range(ii + 1, m):
                    j = idxs[jj]
                    if rid_col[i] == rid_col[j]:
                        continue
                    if min(len_col[i], len_col[j]) < threshold * max(len_col[i], len_col[j]):
                        continue
                    shared = np.intersect1d(pi, vals[offs[j] : offs[j + 1]], assume_unique=True)
                    if len(shared) == 0 or int(shared[0]) != tok:
                        continue
                    lo, hi = sorted((int(rid_col[i]), int(rid_col[j])))
                    a_out.append(lo)
                    b_out.append(hi)
        return pa.table(
            {"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())}
        )

    num_parts = _token_parts()
    pairs = (
        ex.map_batches(_add_tpart_fn(num_parts), batch_format="pyarrow")
        .groupby("tpart")
        .map_groups(cand_part, batch_format="pyarrow")
    )

    ja = attach_payload(pairs, sigs_ds, key="a", payload_key="rid", strategy="hash")

    def keep_a(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["rid"], "b": batch["b"], "sig_a": batch["sig"]})

    # ja is a join output feeding ANOTHER join: scrub the schema-less
    # empty partition blocks Ray's hash join emits (state/blocks.py) or
    # sparse candidate sets crash the second join
    from ..state.blocks import scrub_empty_blocks

    slim_a = scrub_empty_blocks(
        ja.map_batches(keep_a, batch_format="pyarrow"),
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("sig_a", pa.binary())]),
    )
    jb = attach_payload(slim_a, sigs_ds, key="b", payload_key="rid", strategy="hash")

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["rid"].to_numpy(zero_copy_only=False)
        sa = batch["sig_a"].to_pylist()
        sb = batch["sig"].to_pylist()
        a_out, b_out, j_out = [], [], []
        for i in range(len(a)):
            si = np.frombuffer(sa[i], dtype=np.int64)
            sj = np.frombuffer(sb[i], dtype=np.int64)
            inter = len(np.intersect1d(si, sj, assume_unique=True))
            jac = inter / (len(si) + len(sj) - inter)
            if jac >= threshold:
                a_out.append(int(a[i]))
                b_out.append(int(b[i]))
                j_out.append(jac)
        return pa.table(
            {
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
                "jac": pa.array(j_out, type=pa.float64()),
            }
        )

    return jb.map_batches(verify, batch_format="pyarrow")


def jaccard_self_join(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
    order: str = "hash",
    carry: str = "full",
):
    """All pairs of rows whose word-``n``-gram Jaccard >= ``threshold``.

    Returns a Dataset (a, b, jac) with ``a < b`` (ids), exact Jaccard.
    Rows with an empty shingle set never pair (Jaccard undefined).
    ``order``: ``"hash"`` (no extra pass) or ``"df"`` (skew-robust
    rarest-token prefixes; one extra count pass) — same exact result.
    ``carry``: ``"full"`` ships each doc's whole shingle array through the
    token shuffle and verifies in-group (one shuffle, right for short
    docs); ``"ids"`` ships only (token, rid, |sig|, prefix) through the
    shuffle, then hash-joins the candidate pairs back to a (rid, sig)
    table for verification (``join/payload.py`` re-attach) — the
    Vernica-et-al indirection for LARGE documents whose shingle arrays
    would dominate the exchange. Same exact result.

    NOTE: ``order="df"`` and ``carry="ids"`` shingle the corpus ONCE into
    a materialized compact signature table reused by every pass, so the
    call executes that stage EAGERLY (Vernica et al. likewise persist the
    tokenized relation between passes).
    """
    if order not in ("hash", "df"):
        raise ValueError(f"order must be 'hash' or 'df', got {order!r}")
    if carry not in ("full", "ids"):
        raise ValueError(f"carry must be 'full' or 'ids', got {carry!r}")
    if carry == "ids":
        return _jaccard_self_join_ids(ds, text_col, id_col, threshold, n, order)

    rank_ref = None
    sigs_ds = None
    if order == "df":
        import ray

        # shingle ONCE: the compact signature table is materialized and
        # reused by the df-count pass AND the explode (Vernica et al.
        # likewise persist the tokenized relation between the two passes;
        # the materialization is a DERIVED table ~|sig| bytes per doc, far
        # smaller than the text input)
        sigs_ds = ds.map_batches(_sig_rows_fn(text_col, id_col, n), batch_format="pyarrow").materialize()
        rank_ref = ray.put(_df_rank_table(sigs_ds))

    def explode(batch: pa.Table) -> pa.Table:
        from ..partition.assign import resolve_ref

        lookup = resolve_ref(rank_ref) if rank_ref is not None else None
        if sigs_ds is not None:
            ids, sig_arrays = _unpack_sigs(batch)
        else:
            raw_ids = batch[id_col].to_numpy(zero_copy_only=False)
            ids, sig_arrays = [], []
            for i, t in zip(raw_ids, batch[text_col].to_pylist()):
                s = _shingles_i64(t or "", n)
                if len(s):
                    ids.append(int(i))
                    sig_arrays.append(s)
        # value-sorted prefixes: ownership compares by VALUE
        prefixes = [_prefix_of(s, threshold, lookup) for s in sig_arrays]
        plens = np.fromiter((len(p) for p in prefixes), dtype=np.int64, count=len(prefixes))
        slens = np.fromiter((len(s) for s in sig_arrays), dtype=np.int64, count=len(sig_arrays))
        tok = np.concatenate(prefixes) if prefixes else np.empty(0, dtype=np.int64)
        if plens.sum():
            pre_vals = np.concatenate([np.tile(p, len(p)) for p in prefixes])
            sig_vals = np.concatenate(
                [np.tile(s, int(p)) for s, p in zip(sig_arrays, plens)]
            )
        else:
            pre_vals = sig_vals = np.empty(0, dtype=np.int64)
        pre_off = np.concatenate([[0], np.cumsum(np.repeat(plens, plens))]).astype(np.int64)
        sig_off = np.concatenate([[0], np.cumsum(np.repeat(slens, plens))]).astype(np.int64)
        return pa.table(
            {
                "token": pa.array(tok, type=pa.int64()),
                "rid": pa.array(np.repeat(np.asarray(ids, dtype=np.int64), plens), type=pa.int64()),
                "sig": pa.LargeListArray.from_arrays(pa.array(sig_off, type=pa.int64()), pa.array(sig_vals, type=pa.int64())),
                "prefix": pa.LargeListArray.from_arrays(pa.array(pre_off, type=pa.int64()), pa.array(pre_vals, type=pa.int64())),
            }
        )

    ex = (sigs_ds if sigs_ds is not None else ds).map_batches(explode, batch_format="pyarrow")

    def pairs_part(g: pa.Table) -> pa.Table:
        tok_col = g["token"].to_numpy(zero_copy_only=False)
        rid_col = g["rid"].to_numpy(zero_copy_only=False)
        s_offs, s_vals = _list_slices(g["sig"])
        p_offs, p_vals = _list_slices(g["prefix"])
        order_ = np.lexsort((rid_col, tok_col))
        st = tok_col[order_]
        bnd = np.flatnonzero(np.concatenate(([True], st[1:] != st[:-1]))) if len(st) else np.empty(0, dtype=np.int64)
        bnd = np.append(bnd, len(st))
        a_out, b_out, j_out = [], [], []
        for bi in range(len(bnd) - 1):
            idxs = order_[bnd[bi] : bnd[bi + 1]]
            tok = int(st[bnd[bi]])
            m = len(idxs)
            for ii in range(m):
                i = idxs[ii]
                si = s_vals[s_offs[i] : s_offs[i + 1]]
                pi = p_vals[p_offs[i] : p_offs[i + 1]]
                li = len(si)
                for jj in range(ii + 1, m):
                    j = idxs[jj]
                    if rid_col[i] == rid_col[j]:
                        continue
                    sj = s_vals[s_offs[j] : s_offs[j + 1]]
                    lj = len(sj)
                    # length filter: J >= t requires min/max >= t
                    if min(li, lj) < threshold * max(li, lj):
                        continue
                    shared = np.intersect1d(pi, p_vals[p_offs[j] : p_offs[j + 1]], assume_unique=True)
                    if len(shared) == 0 or int(shared[0]) != tok:
                        continue  # the minimal shared prefix token's group owns this pair
                    inter = len(np.intersect1d(si, sj, assume_unique=True))
                    jac = inter / (li + lj - inter)
                    if jac >= threshold:
                        lo, hi = sorted((int(rid_col[i]), int(rid_col[j])))
                        a_out.append(lo)
                        b_out.append(hi)
                        j_out.append(jac)
        return pa.table(
            {
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
                "jac": pa.array(j_out, type=pa.float64()),
            }
        )

    num_parts = _token_parts()
    return (
        ex.map_batches(_add_tpart_fn(num_parts), batch_format="pyarrow")
        .groupby("tpart")
        .map_groups(pairs_part, batch_format="pyarrow")
    )
