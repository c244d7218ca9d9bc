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
    Tokens absent from the table are singletons (or below the df cap) and
    rank BEFORE every table entry (sort key 0 in ``_prefix_of``): they can
    only pair through some shared in-table token later in both prefixes,
    so prefix filtering stays exact.

    Scale cap: a web corpus's repeated-shingle vocabulary is unbounded, so
    at most ``max_entries`` tokens (the HIGHEST-df ones — the heavy
    hitters whose groups the df order exists to shrink) are pulled to the
    driver and broadcast; tokens below the cut rank BEFORE every table
    entry, ordered by value. Any fixed total order keeps prefix filtering
    exact, so capping changes group sizes only, never results."""

    import ray as _ray

    try:
        n_buckets = max(2, int(_ray.cluster_resources().get("CPU", 4)))
    except Exception:
        n_buckets = 8

    def toks(batch: pa.Table) -> pa.Table:
        # in-batch combine + coarse bucket tag: Ray 2.49's generic
        # aggregate over millions of distinct token keys is ~10-20x
        # slower than a bucket-keyed sort + np.unique kernels (the
        # repo-wide high-cardinality-groupby finding)
        _, sigs = _unpack_sigs(batch)
        allt = np.concatenate(sigs) if sigs else np.empty(0, dtype=np.int64)
        u, c = np.unique(allt, return_counts=True)
        return pa.table(
            {
                "token": pa.array(u, type=pa.int64()),
                "cnt": pa.array(c.astype(np.int64)),
                "_b": pa.array((u % n_buckets).astype(np.int64)),
            }
        )

    def bucket_df(g: pa.Table) -> pa.Table:
        tok = g["token"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(tok, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, cnt)
        keep = acc >= 2
        return pa.table(
            {
                "token": pa.array(u[keep], type=pa.int64()),
                "count()": pa.array(acc[keep]),
            }
        )

    # materialize: count() and the pull below would otherwise EACH re-run
    # the bucket shuffle (Datasets re-execute per consumption)
    rep_ds = (
        sigs_ds.map_batches(toks, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_df, batch_format="pyarrow")
        .materialize()
    )
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


# ---------------------------------------------------------------------------
# Vectorized group kernels (VERDICT r02 #1): candidate pairs are generated
# per token bucket with a triangular-index decode (no per-pair Python), and
# every set intersection — the min-shared-prefix-token ownership test and
# the exact-Jaccard verify — is ONE lexsort-merge over the flattened
# element arrays per chunk, the same structure as the polygon-polygon
# fast path D in join/spatial_join.py.

_PAIR_CHUNK = 4_000_000  # candidate pairs materialized per vector chunk


def _intersection_counts_sortmerge(pid_i, vals_i, pid_j, vals_j, n_pairs: int) -> np.ndarray:
    """Lexsort-merge fallback (no sortedness precondition): concat (pair,
    value, side), one lexsort, count adjacent equal-(pair,value)
    cross-side runs. Values must be unique within a pair per side."""
    pid = np.concatenate([pid_i, pid_j])
    vals = np.concatenate([vals_i, vals_j])
    side = np.concatenate(
        [np.zeros(len(pid_i), dtype=np.int8), np.ones(len(pid_j), dtype=np.int8)]
    )
    order = np.lexsort((side, vals, pid))
    p = pid[order]
    v = vals[order]
    s = side[order]
    match = (p[1:] == p[:-1]) & (v[1:] == v[:-1]) & (s[1:] != s[:-1])
    return np.bincount(p[:-1][match], minlength=n_pairs)


def _intersection_counts(pid_i, vals_i, pid_j, vals_j, n_pairs: int, n_vals: int | None = None) -> np.ndarray:
    """Per-pair count of common values between two element lists.

    PRECONDITION (met by every call site): each side's values are unique
    and sorted ascending WITHIN a pair, and the pid arrays are
    nondecreasing — the exact layout :func:`_gather_slices` emits over the
    per-row ``np.sort``-ed sig/prefix arrays. Under it, ``pid * n_vals +
    rank`` is a globally sorted composite key per side, so matches are
    counted with ONE binary-search pass of the smaller side into the
    larger — no multi-key lexsort over the flattened elements (measured
    ~6x faster on the q8 verify path, where the old 3-key lexsort was 12 s
    of the 13.7 s serial kernel).

    Pass ``n_vals`` when ``vals_*`` are already dense ranks in
    ``[0, n_vals)`` (rank once per GROUP, not per chunk); otherwise values
    are dense-ranked here with one ``np.unique``. Falls back to the
    lexsort merge if the composite key would overflow int64.
    """
    if len(vals_i) == 0 or len(vals_j) == 0:
        return np.zeros(n_pairs, dtype=np.int64)
    if n_vals is None:
        uniq = np.unique(np.concatenate([vals_i, vals_j]))
        n_vals = len(uniq)
        vals_i = np.searchsorted(uniq, vals_i)
        vals_j = np.searchsorted(uniq, vals_j)
    if n_pairs * n_vals >= (1 << 62):
        return _intersection_counts_sortmerge(pid_i, vals_i, pid_j, vals_j, n_pairs)
    ki = pid_i.astype(np.int64) * n_vals + vals_i
    kj = pid_j.astype(np.int64) * n_vals + vals_j
    if len(ki) <= len(kj):
        small, big, pid_small = ki, kj, pid_i
    else:
        small, big, pid_small = kj, ki, pid_j
    idx = np.minimum(np.searchsorted(big, small), len(big) - 1)
    found = big[idx] == small
    return np.bincount(pid_small[found], minlength=n_pairs)


def _gather_slices(offs: np.ndarray, idx: np.ndarray):
    """Flat gather of list slices ``offs[i]:offs[i+1]`` for each ``i`` in
    ``idx`` -> (pair-index repeat vector, flat positions into values)."""
    lens = offs[idx + 1] - offs[idx]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rep = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.arange(total, dtype=np.int64) - starts[rep] + offs[idx].astype(np.int64)[rep]
    return rep, pos


def _decode_tri(r: np.ndarray):
    """Inverse triangular enumeration: global pair rank r (within a bucket,
    pairs ordered (0,1),(0,2),(1,2),(0,3)...) -> local (ii, jj), ii < jj."""
    jj = ((1.0 + np.sqrt(1.0 + 8.0 * r.astype(np.float64))) / 2.0).astype(np.int64)
    # one step of integer correction absorbs float error in either direction
    jj -= (jj * (jj - 1) // 2) > r
    jj += ((jj + 1) * jj // 2) <= r
    ii = r - jj * (jj - 1) // 2
    return ii, jj


def _owned_pairs_kernel(tok_col, rid_col, p_offs, p_vals, len_arr, threshold):
    """All candidate row-index pairs (gi, gj) of a coarse token-hash group
    that pass: distinct rids, the PPJoin length filter, and min-shared-
    prefix-token ownership (this bucket's token is the smallest token the
    two prefixes share, so exactly one bucket cluster-wide emits a pair).
    Fully vectorized; pair space is walked in ``_PAIR_CHUNK`` chunks so a
    hot bucket never materializes its whole O(m^2) index set at once."""
    order_ = np.lexsort((rid_col, tok_col))
    st = tok_col[order_]
    if len(st) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    bnd = np.flatnonzero(np.concatenate(([True], st[1:] != st[:-1])))
    bnd = np.append(bnd, len(st))
    sizes = np.diff(bnd)
    npairs = sizes * (sizes - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    base = np.concatenate(([0], np.cumsum(npairs)))
    # dense-rank the prefix values ONCE per group: the ownership
    # intersection then runs on the sorted-composite-key fast path of
    # _intersection_counts (rank order == value order, so the strict
    # "below the bucket token" comparison is preserved)
    uniq_p = np.unique(p_vals)
    rank_p = np.searchsorted(uniq_p, p_vals)
    gi_out, gj_out = [], []
    for lo in range(0, total, _PAIR_CHUNK):
        hi = min(lo + _PAIR_CHUNK, total)
        gr = np.arange(lo, hi, dtype=np.int64)
        bucket = np.searchsorted(base, gr, side="right") - 1
        ii, jj = _decode_tri(gr - base[bucket])
        gi = order_[bnd[bucket] + ii]
        gj = order_[bnd[bucket] + jj]
        tokp = st[bnd[bucket]]
        keep = rid_col[gi] != rid_col[gj]
        li = len_arr[gi]
        lj = len_arr[gj]
        keep &= ~(np.minimum(li, lj) < threshold * np.maximum(li, lj))
        gi, gj, tokp = gi[keep], gj[keep], tokp[keep]
        if len(gi) == 0:
            continue
        # ownership: NO shared prefix token strictly below the bucket token
        rep_i, pos_i = _gather_slices(p_offs, gi)
        rep_j, pos_j = _gather_slices(p_offs, gj)
        vi = rank_p[pos_i]
        vj = rank_p[pos_j]
        tokr = np.searchsorted(uniq_p, tokp)
        mi = vi < tokr[rep_i]
        mj = vj < tokr[rep_j]
        below = _intersection_counts(
            rep_i[mi], vi[mi], rep_j[mj], vj[mj], len(gi), n_vals=len(uniq_p)
        )
        own = below == 0
        gi_out.append(gi[own])
        gj_out.append(gj[own])
    if not gi_out:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(gi_out), np.concatenate(gj_out)


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
        gi, gj = _owned_pairs_kernel(tok_col, rid_col, offs, vals, len_col, threshold)
        a = np.minimum(rid_col[gi], rid_col[gj])
        b = np.maximum(rid_col[gi], rid_col[gj])
        return pa.table(
            {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
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
        n = batch.num_rows
        # np.frombuffer is a zero-copy view; the intersections themselves
        # run as ONE lexsort-merge over the flattened arrays
        va = [np.frombuffer(x, dtype=np.int64) for x in batch["sig_a"].to_pylist()]
        vb = [np.frombuffer(x, dtype=np.int64) for x in batch["sig"].to_pylist()]
        la = np.fromiter((len(v) for v in va), dtype=np.int64, count=n)
        lb = np.fromiter((len(v) for v in vb), dtype=np.int64, count=n)
        flat_a = np.concatenate(va) if n else np.empty(0, dtype=np.int64)
        flat_b = np.concatenate(vb) if n else np.empty(0, dtype=np.int64)
        rep_a = np.repeat(np.arange(n, dtype=np.int64), la)
        rep_b = np.repeat(np.arange(n, dtype=np.int64), lb)
        inter = _intersection_counts(rep_a, flat_a, rep_b, flat_b, n)
        jac = inter / np.maximum(la + lb - inter, 1)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "jac": pa.array(jac[keep], type=pa.float64()),
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
        slen = (s_offs[1:] - s_offs[:-1]).astype(np.int64)
        gi, gj = _owned_pairs_kernel(tok_col, rid_col, p_offs, p_vals, slen, threshold)
        n = len(gi)
        if n == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "jac": pa.array([], type=pa.float64()),
                }
            )
        # exact Jaccard over the carried shingle arrays: values dense-ranked
        # once per group, then one sorted-key binary-search pass per chunk
        uniq_s = np.unique(s_vals)
        rank_s = np.searchsorted(uniq_s, s_vals)
        rep_i, pos_i = _gather_slices(s_offs, gi)
        rep_j, pos_j = _gather_slices(s_offs, gj)
        inter = _intersection_counts(
            rep_i, rank_s[pos_i], rep_j, rank_s[pos_j], n, n_vals=len(uniq_s)
        )
        li = slen[gi]
        lj = slen[gj]
        jac = inter / (li + lj - inter)
        keep = jac >= threshold
        a = np.minimum(rid_col[gi[keep]], rid_col[gj[keep]])
        b = np.maximum(rid_col[gi[keep]], rid_col[gj[keep]])
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "jac": pa.array(jac[keep], type=pa.float64()),
            }
        )

    num_parts = _token_parts()
    return (
        ex.map_batches(_add_tpart_fn(num_parts), batch_format="pyarrow")
        .groupby("tpart")
        .map_groups(pairs_part, batch_format="pyarrow")
    )
