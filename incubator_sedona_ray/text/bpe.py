"""Distributed BPE tokenizer training (Sennrich et al. 2016) — learn the
merge table for a byte-pair-encoding vocabulary over a corpus, the step
every LLM data pipeline runs before tokenizing.

Two-level distributed shape (the standard trick: BPE statistics live on
the WORD-FREQUENCY table, not the corpus):

  1. word freqs   corpus -> (word, freq): per-batch partial counts inside
                  ``map_batches`` (one vectorized split + dictionary
                  encode), then one groupby-sum. The corpus is touched
                  exactly ONCE.
  2. merge loop   ``n_merges`` rounds over the vocab-sized word table.
                  Two modes (``mode=`` auto/memory/distributed):

                  * **memory** (default for vocabularies up to
                    ``memory_max_words`` distinct words — even a 100 TB
                    corpus's distinct-word table is ~1e8 rows ≈ a few GB,
                    so this is the 30k-merge production path): collect
                    the (word, freq) table to the driver ONCE and run the
                    classic incremental trainer — global pair-count dict
                    + lazy-deletion heap keyed (count desc, left, right),
                    per merge touching ONLY the words that contain the
                    winning pair (gathered and re-counted as one
                    vectorized numpy batch). No per-round dataset passes.
                  * **distributed** (overflow mode for vocabularies that
                    don't fit a driver): words stay a Dataset of flat
                    int64 symbol-id arrays; per round one partial
                    pair-count pass + one vectorized merge-apply pass
                    (run-parity overlap resolution — 'aaa' under merge
                    (a,a) -> ('aa','a'), exactly the sequential
                    left-to-right single-pass semantics), re-materialized
                    per round (it shrinks).

                  Both modes share the same kernels, tie-break and merge
                  semantics and are bit-identical (tested).

Symbol ids are GLOBALLY consistent without coordination: the character
inventory is collected once up front (alphabet-sized) and every merge
appends exactly one known id, so workers intern nothing — they look up.

Determinism: integer counts, a total-order tie-break, and an
order-independent merge application make the merge table reproducible at
any parallelism — the unit tests check equality against a sequential
reference implementation; the driver query pins an sf0.01 fixture.

No counterpart in the reference repo (Sedona is a spatial engine); the
algorithm follows the public Sennrich et al. description.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EOW = " "  # end-of-word marker glued to a word's last character


def word_freqs(ds, text_col: str = "text", num_buckets: int | None = None):
    """Dataset(word, freq): lowercase, \\s+ split, empties dropped —
    the corpus's single full pass. The keyed sum is HASH-BUCKETED
    (fnv(word) % buckets -> groupby(bucket) -> pandas group-sum kernel):
    a web corpus has an unbounded distinct-word vocabulary, and Ray 2.49's
    generic aggregate over millions of distinct string keys is ~10-20x
    slower than the coarse-key sort of the same partial stream (the q16
    top-ngrams finding)."""
    import ray as _ray

    from ..dedup.ngram import fnv_strings

    if num_buckets is None:
        try:
            num_buckets = max(2, int(_ray.cluster_resources().get("CPU", 4)))
        except Exception:
            num_buckets = 8

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = pc.value_counts(flat)
        words = vc.field("values")
        b = (fnv_strings(words) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "word": words,
                "freq": vc.field("counts").cast(pa.int64()),
                "_b": pa.array(b),
            }
        )

    def bucket_sum(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "word": g["word"].to_pylist(),
                "freq": g["freq"].to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby("word", sort=False)["freq"].sum().reset_index()
        return pa.table(
            {
                "word": pa.array(agg["word"].to_numpy(), pa.string()),
                "freq": pa.array(agg["freq"].to_numpy(), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )


# ---------------------------------------------------------------- kernels


def _row_ids(n: int, offs: np.ndarray) -> np.ndarray:
    """Word index of every flat symbol — robust to EMPTY words (duplicate
    offsets), unlike the boundary-cumsum trick (hypothesis-caught)."""
    return np.searchsorted(offs, np.arange(n, dtype=np.int64), side="right") - 1


def _pack_pairs(flat: np.ndarray, offs: np.ndarray):
    """Adjacent same-word symbol pairs packed into int64 (left<<32)|right,
    plus each pair's word row."""
    n = len(flat)
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    row = _row_ids(n, offs)
    i0 = np.flatnonzero(row[:-1] == row[1:])
    packed = (flat[i0] << 32) | flat[i0 + 1]
    return packed, row[i0]


def _apply_merge(flat, offs, left: int, right: int, new_id: int):
    """Replace non-overlapping (left,right) occurrences left-to-right with
    new_id — vectorized run-parity resolution for overlapping chains
    (only possible when left == right)."""
    n = len(flat)
    if n < 2:
        return flat, offs
    row = _row_ids(n, offs)
    m = np.zeros(n, dtype=bool)
    m[:-1] = (flat[:-1] == left) & (flat[1:] == right) & (row[:-1] == row[1:])
    if not m.any():
        return flat, offs
    run_head = m & ~np.r_[False, m[:-1]]
    run_start = np.flatnonzero(run_head)
    run_id = np.cumsum(run_head)  # 1-based on True positions
    pos = np.flatnonzero(m)
    within = pos - run_start[run_id[pos] - 1]
    keep = pos[within % 2 == 0]
    out_keep = np.ones(n, dtype=bool)
    out_keep[keep + 1] = False  # drop the absorbed right symbol
    new_flat = flat.copy()
    new_flat[keep] = new_id
    new_flat = new_flat[out_keep]
    drops = np.bincount(row[keep + 1], minlength=len(offs) - 1)
    new_offs = offs - np.r_[0, np.cumsum(drops)]
    return new_flat, new_offs


def _sym_table(flat, offs, freqs) -> pa.Table:
    lst = pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int64()).cast(pa.int32()),
        pa.array(flat, type=pa.int64()),
    )
    return pa.table({"syms": lst, "freq": pa.array(freqs, type=pa.int64())})


def _flat_offs(t: pa.Table):
    col = t["syms"]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.asarray(col.offsets, dtype=np.int64)
    offs = offs - offs[0]
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs


_EOW_FLAG = np.int64(1) << np.int64(32)  # bit 32 marks "last char of word"


def _codepoint_keys(joined: str, offs: np.ndarray) -> np.ndarray:
    """int64 symbol key per character of ``joined`` (the concatenation of
    all words): the Unicode codepoint, with bit 32 set on each word's
    last character (the ``</w>`` glue). Fully vectorized — no per-char
    Python objects (utf-32-le gives the codepoint array zero-loop)."""
    if not joined:
        return np.empty(0, dtype=np.int64)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    cps[offs[1:] - 1] |= _EOW_FLAG
    return cps


def _key_str(k: int) -> str:
    return chr(k & 0xFFFFFFFF) + (_EOW if k >> 32 else "")


def _word_offs(words: list, lens: np.ndarray | None = None) -> np.ndarray:
    if lens is None:
        lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    return np.concatenate([[0], np.cumsum(lens)])


# ------------------------------------------------------------------ train


def bpe_train(
    ds,
    n_merges: int,
    *,
    text_col: str = "text",
    mode: str = "auto",
    memory_max_words: int = 50_000_000,
):
    """Learn ``n_merges`` BPE merges over the corpus. Returns a pandas
    DataFrame (rank, left, right, merged, pair_count) — merge-table-sized
    (tiny) by contract. ``</w>`` in a symbol marks end-of-word.

    ``mode``: ``"memory"`` (in-driver incremental trainer over the
    collected word-frequency table — the production path for real 30k+
    merge vocabularies; the distinct-word table is vocabulary-bounded,
    not corpus-bounded), ``"distributed"`` (per-round dataset passes;
    overflow mode for vocabularies beyond ``memory_max_words``), or
    ``"auto"`` (memory iff the distinct-word count fits). Both modes are
    bit-identical (same kernels, same tie-break; tested)."""
    wf = word_freqs(ds, text_col=text_col).materialize()
    if mode == "auto":
        mode = "memory" if wf.count() <= memory_max_words else "distributed"
    if mode == "memory":
        pdf = wf.to_pandas()  # vocabulary-bounded by the mode contract
        merges = _bpe_train_memory(
            pdf["word"].tolist(),
            pdf["freq"].to_numpy().astype(np.int64),
            n_merges,
        )
    elif mode == "distributed":
        merges = _bpe_train_distributed(wf, n_merges)
    else:
        raise ValueError(f"unknown bpe_train mode {mode!r}")

    import pandas as pd

    df = pd.DataFrame(merges, columns=["rank", "left", "right", "merged", "pair_count"])
    for c in ("left", "right", "merged"):
        df[c] = df[c].str.replace(_EOW, "</w>", regex=False)
    return df


def _bpe_train_memory(words: list, freqs: np.ndarray, n_merges: int):
    """Classic incremental BPE over the in-driver word table: pair-count
    dict + lazy-deletion heap ordered (count desc, left, right) — the
    same total order as the distributed tie-break — and per merge a
    single vectorized numpy pass over ONLY the words that contain the
    winning pair (membership tracked per pair, maintained lazily: stale
    entries are no-ops in the re-count). Complexity is the textbook
    sum-of-affected-word-sizes, not rounds × vocabulary."""
    import heapq

    merges = []
    if not words:
        return merges
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
    offs = np.concatenate([[0], np.cumsum(lens)])
    keys = _codepoint_keys("".join(words), offs)
    uniq = np.unique(keys)
    rev = [_key_str(int(k)) for k in uniq]
    flat = np.searchsorted(uniq, keys).astype(np.int64)
    word_arrs = np.split(flat, offs[1:-1])  # per-word views, replaced on merge
    freqs = np.ascontiguousarray(freqs, dtype=np.int64)

    packed, prow = _pack_pairs(flat, offs)
    u, inv = np.unique(packed, return_inverse=True)
    cnt = np.zeros(len(u), dtype=np.int64)
    np.add.at(cnt, inv, freqs[prow])
    pair_counts = dict(zip(u.tolist(), cnt.tolist()))

    # pair -> word ids containing it (append-only; verified on use)
    order = np.lexsort((prow, packed))
    sp, sr = packed[order], prow[order]
    dedup = np.concatenate([[True], (sp[1:] != sp[:-1]) | (sr[1:] != sr[:-1])])
    dp, dr = sp[dedup], sr[dedup]
    bounds = np.concatenate([[0], np.flatnonzero(dp[1:] != dp[:-1]) + 1, [len(dp)]])
    pair_words = {
        int(dp[bounds[i]]): dr[bounds[i] : bounds[i + 1]].tolist()
        for i in range(len(bounds) - 1)
    }

    heap = [(-c, rev[p >> 32], rev[p & 0xFFFFFFFF], p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    for rank in range(n_merges):
        # pop to the live max (lazy deletion: entry must match the dict)
        while heap:
            negc, l_str, r_str, p = heap[0]
            if pair_counts.get(p) == -negc:
                break
            heapq.heappop(heap)
        if not heap:
            break
        heapq.heappop(heap)
        top = -negc
        left_id, right_id = p >> 32, p & 0xFFFFFFFF
        new_id = len(rev)
        merged_str = l_str + r_str
        rev.append(merged_str)
        merges.append((rank, l_str, r_str, merged_str, int(top)))
        del pair_counts[p]

        aw = np.unique(np.asarray(pair_words.pop(p, []), dtype=np.int64))
        sub_list = [word_arrs[i] for i in aw]
        sub_flat = np.concatenate(sub_list) if sub_list else np.empty(0, np.int64)
        sub_lens = np.fromiter((len(a) for a in sub_list), np.int64, count=len(sub_list))
        sub_offs = np.concatenate([[0], np.cumsum(sub_lens)])
        w = freqs[aw]

        pre_packed, pre_row = _pack_pairs(sub_flat, sub_offs)
        new_flat, new_offs = _apply_merge(sub_flat, sub_offs, left_id, right_id, new_id)
        post_packed, post_row = _pack_pairs(new_flat, new_offs)

        allp = np.concatenate([pre_packed, post_packed])
        allw = np.concatenate([-w[pre_row], w[post_row]])
        du, dinv = np.unique(allp, return_inverse=True)
        delta = np.zeros(len(du), dtype=np.int64)
        np.add.at(delta, dinv, allw)
        for pair, d in zip(du.tolist(), delta.tolist()):
            if d == 0 or pair == p:
                continue
            c = pair_counts.get(pair, 0) + d
            if c <= 0:
                pair_counts.pop(pair, None)
            else:
                pair_counts[pair] = c
                heapq.heappush(
                    heap, (-c, rev[pair >> 32], rev[pair & 0xFFFFFFFF], pair)
                )
        if len(post_packed):
            o2 = np.lexsort((post_row, post_packed))
            pp, pr = post_packed[o2], post_row[o2]
            k2 = np.concatenate([[True], (pp[1:] != pp[:-1]) | (pr[1:] != pr[:-1])])
            aw_list = aw.tolist()
            for pair, r in zip(pp[k2].tolist(), pr[k2].tolist()):
                lst = pair_words.get(pair)
                if lst is None:
                    pair_words[pair] = [aw_list[r]]
                else:
                    lst.append(aw_list[r])
        for j, r in enumerate(np.split(new_flat, new_offs[1:-1])):
            word_arrs[aw[j]] = r
    return merges


def _bpe_train_distributed(wf, n_merges: int):
    """Per-round dataset passes over the Dataset word table — the
    overflow mode for vocabularies too large to collect. One partial
    pair-count pass + groupby-sum + one vectorized merge-apply pass per
    round; the winning pair ids ride each task's closure."""
    from ray.data.aggregate import Sum

    # symbol inventory: alphabet-sized int64 codepoint keys, collected once;
    # defines the globally consistent symbol-id space workers share read-only
    def keys_partial(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        lens = pc.utf8_length(t["word"]).to_numpy(zero_copy_only=False).astype(np.int64)
        ks = _codepoint_keys("".join(words), _word_offs(words, lens))
        return pa.table({"c": pa.array(np.unique(ks))})

    uniq = np.sort(
        np.asarray(
            list(wf.map_batches(keys_partial, batch_format="pyarrow").unique("c")),
            dtype=np.int64,
        )
    )
    rev = [_key_str(int(k)) for k in uniq]

    def to_syms(t: pa.Table, _uniq=uniq) -> pa.Table:
        words = t["word"].to_pylist()
        freqs = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.utf8_length(t["word"]).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = _word_offs(words, lens)
        ids = np.searchsorted(_uniq, _codepoint_keys("".join(words), offs)).astype(
            np.int64
        )
        return _sym_table(ids, offs, freqs)

    syms = wf.map_batches(to_syms, batch_format="pyarrow").materialize()

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, offs = _flat_offs(t)
        fr = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed, prow = _pack_pairs(flat, offs)
        if not len(packed):
            return pa.table(
                {"p": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())}
            )
        u, inv = np.unique(packed, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, fr[prow])
        return pa.table({"p": pa.array(u), "cnt": pa.array(acc)})

    merges = []
    for rank in range(n_merges):
        counts = (
            syms.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("p")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .materialize()
        )
        if counts.count() == 0:
            break
        top = counts.max("cnt")
        tied = counts.map_batches(
            lambda t, _t=top: t.filter(pc.equal(t["cnt"], _t)),
            batch_format="pyarrow",
        ).to_pandas()
        pairs = [
            (rev[int(p) >> 32], rev[int(p) & 0xFFFFFFFF], int(p)) for p in tied["p"]
        ]
        l_str, r_str, packed_win = min(pairs)
        left_id, right_id = packed_win >> 32, packed_win & 0xFFFFFFFF
        new_id = len(rev)
        merged_str = l_str + r_str
        rev.append(merged_str)
        merges.append((rank, l_str, r_str, merged_str, int(top)))

        def apply_fn(t: pa.Table, _l=left_id, _r=right_id, _n=new_id) -> pa.Table:
            flat, offs = _flat_offs(t)
            fr = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
            nf, no = _apply_merge(flat, offs, _l, _r, _n)
            return _sym_table(nf, no, fr)

        syms = syms.map_batches(apply_fn, batch_format="pyarrow").materialize()
    return merges


# ----------------------------------------------------------------- encode


def bpe_encode_counts(ds, merges, *, text_col: str = "text", id_col: str = "doc_id"):
    """Tokenize the corpus with a LEARNED merge table (the output of
    :func:`bpe_train`, or any (left, right) string pairs in rank order
    using ``</w>`` end-of-word notation): per batch, build batch-local
    symbol ids, apply every merge in rank order with the same vectorized
    run-parity kernel used in training, and emit (id, n_bpe_tokens).

    Stateless streaming map — the merge table rides each task's closure
    (merge tables are KBs), so tokenizing 100 TB shuffles nothing.
    Batch-local symbol ids are sound because the output is counts, not
    ids; merge strings are interned per batch in rank order, which
    reproduces the training-time id chains exactly."""
    try:  # accept the bpe_train DataFrame or an iterable of pairs
        rules = [(r.left, r.right, r.merged) for r in merges.itertuples()]
    except AttributeError:
        rules = [(l, r, l + r) for l, r in merges]
    rules = [
        tuple(x.replace("</w>", _EOW) for x in rule) for rule in rules
    ]

    def encode(t: pa.Table) -> pa.Table:
        # identical tokenization to word_freqs: RE2 \s+ over the lowered
        # column (str.split() differs on exotic Unicode whitespace)
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_words = toks.flatten()
        row_of_word = np.repeat(
            np.arange(t.num_rows, dtype=np.int64),
            np.diff(np.asarray(toks.offsets, dtype=np.int64)),
        )
        nonempty = pc.not_equal(flat_words, "").to_numpy(zero_copy_only=False)
        nonempty = np.asarray(nonempty, dtype=object) == True  # noqa: E712 — null-safe
        words = flat_words.filter(pa.array(nonempty))
        row_of_word = row_of_word[nonempty]
        wpd = np.bincount(row_of_word, minlength=t.num_rows).astype(np.int64)

        # batch-local symbol ids, fully vectorized (utf-32 codepoint keys
        # with the EOW flag on each word's last char — no per-word loop)
        lens = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.concatenate([[0], np.cumsum(lens)])
        keys = _codepoint_keys("".join(words.to_pylist()), o)
        uniq = np.unique(keys)
        f = np.searchsorted(uniq, keys).astype(np.int64)
        vocab: dict[str, int] = {_key_str(int(k)): i for i, k in enumerate(uniq)}

        def intern(sym: str) -> int:
            sid = vocab.get(sym)
            if sid is None:
                sid = len(vocab)
                vocab[sym] = sid
            return sid

        for l_str, r_str, m_str in rules:
            li, ri = vocab.get(l_str), vocab.get(r_str)
            mi = intern(m_str)  # intern even on no-match: keeps id chains stable
            if li is None or ri is None:
                continue
            f, o = _apply_merge(f, o, li, ri, mi)
        per_word = np.diff(o)
        counts = np.bincount(
            row_of_word, weights=per_word, minlength=t.num_rows
        ).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")
