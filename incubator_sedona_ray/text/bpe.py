"""Distributed BPE tokenizer training (Sennrich et al. 2016) — learn the
merge table for a byte-pair-encoding vocabulary over a corpus, the step
every LLM data pipeline runs before tokenizing.

Two-level distributed shape (the standard trick: BPE statistics live on
the WORD-FREQUENCY table, not the corpus):

  1. word freqs   corpus -> (word, freq): per-batch partial counts inside
                  ``map_batches`` (one vectorized split + dictionary
                  encode), then one groupby-sum. The corpus is touched
                  exactly ONCE.
  2. merge loop   ``n_merges`` rounds over the vocab-sized word table,
                  kept distributed (at web scale the distinct-word table
                  is itself huge). Words are flat int64 symbol-id arrays +
                  offsets inside each Arrow batch; per round:
                    a. per-batch partial pair counts (vectorized: adjacent
                       symbol pairs packed into one int64, np.unique with
                       freq weights) -> tiny groupby-sum -> global max +
                       tie filter (DETERMINISTIC tie-break: count desc,
                       then lexicographically smallest (left, right))
                    b. broadcast the winning pair ids in the task closure;
                       every batch applies the merge vectorized
                       (run-parity overlap resolution — 'aaa' under merge
                       (a,a) -> ('aa','a'), exactly the sequential
                       left-to-right single-pass semantics)
                  The word table is re-materialized per round (it shrinks).

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


# ------------------------------------------------------------------ train


def bpe_train(ds, n_merges: int, *, text_col: str = "text"):
    """Learn ``n_merges`` BPE merges over the corpus. Returns a pandas
    DataFrame (rank, left, right, merged, pair_count) — merge-table-sized
    (tiny) by contract. ``</w>`` in a symbol marks end-of-word."""
    from ray.data.aggregate import Sum

    wf = word_freqs(ds, text_col=text_col).materialize()

    # character inventory: alphabet-sized, collected once; defines the
    # globally consistent symbol-id space every worker shares read-only
    def chars_partial(t: pa.Table) -> pa.Table:
        seen = set()
        for w in t["word"].to_pylist():
            if not w:
                continue
            seen.update(w[:-1])
            seen.add(w[-1] + _EOW)
        return pa.table({"c": pa.array(sorted(seen), type=pa.string())})

    chars = sorted(wf.map_batches(chars_partial, batch_format="pyarrow").unique("c"))
    vocab = {c: i for i, c in enumerate(chars)}
    rev = list(chars)

    def to_syms(t: pa.Table, _vocab=vocab) -> pa.Table:
        words = t["word"].to_pylist()
        freqs = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = [], [0]
        for w in words:
            cs = list(w)
            if cs:
                cs[-1] = cs[-1] + _EOW
            flat.extend(_vocab[c] for c in cs)  # lookup-only: never interns
            offs.append(len(flat))
        return _sym_table(
            np.asarray(flat, dtype=np.int64), np.asarray(offs, dtype=np.int64), freqs
        )

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
        tied = counts.filter(lambda r, _t=top: r["cnt"] == _t).to_pandas()
        pairs = [
            (rev[int(p) >> 32], rev[int(p) & 0xFFFFFFFF], int(p)) for p in tied["p"]
        ]
        l_str, r_str, packed_win = min(pairs, key=lambda x: (x[0], x[1]))
        left_id, right_id = packed_win >> 32, packed_win & 0xFFFFFFFF
        new_id = len(rev)
        merged_str = l_str + r_str
        vocab[merged_str] = new_id
        rev.append(merged_str)
        merges.append((rank, l_str, r_str, merged_str, int(top)))

        def apply_fn(t: pa.Table, _l=left_id, _r=right_id, _n=new_id) -> pa.Table:
            flat, offs = _flat_offs(t)
            fr = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
            nf, no = _apply_merge(flat, offs, _l, _r, _n)
            return _sym_table(nf, no, fr)

        syms = syms.map_batches(apply_fn, batch_format="pyarrow").materialize()

    import pandas as pd

    df = pd.DataFrame(merges, columns=["rank", "left", "right", "merged", "pair_count"])
    for c in ("left", "right", "merged"):
        df[c] = df[c].str.replace(_EOW, "</w>", regex=False)
    return df


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
        words_per_doc = []
        flat, offs = [], [0]
        vocab: dict[str, int] = {}

        def intern(sym: str) -> int:
            sid = vocab.get(sym)
            if sid is None:
                sid = len(vocab)
                vocab[sym] = sid
            return sid

        # identical tokenization to word_freqs: RE2 \s+ over the lowered
        # column (str.split() differs on exotic Unicode whitespace)
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern=r"\s+")
        for row in toks.to_pylist():
            words = [w for w in (row or []) if w]
            words_per_doc.append(len(words))
            for w in words:
                cs = list(w)
                cs[-1] = cs[-1] + _EOW
                flat.extend(intern(c) for c in cs)
                offs.append(len(flat))
        f = np.asarray(flat, dtype=np.int64)
        o = np.asarray(offs, dtype=np.int64)
        for l_str, r_str, m_str in rules:
            li, ri = vocab.get(l_str), vocab.get(r_str)
            mi = intern(m_str)  # intern even on no-match: keeps id chains stable
            if li is None or ri is None:
                continue
            f, o = _apply_merge(f, o, li, ri, mi)
        per_word = np.diff(o)
        wpd = np.asarray(words_per_doc, dtype=np.int64)
        doc_of_word = np.repeat(np.arange(len(wpd)), wpd)
        counts = np.bincount(doc_of_word, weights=per_word, minlength=len(wpd)).astype(
            np.int64
        )
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")
