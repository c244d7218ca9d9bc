"""Tests for distributed BPE training (text/bpe.py) against a sequential
reference implementation, plus kernel-level merge/overlap checks."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.text.bpe import (
    _EOW,
    _apply_merge,
    _pack_pairs,
    bpe_train,
    word_freqs,
)


def ref_bpe(texts, k):
    """Sequential Sennrich-style reference with the same tie-break."""
    wf = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                wf[w] += 1
    words = {w: tuple(list(w[:-1]) + [w[-1] + _EOW]) for w in wf}
    merges = []
    for rank in range(k):
        pcount = Counter()
        for w, f in wf.items():
            s = words[w]
            for i in range(len(s) - 1):
                pcount[(s[i], s[i + 1])] += f
        if not pcount:
            break
        top = max(pcount.values())
        l, r = min(p for p, c in pcount.items() if c == top)
        merges.append((rank, l, r, l + r, top))
        for w in words:
            s, out, i = words[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[w] = tuple(out)
    return [
        (a, b.replace(_EOW, "</w>"), c.replace(_EOW, "</w>"), d.replace(_EOW, "</w>"), e)
        for a, b, c, d, e in merges
    ]


def _train(texts, k, parts=3, **kw):
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(parts)
    return [tuple(r) for r in bpe_train(ds, k, **kw).itertuples(index=False)]


def test_bpe_matches_reference(ray_session):
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "aaaa aaa aa a",
        "low lower lowest slow slowly",
    ]
    assert _train(texts, 8) == ref_bpe(texts, 8)


def test_bpe_parallelism_invariant(ray_session):
    texts = ["ab ab abc abcd " * 3, "xy xyz xy zzz", "q"]
    assert _train(texts, 6, parts=1) == _train(texts, 6, parts=5) == ref_bpe(texts, 6)


def test_bpe_fuzz_vs_reference(ray_session):
    rnd = np.random.default_rng(9)
    alpha = list("abcde")
    texts = [
        " ".join(
            "".join(rnd.choice(alpha) for _ in range(int(rnd.integers(1, 6))))
            for _ in range(int(rnd.integers(1, 15)))
        )
        for _ in range(30)
    ]
    assert _train(texts, 10) == ref_bpe(texts, 10)


def test_bpe_exhausts_small_corpus(ray_session):
    # 'ab' alone: merges (a,b</w>) then nothing pairs -> early stop
    got = _train(["ab"], 5, parts=1)
    assert got == [(0, "a", "b</w>", "ab</w>", 1)]


def test_bpe_memory_equals_distributed(ray_session):
    texts = [
        "the cat sat on the mat",
        "aaaa aaa aa a",
        "low lower lowest slow slowly",
        "résumé naïve café résumé",
    ]
    mem = _train(texts, 12, mode="memory")
    dist = _train(texts, 12, mode="distributed")
    assert mem == dist == ref_bpe(texts, 12)


def test_bpe_memory_equals_distributed_fuzz(ray_session):
    rnd = np.random.default_rng(41)
    alpha = list("abc")
    texts = [
        " ".join(
            "".join(rnd.choice(alpha) for _ in range(int(rnd.integers(1, 7))))
            for _ in range(int(rnd.integers(1, 12)))
        )
        for _ in range(40)
    ]
    assert (
        _train(texts, 15, mode="memory")
        == _train(texts, 15, mode="distributed")
        == ref_bpe(texts, 15)
    )


def test_bpe_memory_deep_merges(ray_session):
    # run far past pair exhaustion on a real-ish corpus: the incremental
    # trainer's heap/membership bookkeeping must stay consistent deep in
    # (this is the 30k-vocab production path at miniature scale)
    texts = ["the quick brown fox jumps over the lazy dog " * 3] * 4 + [
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ]
    got = _train(texts, 200, mode="memory")
    ref = ref_bpe(texts, 200)
    assert got == ref


def test_bpe_auto_mode_threshold(ray_session):
    texts = ["aa bb aa cc"]
    # 3 distinct words: memory_max_words=2 forces the distributed path
    assert _train(texts, 4, memory_max_words=2) == _train(texts, 4, mode="memory")


def test_word_freqs(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": ["A a  b", "b B\ta"]}))
    out = word_freqs(ds).to_pandas().sort_values("word").reset_index(drop=True)
    assert dict(zip(out["word"], out["freq"])) == {"a": 3, "b": 3}


def test_apply_merge_overlap_chains():
    # word 'aaaa' = [0,0,0,0]: merge (0,0)->5 must give [5,5]
    flat = np.array([0, 0, 0, 0], dtype=np.int64)
    offs = np.array([0, 4], dtype=np.int64)
    nf, no = _apply_merge(flat, offs, 0, 0, 5)
    assert nf.tolist() == [5, 5] and no.tolist() == [0, 2]
    # 'aaa' -> [5, 0]
    nf, no = _apply_merge(np.array([0, 0, 0]), np.array([0, 3]), 0, 0, 5)
    assert nf.tolist() == [5, 0]
    # no cross-word merges: words [0][0] stay untouched
    nf, no = _apply_merge(np.array([0, 0]), np.array([0, 1, 2]), 0, 0, 5)
    assert nf.tolist() == [0, 0] and no.tolist() == [0, 1, 2]


def test_pack_pairs_word_boundaries():
    flat = np.array([1, 2, 3, 4], dtype=np.int64)
    offs = np.array([0, 2, 4], dtype=np.int64)
    packed, rows = _pack_pairs(flat, offs)
    assert packed.tolist() == [(1 << 32) | 2, (3 << 32) | 4]
    assert rows.tolist() == [0, 1]


def ref_encode_counts(texts, merges):
    """Sequential encode with the learned merges (rank order)."""
    rules = [(l.replace("</w>", _EOW), r.replace("</w>", _EOW)) for _, l, r, *_ in merges]
    counts = []
    for t in texts:
        total = 0
        for w in t.lower().split():
            if not w:
                continue
            s = list(w[:-1]) + [w[-1] + _EOW]
            for l, r in rules:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            total += len(s)
        counts.append(total)
    return counts


def test_bpe_encode_counts_matches_reference(ray_session):
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "aaaa aaa aa a",
        "low lower lowest slow slowly",
        "",
        "unseen zzz qqq",
    ]
    train = ray.data.from_arrow(pa.table({"text": texts[:4]}))
    merges_df = None
    from incubator_sedona_ray.text.bpe import bpe_encode_counts, bpe_train

    merges_df = bpe_train(train, 6)
    merges = list(merges_df.itertuples(index=False))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    ).repartition(3)
    out = (
        bpe_encode_counts(ds, merges_df)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_bpe_tokens"].tolist() == ref_encode_counts(texts, merges)


def test_bpe_encode_no_merges_is_char_count(ray_session):
    import pandas as pd

    from incubator_sedona_ray.text.bpe import bpe_encode_counts

    empty = pd.DataFrame(columns=["rank", "left", "right", "merged", "pair_count"])
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], type=pa.int64()), "text": ["ab cd", "x"]})
    )
    out = bpe_encode_counts(ds, empty).to_pandas().sort_values("doc_id")
    assert out["n_bpe_tokens"].tolist() == [4, 1]  # chars with glued EOW
