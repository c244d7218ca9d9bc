"""N-gram LM quality scoring (text/backoff_lm.py): exact integer stupid-backoff vs
a pure-Python reference; broadcast/join mode bit-equality; edge cases."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.text.backoff_lm import (
    BACKOFF_DEN,
    BACKOFF_NUM,
    lm_score,
    ngram_lm_train,
)

SCALE = 10**6


def _ref(train_texts, score_texts, scale=SCALE):
    """Single-process reference of the exact recurrence."""
    uni, bi, total = {}, {}, 0
    for t in train_texts:
        toks = [w for w in t.lower().split() if w]
        total += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = []
    for t in score_texts:
        toks = [w for w in t.lower().split() if w]
        ps = []
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi:
                ps.append((bi[(a, b)] * scale) // uni[a])
            elif b in uni and total > 0:
                ps.append((BACKOFF_NUM * uni[b] * scale) // (BACKOFF_DEN * total))
            else:
                ps.append(0)
        out.append((len(ps), sum(ps) // len(ps) if ps else 0))
    return out


def _docs_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the the the",
    "",
    "single",
    "  spaced   out   tokens  ",
]


def _run(texts, mode, **kw):
    ds = _docs_ds(texts)
    model = ngram_lm_train(ds)
    out = (
        lm_score(ds, model, scale=SCALE, mode=mode, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(texts)
    return out


def test_lm_broadcast_matches_reference(ray_session):
    out = _run(TRAIN, "broadcast")
    want = _ref(TRAIN, TRAIN)
    got = list(zip(out["n_pairs"].tolist(), out["score_fp"].tolist()))
    assert got == want


def test_lm_join_bit_equal_to_broadcast(ray_session):
    a = _run(TRAIN, "broadcast")
    b = _run(TRAIN, "join", num_buckets=3)
    assert a["n_pairs"].tolist() == b["n_pairs"].tolist()
    assert a["score_fp"].tolist() == b["score_fp"].tolist()


def test_lm_foreign_docs_backoff_and_oov(ray_session):
    # score docs the model never saw: unseen bigrams back off, OOV w2 -> 0
    train = _docs_ds(TRAIN)
    model = ngram_lm_train(train)
    foreign = ["cat on mat", "zzz qqq unseen", "dog the cat", ""]
    for mode in ("broadcast", "join"):
        out = (
            lm_score(_docs_ds(foreign), model, scale=SCALE, mode=mode)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = _ref(TRAIN, foreign)
        got = list(zip(out["n_pairs"].tolist(), out["score_fp"].tolist()))
        assert got == want, mode
    # the all-OOV doc scored exactly 0 with pairs counted
    assert want[1] == (2, 0)


def test_lm_scores_rank_fluent_above_shuffled(ray_session):
    rng = np.random.default_rng(5)
    fluent = ["the cat sat on the mat"] * 3
    words = "the cat sat on the mat".split()
    shuffled = [" ".join(rng.permutation(words)) for _ in range(3)]
    ds = _docs_ds(fluent + shuffled)
    model = ngram_lm_train(ds)
    out = lm_score(ds, model).to_pandas().sort_values("doc_id")
    s = out["score_fp"].to_numpy()
    assert s[:3].min() >= s[3:].max()  # repeated fluent text scores highest


def test_lm_random_corpora_both_modes_match_reference(ray_session):
    rng = np.random.default_rng(31)
    vocab = ["t%d" % i for i in range(9)]
    for trial in range(3):
        train = [
            " ".join(rng.choice(vocab, size=rng.integers(0, 10)))
            for _ in range(rng.integers(2, 12))
        ]
        score = [
            " ".join(rng.choice(vocab + ["oov1", "oov2"], size=rng.integers(0, 8)))
            for _ in range(rng.integers(1, 8))
        ]
        model = ngram_lm_train(_docs_ds(train))
        want = _ref(train, score)
        for mode in ("broadcast", "join"):
            out = (
                lm_score(_docs_ds(score), model, scale=SCALE, mode=mode)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            got = list(zip(out["n_pairs"].tolist(), out["score_fp"].tolist()))
            assert got == want, (trial, mode)
