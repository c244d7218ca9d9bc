"""DSIR importance selection (text/dsir.py) vs a sequential reference;
broadcast/join mode equivalence; zero-token and tie handling."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.text.dsir import DSIR_SCALE, dsir_scores, dsir_select


def _ref_scores(texts, target_texts, scale=DSIR_SCALE):
    def toks(t):
        return [w for w in t.lower().split() if w]

    cr, ct = {}, {}
    for t in texts:
        for w in toks(t):
            cr[w] = cr.get(w, 0) + 1
    for t in target_texts:
        for w in toks(t):
            ct[w] = ct.get(w, 0) + 1
    out = []
    for t in texts:
        s = 0
        for w in toks(t):
            s += ((ct.get(w, 0) + 1) * scale) // (cr[w] + 1)
        out.append(s)
    return out


def _mk(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)


TEXTS = [
    "the quick brown fox jumps",
    "le renard brun rapide saute",
    "the lazy dog sleeps all day",
    "",  # zero-token doc must score 0 and still appear
    "quick quick quick fox",
    "chien paresseux dort toute la journee",
]
TARGET = ["the quick brown fox", "the lazy dog"]


def test_dsir_scores_match_reference_both_modes(ray_session):
    want = _ref_scores(TEXTS, TARGET)
    tgt = _mk(TARGET)
    for mode in ("broadcast", "join"):
        got = (
            dsir_scores(_mk(TEXTS), tgt, mode=mode)
            .to_pandas()
            .sort_values("doc_id")["score"]
            .tolist()
        )
        assert got == want, mode


def test_dsir_select_topk_deterministic(ray_session):
    want = _ref_scores(TEXTS, TARGET)
    order = sorted(range(len(TEXTS)), key=lambda i: (-want[i], i))[:3]
    for mode in ("broadcast", "join"):
        df = dsir_select(_mk(TEXTS), _mk(TARGET), 3, mode=mode).to_pandas()
        df = df.sort_values("rank")
        assert df["doc_id"].tolist() == order, mode
        assert df["rank"].tolist() == [1, 2, 3]
        assert df["score"].tolist() == [want[i] for i in order]


def test_dsir_empty_target(ray_session):
    # no target docs: every ratio is scale // (cr+1); scores still exact
    want = _ref_scores(TEXTS, [])
    got = (
        dsir_scores(_mk(TEXTS), _mk([]), mode="broadcast")
        .to_pandas()
        .sort_values("doc_id")["score"]
        .tolist()
    )
    assert got == want


def test_dsir_random_corpora(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for _ in range(60)
    ]
    target = [" ".join(rng.choice(vocab[:10], size=15)) for _ in range(8)]
    want = _ref_scores(texts, target)
    for mode in ("broadcast", "join"):
        got = (
            dsir_scores(_mk(texts), _mk(target), mode=mode)
            .to_pandas()
            .sort_values("doc_id")["score"]
            .tolist()
        )
        assert got == want, mode
