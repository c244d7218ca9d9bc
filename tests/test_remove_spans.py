"""ExactSubstr span REMOVAL (dedup/spans.py remove_dup_spans) vs a
sequential reference."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.dedup.spans import remove_dup_spans


def _ref_remove(texts, n, min_docs):
    toks = [[w for w in t.lower().split() if w] for t in texts]
    df = {}
    for ts in toks:
        for g in {tuple(ts[i : i + n]) for i in range(len(ts) - n + 1)}:
            df[g] = df.get(g, 0) + 1
    out = []
    for ts in toks:
        cov = np.zeros(len(ts), dtype=bool)
        for i in range(len(ts) - n + 1):
            if df[tuple(ts[i : i + n])] >= min_docs:
                cov[i : i + n] = True
        kept = [w for w, c in zip(ts, cov) if not c]
        out.append((" ".join(kept), len(ts), int(cov.sum())))
    return out


def _run(texts, n=4, min_docs=2, **kw):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    out = (
        remove_dup_spans(ds, n=n, min_docs=min_docs, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(texts)
    return list(zip(out["text_clean"], out["n_tokens"], out["n_removed"]))


BOILER = "all rights reserved contact us at"


def test_remove_spans_matches_reference(ray_session):
    texts = [
        f"unique article one about cats {BOILER} tail one",
        f"unique article two about dogs {BOILER} tail two",
        "a wholly original document with no shared text at all",
        "short doc",
        "",
        f"{BOILER} {BOILER} doubled boilerplate only",
    ]
    want = _ref_remove(texts, 4, 2)
    got = _run(texts, n=4, min_docs=2, num_partitions=3)
    assert got == want
    # the boilerplate run is actually gone from the cleaned docs
    assert BOILER not in got[0][0] and "unique article one" in got[0][0]


def test_remove_spans_no_dups_passthrough_normalized(ray_session):
    texts = ["Only  One   Doc here", "another totally different doc"]
    got = _run(texts, n=2, min_docs=2)
    assert got[0] == ("only one doc here", 4, 0)
    assert got[1][2] == 0


def test_remove_spans_overlapping_spans_merge(ray_session):
    # "x a b c y" / "p a b c q": only "a b c" is shared at n=3 -> one span
    texts = ["x a b c y", "p a b c q", "x a b c y"]  # doc0==doc2 entirely
    want = _ref_remove(texts, 3, 2)
    got = _run(texts, n=3, min_docs=2)
    assert got == want
    assert got[1][0] == "p q"  # middle doc keeps its unique ends


def test_remove_spans_random_corpora_match_reference(ray_session):
    rng = np.random.default_rng(77)
    vocab = ["w%d" % i for i in range(12)]
    for trial in range(4):
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(0, 14)))
            for _ in range(rng.integers(2, 15))
        ]
        n = int(rng.integers(2, 4))
        want = _ref_remove(texts, n, 2)
        got = _run(texts, n=n, min_docs=2, num_partitions=int(rng.integers(2, 6)))
        assert got == want, (trial, n)


def test_remove_spans_non_ascii_whitespace(ray_session):
    # U+00A0 is whitespace for Python str.split() but NOT for RE2 \s, so
    # "alpha beta" is ONE token under the engine's Arrow tokenizer.
    # A rebuild that re-tokenized with .split() would shift every position
    # by one and strip the wrong words.
    texts = [
        "alpha beta shared run of words here tail0",
        "intro shared run of words here tail1",
    ]
    got = _run(texts, n=4, min_docs=2)
    assert got[0] == ("alpha beta tail0", 7, 5)
    assert got[1] == ("intro tail1", 7, 5)
