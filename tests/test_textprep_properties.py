"""Property-based tests (hypothesis) for the text-prep kernels: the
vectorized Arrow/numpy implementations are checked against slow, obviously
correct pure-Python references on arbitrary inputs."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from incubator_sedona_ray.dedup.paragraph import chunk_into_lines_fn, explode_paragraphs_fn
from incubator_sedona_ray.text.redact import PII_RULES, redact_batch
from incubator_sedona_ray.text.repetition import repetition_batch
from incubator_sedona_ray.text.urls import canonicalize_batch

# word soup with repeats, varied whitespace, and unicode-ish tokens
word = st.sampled_from(["a", "b", "ab", "the", "x1", "CAFÉ", "café", "zz"])
ws = st.sampled_from([" ", "  ", "\t", " \t "])
text = st.lists(st.tuples(word, ws), max_size=40).map(
    lambda pairs: "".join(w + s for w, s in pairs)
)


def _ref_repetition(t: str):
    toks = [w for w in re.split(r"\s+", t.lower()) if w]
    n = len(toks)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    cnt = Counter(toks)
    dup = 1.0 - len(cnt) / n
    top = max(cnt.values()) / n
    grams = [(toks[i], toks[i + 1]) for i in range(n - 1)]
    if grams:
        dup2 = 1.0 - len(set(grams)) / len(grams)
    else:
        dup2 = 0.0
    return n, dup, top, dup2


@settings(max_examples=150, deadline=None)
@given(st.lists(text, min_size=1, max_size=8))
def test_repetition_matches_reference(texts):
    out = repetition_batch(pa.table({"text": texts}))
    for i, t in enumerate(texts):
        n, dup, top, dup2 = _ref_repetition(t)
        assert out["n_words"][i].as_py() == n
        assert abs(out["dup_word_frac"][i].as_py() - dup) < 1e-12
        assert abs(out["top_word_frac"][i].as_py() - top) < 1e-12
        assert abs(out["dup_2gram_frac"][i].as_py() - dup2) < 1e-12


@settings(max_examples=150, deadline=None)
@given(st.lists(text, min_size=1, max_size=6), st.integers(min_value=1, max_value=7))
def test_chunk_lines_matches_reference(texts, k):
    out = chunk_into_lines_fn(k)(pa.table({"text": texts}))
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"\s+", t) if w]
        expect = "\n".join(
            " ".join(words[j : j + k]) for j in range(0, len(words), k)
        )
        assert out["text"][i].as_py() == expect


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["p", "q", "r", ""]), max_size=6), min_size=1, max_size=5))
def test_explode_paragraphs_matches_reference(paras_per_doc):
    docs = ["\n".join(ps) for ps in paras_per_doc]
    ids = list(range(len(docs)))
    out = explode_paragraphs_fn()(pa.table({"doc_id": ids, "text": docs}))
    expect = [
        (p, (d << 20) | i)
        for d, ps in enumerate(paras_per_doc)
        for i, p in enumerate(docs[d].split("\n"))
        if p
    ]
    got = list(zip(out["para"].to_pylist(), out["packed"].to_pylist()))
    assert got == expect


# PII redaction: the Python `re` module implements the same leftmost
# match-then-continue replacement for these backtracking-free patterns
@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab .@-+0123456789()x\n",
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_redact_matches_re_module(texts):
    out = redact_batch(pa.table({"text": texts}), counts=False)["text"].to_pylist()
    for t, got in zip(texts, out):
        ref = t
        for _, pat, rep in PII_RULES:
            ref = re.sub(pat, rep, ref)
        assert got == ref


_url_piece = st.text(alphabet="aB/?#&=.%~_-0123456789", max_size=20)
_scheme = st.sampled_from(["http://", "HTTPS://", "ftp://", ""])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_scheme, _url_piece), min_size=1, max_size=8))
def test_canonicalize_matches_reference(parts):
    urls = [s + p for s, p in parts]
    got = canonicalize_batch(pa.table({"url": urls}))["canon_url"].to_pylist()
    head_re = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*")
    for u, g in zip(urls, got):
        # no newlines in the URL alphabet: Python's `$`/`.` pre-trailing-\n
        # quirks vs RE2 never engage, so plain re.sub is a faithful reference
        ref = re.sub(r"[?#].*$", "", u)
        m = head_re.match(ref)
        if m:
            ref = m.group(0).lower() + ref[m.end() :]
        ref = re.sub(r"/$", "", ref)
        assert g == ref
