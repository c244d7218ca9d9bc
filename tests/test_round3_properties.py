"""Hypothesis property tests for the round-3 session kernels: BPE merge
application, WARC record codec, link extraction, prefix-sum scan."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_sedona_ray.dedup.spans import _explode_fn
from incubator_sedona_ray.sources.warc import encode_records, parse_records
from incubator_sedona_ray.text.bpe import _apply_merge, _pack_pairs
from incubator_sedona_ray.text.links import extract_links_batch


# ------------------------------------------------------------ BPE merge


def _seq_merge(symbols, left, right, new_id):
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(new_id)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(
        st.lists(st.integers(0, 3), min_size=0, max_size=8), min_size=0, max_size=6
    ),
    left=st.integers(0, 3),
    right=st.integers(0, 3),
)
def test_apply_merge_matches_sequential(words, left, right):
    flat = np.array([x for w in words for x in w], dtype=np.int64)
    offs = np.cumsum([0] + [len(w) for w in words]).astype(np.int64)
    nf, no = _apply_merge(flat, offs, left, right, 99)
    want_words = [_seq_merge(w, left, right, 99) for w in words]
    want_flat = [x for w in want_words for x in w]
    want_offs = np.cumsum([0] + [len(w) for w in want_words])
    assert nf.tolist() == want_flat
    assert no.tolist() == want_offs.tolist()


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=6), min_size=0, max_size=5
    )
)
def test_pack_pairs_never_crosses_words(words):
    flat = np.array([x for w in words for x in w], dtype=np.int64)
    offs = np.cumsum([0] + [len(w) for w in words]).astype(np.int64)
    packed, rows = _pack_pairs(flat, offs)
    want = [
        ((w[i] << 32) | w[i + 1], wi)
        for wi, w in enumerate(words)
        for i in range(len(w) - 1)
    ]
    assert list(zip(packed.tolist(), rows.tolist())) == want


# ------------------------------------------------------------ WARC codec


@settings(max_examples=100, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=5),
)
def test_warc_roundtrip_arbitrary_payloads(payloads):
    urls = [f"https://h{i}.ex/p" for i in range(len(payloads))]
    dates = ["2024-01-01T00:00:00Z"] * len(payloads)
    blob = encode_records(urls, dates, payloads)
    out = list(parse_records(blob))
    assert [r["payload"] for r in out] == payloads
    assert [r["url"] for r in out] == urls


# ------------------------------------------------------------ links


@settings(max_examples=100, deadline=None)
@given(
    hrefs=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters='"', blacklist_categories=("Cs",)),
            min_size=0,
            max_size=30,
        ),
        min_size=0,
        max_size=6,
    )
)
def test_extract_links_recovers_all_hrefs(hrefs):
    html = "<p>pre</p>" + "".join(f'<a href="{h}">t</a>' for h in hrefs)
    t = pa.table({"url": ["https://s.ex/p"], "html": [html.encode("utf-8")]})
    out = extract_links_batch(t).to_pydict()
    want = [
        h
        for h in hrefs
        if h.startswith(("http://", "https://"))
        or (h.startswith("/") and not h.startswith("//"))
    ]
    assert out["href"] == want


# ------------------------------------------------------------ dup spans


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=10).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_dup_span_explode_pairs_are_distinct(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": texts,
        }
    )
    out = _explode_fn(2, "doc_id", "text", 4)(t)
    pairs = list(zip(out["doc_id"].to_pylist(), out["h"].to_pylist()))
    assert len(pairs) == len(set(pairs))  # distinct per (doc, gram)
    # bucket tag is consistent with the hash
    for h, b in zip(out["h"].to_pylist(), out["_b"].to_pylist()):
        assert np.uint64(h) % np.uint64(4) == np.uint64(b)
