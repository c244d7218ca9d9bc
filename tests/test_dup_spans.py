"""Tests for duplicate-span detection (dedup/spans.py dup_span_report):
distinct shared word n-grams per document vs a brute-force oracle."""

import itertools

import pyarrow as pa
import ray


def _grams(text: str, n: int) -> set[str]:
    ws = [w for w in text.lower().split() if w]
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _oracle(rows, n, min_docs):
    per_doc = {doc_id: _grams(text, n) for doc_id, text in rows}
    df: dict[str, int] = {}
    for gs in per_doc.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    dup = {g for g, c in df.items() if c >= min_docs}
    out = {}
    for doc_id, gs in per_doc.items():
        hit = len(gs & dup)
        if hit:
            out[doc_id] = (hit, len(gs), hit / len(gs))
    return out


def _run(rows, n=2, min_docs=2):
    from incubator_sedona_ray.dedup.spans import dup_span_report

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        )
    )
    got = dup_span_report(ds, n=n, min_docs=min_docs, num_partitions=3).to_pandas()
    return {
        int(r.doc_id): (int(r.dup_grams), int(r.total_grams), float(r.dup_frac))
        for r in got.itertuples()
    }


def test_dup_spans_basic(ray_session):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a quick brown fox appeared"),  # shares "quick brown","brown fox"
        (3, "completely unrelated words here only"),
        (4, "the quick brown fox jumps over the lazy dog"),  # full dup of 1
        (5, ""),  # no grams at all
    ]
    got = _run(rows, n=2, min_docs=2)
    want = _oracle(rows[:5], 2, 2)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert abs(got[k][2] - want[k][2]) < 1e-12


def test_dup_spans_min_docs_threshold(ray_session):
    rows = [
        (1, "x y z common tail words"),
        (2, "p q r common tail words"),
        (3, "m n o common tail words"),
    ]
    # with min_docs=3 only grams in all three docs survive
    got = _run(rows, n=3, min_docs=3)
    want = _oracle(rows, 3, 3)
    assert got == want
    assert all(v[0] >= 1 for v in got.values())


def test_dup_spans_repeated_gram_counted_once(ray_session):
    # "a b" occurs twice inside doc 1 but must count as ONE distinct gram
    rows = [(1, "a b c a b"), (2, "a b d")]
    got = _run(rows, n=2, min_docs=2)
    want = _oracle(rows, 2, 2)
    assert got == want
    assert got[1][0] == 1  # just "a b"


def test_dup_spans_fuzz_vs_oracle(ray_session):
    import random

    rnd = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 12))))
        for i in range(40)
    ]
    for n, min_docs in itertools.product((2, 3), (2, 4)):
        got = _run(rows, n=n, min_docs=min_docs)
        want = _oracle(rows, n, min_docs)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k][:2] == want[k][:2], (n, min_docs, k)
