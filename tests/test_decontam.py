"""Tests for test-set decontamination (word n-gram overlap vs a held-out
set): the vectorized n-gram hash explode, buffer-level FNV kernels, and
the broadcast vs distributed-join agreement."""

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.dedup.ngram import _fnv, fnv_fold, fnv_strings
from incubator_sedona_ray.text.decontam import (
    _doc_ngram_hashes,
    contamination_report,
    decontaminate,
    heldout_ngram_hashes,
)


# ------------------------------------------------------------ FNV kernels


def test_fnv_strings_matches_scalar():
    words = ["a", "bb", "spark", "", "Zebra", "naïve", "x" * 40]
    arr = pa.array(words, type=pa.string())
    got = fnv_strings(arr)
    want = np.array([_fnv(w.encode("utf-8")) for w in words], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_fnv_strings_sliced_and_large():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    want = np.array([_fnv(b"bb"), _fnv(b"cc")], dtype=np.uint64)
    assert np.array_equal(fnv_strings(arr), want)
    big = pa.array(["bb", "cc"], type=pa.large_string())
    assert np.array_equal(fnv_strings(big), want)
    assert fnv_strings(pa.array([], type=pa.string())).shape == (0,)


def test_fnv_fold_separates_word_boundaries():
    wh = fnv_strings(pa.array(["ab", "c", "a", "bc"]))
    h1 = fnv_fold(wh, np.array([0]), 2)  # "ab c"
    h2 = fnv_fold(wh, np.array([2]), 2)  # "a bc"
    assert h1[0] != h2[0]
    # same word sequence -> same hash regardless of position
    wh2 = fnv_strings(pa.array(["pad", "ab", "c"]))
    assert fnv_fold(wh2, np.array([1]), 2)[0] == h1[0]


# ---------------------------------------------------------- n-gram explode


def test_doc_ngram_hashes_rows_and_counts():
    t = pa.table(
        {
            "doc_id": [10, 11, 12, 13],
            "text": ["a b c d", "  a   b  ", "", "a B c"],
        }
    )
    g_row, h, n_grams = _doc_ngram_hashes(t, 2, "text", "doc_id")
    # row0: "a b","b c","c d"; row1: "a b"; row2: none; row3: "a b","b c"
    assert n_grams.tolist() == [3, 1, 0, 2]
    assert g_row.tolist() == [0, 0, 0, 1, 3, 3]
    # whitespace runs and case are normalized: row1's "a b" == row0's
    assert h[3] == h[0]
    assert h[4] == h[0] and h[5] == h[1]
    # no cross-row n-gram: "d a" (end of row0 + start of row1) absent
    wh = fnv_strings(pa.array(["d", "a"]))
    assert fnv_fold(wh, np.array([0]), 2)[0] not in h.tolist()


def _mini(ray_session):
    import ray.data

    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps",  # contaminated (1 gram)
                    "totally unrelated words here now",
                    "quick brown fox ate the quick brown fox today",  # 2 hits? no: distinct grams
                    "short",
                ],
            }
        )
    )
    test = ray.data.from_arrow(
        pa.table({"doc_id": [100], "text": ["see the quick brown fox run"]})
    )
    return train, test


def test_report_broadcast_and_join_agree(ray_session):
    train, test = _mini(ray_session)
    rep_b = (
        contamination_report(train, test, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rep_j = (
        contamination_report(train, test, n=3, mode="join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert rep_b.equals(rep_j)
    # doc1 and doc3 each share "the quick brown" + "quick brown fox";
    # doc3 has "quick brown fox" TWICE but the distinct count stays 2
    assert rep_b["doc_id"].tolist() == [1, 3]
    assert rep_b["n_hits"].tolist() == [2, 2]


def test_decontaminate_filters(ray_session):
    train, test = _mini(ray_session)
    clean = decontaminate(train, test, n=3).to_pandas()
    assert sorted(clean["doc_id"].tolist()) == [2, 4]
    clean_j = decontaminate(train, test, n=3, mode="join").to_pandas()
    assert sorted(clean_j["doc_id"].tolist()) == [2, 4]


def test_empty_test_set_and_short_docs(ray_session):
    import ray.data

    train = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["one two three", "x"]})
    )
    empty = ray.data.from_arrow(pa.table({"doc_id": [9], "text": [""]}))
    assert heldout_ngram_hashes(empty, n=3).shape == (0,)
    rep = contamination_report(train, empty, n=3).to_pandas()
    assert len(rep) == 0
    assert decontaminate(train, empty, n=3).count() == 2
