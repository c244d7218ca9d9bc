"""Sequence chunking (text/packing.py): chunk math, min_tokens, empties,
reconstruction byte-identity, and the Dataset wrapper."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.text.packing import chunk_batch, seq_chunks


def _t(texts, ids=None):
    ids = ids or list(range(1, len(texts) + 1))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


def test_exact_multiple():
    out = chunk_batch(_t(["a b c d"]), seq_len=2).to_pandas()
    assert out["chunk"].tolist() == ["a b", "c d"]
    assert out["chunk_id"].tolist() == [0, 1]
    assert out["n_tokens"].tolist() == [2, 2]


def test_trailing_partial_kept():
    out = chunk_batch(_t(["a b c"]), seq_len=2).to_pandas()
    assert out["chunk"].tolist() == ["a b", "c"]
    assert out["n_tokens"].tolist() == [2, 1]


def test_min_tokens_drops_short_tail():
    out = chunk_batch(_t(["a b c d e"]), seq_len=2, min_tokens=2).to_pandas()
    assert out["chunk"].tolist() == ["a b", "c d"]


def test_empty_doc_emits_nothing():
    out = chunk_batch(_t(["", "  ", "x"]), seq_len=4).to_pandas()
    assert out["doc_id"].tolist() == [3]
    assert out["chunk"].tolist() == ["x"]


def test_whitespace_variants_and_case_preserved():
    out = chunk_batch(_t(["A  B\tC\nD"]), seq_len=3).to_pandas()
    assert out["chunk"].tolist() == ["A B C", "D"]


def test_reconstruction_identity():
    # joining all chunks with single spaces == whitespace-normalized doc
    texts = ["the quick brown fox jumps over the lazy dog " * 3, "one two three"]
    out = chunk_batch(_t(texts), seq_len=5).to_pandas()
    for i, txt in enumerate(texts, start=1):
        rec = " ".join(out[out.doc_id == i].sort_values("chunk_id")["chunk"])
        assert rec == " ".join(txt.split())


def test_all_empty_batch():
    out = chunk_batch(_t(["", ""]), seq_len=4)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "chunk_id", "n_tokens", "chunk"]


def test_seq_len_validation(ray_session):
    ds = ray.data.from_arrow(_t(["a"]))
    with pytest.raises(ValueError):
        seq_chunks(ds, 0)


def test_dataset_wrapper(ray_session):
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = seq_chunks(ds, 16).to_pandas()
    assert (out["n_tokens"] <= 16).all() and (out["n_tokens"] >= 1).all()
    # every doc's non-final chunk is full-length
    g = out.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")
    nonfinal = g.apply(lambda d: (d["n_tokens"].iloc[:-1] == 16).all())
    assert nonfinal.all()
