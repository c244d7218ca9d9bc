"""Tests for the distributed exclusive prefix sum (state/scan.py) and
cross-document sequence packing (text/packing.py pack_offsets)."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.state.scan import range_prefix_sum
from incubator_sedona_ray.text.packing import count_tokens_batch, pack_offsets


def _scan(keys, vals, num_ranges=4, **kw):
    t = pa.table(
        {
            "k": pa.array(keys, type=pa.int64()),
            "v": pa.array(vals, type=pa.int64()),
        }
    )
    out = range_prefix_sum(
        ray.data.from_arrow(t), "k", "v", num_ranges=num_ranges, **kw
    ).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_prefix_sum_matches_numpy(ray_session):
    rnd = np.random.default_rng(11)
    keys = rnd.permutation(200).astype(np.int64)  # unique, shuffled order
    vals = rnd.integers(0, 1000, size=200).astype(np.int64)
    out = _scan(keys, vals, num_ranges=7)
    order = np.argsort(keys)
    want = np.zeros(200, dtype=np.int64)
    want[1:] = np.cumsum(vals[order])[:-1]
    assert np.array_equal(out["cum_before"].to_numpy(), want)
    assert np.array_equal(out["v"].to_numpy(), vals[order])


def test_prefix_sum_sparse_keys_and_single_range(ray_session):
    keys = [5, 1000000, -70, 42]
    vals = [3, 4, 5, 6]
    out = _scan(keys, vals, num_ranges=2)
    # key order: -70, 5, 42, 1000000 -> exclusive sums 0, 5, 8, 14
    assert out["cum_before"].tolist() == [0, 5, 8, 14]
    out1 = _scan(keys, vals, num_ranges=1)
    assert out1["cum_before"].tolist() == [0, 5, 8, 14]


def test_prefix_sum_single_row_and_zero_values(ray_session):
    out = _scan([9], [7])
    assert out["cum_before"].tolist() == [0]
    out = _scan([1, 2, 3], [0, 0, 0])
    assert out["cum_before"].tolist() == [0, 0, 0]


def test_count_tokens_batch():
    t = pa.table({"text": ["a b  c", "", "  ", "single"]})
    out = count_tokens_batch(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 0, 1]


def test_pack_offsets_windows(ray_session):
    # capacity 4: doc0 has 3 tok [0,3), doc1 has 6 tok [3,9), doc2 empty at 9,
    # doc3 has 1 tok [9,10)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": ["a b c", "d e f g h i", "", "z"],
        }
    )
    out = (
        pack_offsets(ray.data.from_arrow(t), 4, num_ranges=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["token_start"].tolist() == [0, 3, 9, 9]
    assert out["first_pack"].tolist() == [0, 0, 2, 2]
    # doc1 spans tokens 3..8 -> packs 0..2; doc2 empty stays at first_pack
    assert out["last_pack"].tolist() == [0, 2, 2, 2]


def test_pack_offsets_parallelism_invariant(ray_session):
    rnd = np.random.default_rng(5)
    texts = [" ".join("w" * 1 for _ in range(int(rnd.integers(0, 30)))) for _ in range(120)]
    t = pa.table(
        {
            "doc_id": pa.array(range(120), type=pa.int64()),
            "text": texts,
        }
    )
    a = (
        pack_offsets(ray.data.from_arrow(t), 16, num_ranges=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_offsets(ray.data.from_arrow(t).repartition(13), 16, num_ranges=9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_sliding_chunks_windows(ray_session):
    from incubator_sedona_ray.text.packing import sliding_chunks

    # doc with 10 tokens, L=4 S=3: starts 0,3,6 (6+4=10 reaches end)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": [" ".join(f"w{i}" for i in range(10)), "a b"],
        }
    )
    out = (
        sliding_chunks(ray.data.from_arrow(t), 4, 3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = out[out["doc_id"] == 0]
    assert d0["chunk"].tolist() == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    assert d0["n_tokens"].tolist() == [4, 4, 4]
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk"].tolist() == ["a b"] and d1["n_tokens"].tolist() == [2]


def test_sliding_equals_disjoint_when_stride_is_len(ray_session):
    from incubator_sedona_ray.text.packing import seq_chunks, sliding_chunks

    t = pa.table(
        {
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": [" ".join("x" * 1 for _ in range(k)) for k in (0, 1, 7, 8, 17)],
        }
    )
    ds = ray.data.from_arrow(t)
    a = seq_chunks(ds, 8).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    b = sliding_chunks(ds, 8, 8).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert a.equals(b)
