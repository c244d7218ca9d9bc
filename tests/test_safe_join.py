"""Regression tests for the Ray 2.49 hash-shuffle join faults worked
around by state/blocks.py (see its module docstring): an empty FIRST
block consumes the one-shot schema broadcast, and fully-empty sides
cannot broadcast a schema at all — both crash Acero with ``ArrowInvalid:
No match ... for key field reference`` whenever a hash partition ends up
empty (3 keys x 16 partitions reproduces it)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.state.blocks import safe_hash_join, scrub_empty_blocks

pytestmark = pytest.mark.usefixtures("ray_session")


def _with_empty_first_block(df, schema_cols):
    """Dataset whose FIRST block is empty (the broadcast-eating shape)."""
    empty = df.iloc[0:0]
    return ray.data.from_pandas([empty, df])


def test_safe_join_sparse_keys_many_partitions():
    l_df = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    r_df = pd.DataFrame({"node": [2, 3, 99], "w": [7, 8, 9]})
    out = safe_hash_join(
        _with_empty_first_block(l_df, ["k", "v"]),
        _with_empty_first_block(r_df, ["node", "w"]),
        "inner",
        16,
        on=("k",),
        right_on=("node",),
    ).to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_safe_join_empty_right_left_anti_returns_left():
    l_df = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    r_df = pd.DataFrame({"node": pd.Series([], dtype="int64")})
    out = safe_hash_join(
        ray.data.from_pandas(l_df),
        ray.data.from_pandas(r_df),
        "left_anti",
        16,
        on=("k",),
        right_on=("node",),
    ).to_pandas()
    assert sorted(out["k"]) == [1, 2, 3]


def test_safe_join_empty_side_inner_is_empty():
    l_df = pd.DataFrame({"k": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")})
    r_df = pd.DataFrame({"k": [1, 2], "w": [7, 8]})
    out = safe_hash_join(
        ray.data.from_pandas(l_df), ray.data.from_pandas(r_df), "inner", 8, on=("k",)
    ).to_pandas()
    assert len(out) == 0


def test_safe_join_empty_left_anti_no_phantom_row():
    """ADVICE r02: a null-padded empty LEFT used to leak ONE all-null row
    through left_anti; empty left now short-circuits to the empty left."""
    l_df = pd.DataFrame({"k": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")})
    r_df = pd.DataFrame({"node": [1, 2], "w": [7, 8]})
    for jt in ("left_anti", "left_semi", "inner"):
        out = safe_hash_join(
            ray.data.from_pandas(l_df), ray.data.from_pandas(r_df), jt, 16,
            on=("k",), right_on=("node",),
        ).to_pandas()
        assert len(out) == 0, jt


def test_safe_join_empty_right_semi_is_empty():
    l_df = pd.DataFrame({"k": [1, 2, 3]})
    r_df = pd.DataFrame({"node": pd.Series([], dtype="int64")})
    out = safe_hash_join(
        ray.data.from_pandas(l_df), ray.data.from_pandas(r_df), "left_semi", 8,
        on=("k",), right_on=("node",),
    ).to_pandas()
    assert len(out) == 0


def test_safe_join_unscrubbed_clean_sides():
    """scrub_left/right=False: non-empty schema-bearing block streams work."""
    l_df = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    r_df = pd.DataFrame({"node": [2, 3], "w": [7, 8]})
    out = safe_hash_join(
        ray.data.from_pandas(l_df), ray.data.from_pandas(r_df), "inner", 4,
        on=("k",), right_on=("node",), scrub_left=False, scrub_right=False,
    ).to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_safe_join_rejects_outer():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError):
        safe_hash_join(ds, ds, "left_outer", 4, on=("k",))


def test_scrub_drops_empty_blocks_keeps_rows():
    df = pd.DataFrame({"x": np.arange(5, dtype=np.int64)})
    ds = ray.data.from_pandas([df.iloc[0:0], df, df.iloc[0:0]])
    out = scrub_empty_blocks(ds)
    tbls = [ray.get(r) for r in out.to_arrow_refs()]
    assert all(t.num_rows > 0 for t in tbls)
    assert out.count() == 5


def test_scrub_all_empty_uses_schema_hint():
    df = pd.DataFrame({"x": pd.Series([], dtype="int64")})
    ds = ray.data.from_pandas(df)
    out = scrub_empty_blocks(ds, schema=pa.schema([("x", pa.int64())]))
    assert out.count() == 0
    assert out.schema().names == ["x"]


def test_minhash_on_join_derived_input_many_cpus_shape():
    """The end-to-end shape that exposed the bug: dedup_exact(keep_cols)
    output (a hash-join result) fed into minhash_dedup. At 4 test CPUs the
    partition count is small, so this is a smoke check; the sparse-key
    crash itself is pinned by test_safe_join_sparse_keys_many_partitions."""
    from incubator_sedona_ray.dedup import dedup_exact, minhash_dedup

    texts = [f"document number {i} with some shared boilerplate text" for i in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    uniq = dedup_exact(ray.data.from_pandas(df), keep_cols=["text"])
    surv, pairs = minhash_dedup(uniq, threshold=0.95)
    assert surv.count() <= 40
    assert surv.count() > 0
