"""Deterministic hash sampling (dedup/sample.py): fmix32 parity with the
SQL replica, rate behavior, stratification, and determinism."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from incubator_sedona_ray.dedup.sample import (
    fmix32,
    fmix32_sql,
    keep_mask,
    sample_stratified,
    sample_uniform,
)


def test_fmix32_known_avalanche():
    # consecutive ids must scatter: no two adjacent hashes close together
    h = fmix32(np.arange(100, dtype=np.uint64))
    assert len(np.unique(h)) == 100
    assert (h <= 0xFFFFFFFF).all()


def test_fmix32_sql_parity():
    ids = np.arange(0, 20000, dtype=np.int64)
    h_np = fmix32(ids.astype(np.uint64)).astype(np.int64)
    con = duckdb.connect()
    h_sql = (
        con.execute(
            f"SELECT {fmix32_sql('x', seed=7)} AS h FROM (SELECT UNNEST(range(0, 20000)) AS x)"
        )
        .df()["h"]
        .to_numpy()
    )
    h_np7 = fmix32((ids.astype(np.uint64) + np.uint64(7)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
    assert (h_np7 == h_sql).all()
    # seed changes the sample
    assert (h_np != h_np7).any()


def test_keep_rate_close():
    ids = np.arange(0, 100000, dtype=np.int64)
    for rate in (0.1, 0.5, 0.9):
        frac = keep_mask(ids, rate).mean()
        assert abs(frac - rate) < 0.01


def test_rate_zero_and_one():
    ids = np.arange(0, 1000, dtype=np.int64)
    assert keep_mask(ids, 0.0).sum() == 0
    assert keep_mask(ids, 1.0).sum() == 1000


def test_uniform_deterministic(ray_session):
    t = pa.table({"doc_id": np.arange(500, dtype=np.int64)})
    ds = ray.data.from_arrow(t)
    a = sample_uniform(ds, 0.3, seed=1).to_pandas()["doc_id"].to_numpy()
    b = sample_uniform(ds, 0.3, seed=1).to_pandas()["doc_id"].to_numpy()
    assert (np.sort(a) == np.sort(b)).all()


def test_stratified_rates(ray_session):
    n = 4000
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": pa.array(["en" if i % 2 == 0 else "xx" for i in range(n)]),
        }
    )
    ds = ray.data.from_arrow(t)
    out = sample_stratified(ds, {"en": 0.8}, default_rate=0.1).to_pandas()
    en = (out["lang"] == "en").sum() / (n / 2)
    xx = (out["lang"] == "xx").sum() / (n / 2)
    assert abs(en - 0.8) < 0.05 and abs(xx - 0.1) < 0.05


def test_fixed_k_exact_size_and_determinism(ray_session):
    from incubator_sedona_ray.dedup import sample_fixed_k
    from incubator_sedona_ray.dedup.sample import fmix32, _MASK32

    n, k, seed = 5000, 37, 5
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "lang": np.where(ids % 2 == 0, "en", "xx")})
    ds = ray.data.from_pandas([df.iloc[i : i + 700] for i in range(0, n, 700)])
    out = sample_fixed_k(ds, k, seed=seed).to_pandas()
    assert len(out) == k
    # exact expected set: k smallest fmix32 priorities
    h = fmix32((ids.astype(np.uint64) + np.uint64(seed)) & _MASK32)
    exp = set(ids[np.lexsort((ids, h))[:k]])
    assert set(out.doc_id) == exp
    # deterministic across a re-run with different chunking
    ds2 = ray.data.from_pandas([df.iloc[i : i + 1234] for i in range(0, n, 1234)])
    out2 = sample_fixed_k(ds2, k, seed=seed).to_pandas()
    assert set(out2.doc_id) == exp


def test_fixed_k_per_group_sizes(ray_session):
    from incubator_sedona_ray.dedup import sample_fixed_k_per_group

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"doc_id": np.arange(3000), "lang": rng.choice(["en", "fr", "de"], size=3000)}
    )
    # one tiny group, below k
    df.loc[df.index[:4], "lang"] = "tiny"
    df.loc[df.index[4:], "lang"] = rng.choice(["en", "fr", "de"], size=2996)
    ds = ray.data.from_pandas([df.iloc[i : i + 500] for i in range(0, 3000, 500)])
    out = sample_fixed_k_per_group(ds, 10, seed=1).to_pandas()
    sizes = out.groupby("lang").size().to_dict()
    assert sizes["en"] == sizes["fr"] == sizes["de"] == 10
    assert sizes["tiny"] == 4  # min(k, group size)
