"""Deterministic hash sampling (dedup/sample.py): fmix32 parity with the
SQL replica, rate behavior, stratification, and determinism."""

import duckdb
import numpy as np
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
