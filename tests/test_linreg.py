"""Tests for exact distributed OLS (ml/linreg.py): sufficient statistics
vs numpy, Cramer solve vs lstsq, overflow guard, p!=2 path."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.ml.linreg import (
    CRAMER3,
    cramer3_sql,
    linear_fit_exact,
    suffstats_int,
)


def _ds(x, y, parts=4):
    cols = {f"x{i + 1}": pa.array(x[:, i], type=pa.int64()) for i in range(x.shape[1])}
    cols["y"] = pa.array(y, type=pa.int64())
    return ray.data.from_arrow(pa.table(cols)).repartition(parts)


def test_suffstats_match_numpy(ray_session):
    rnd = np.random.default_rng(4)
    x = rnd.integers(0, 100, size=(200, 2)).astype(np.int64)
    y = rnd.integers(0, 1000, size=200).astype(np.int64)
    s = suffstats_int(_ds(x, y), ["x1", "x2"], "y")
    assert s["n"] == 200
    assert s["sx1"] == x[:, 0].sum() and s["sx2"] == x[:, 1].sum()
    assert s["s11"] == (x[:, 0] ** 2).sum()
    assert s["s12"] == (x[:, 0] * x[:, 1]).sum()
    assert s["s1y"] == (x[:, 0] * y).sum() and s["s2y"] == (x[:, 1] * y).sum()
    assert s["syy"] == (y * y).sum()


def test_fit_matches_lstsq(ray_session):
    rnd = np.random.default_rng(8)
    x = rnd.integers(0, 50, size=(300, 2)).astype(np.int64)
    y = (3 + 2 * x[:, 0] - x[:, 1] + rnd.integers(-2, 3, size=300)).astype(np.int64)
    out = linear_fit_exact(_ds(x, y), ["x1", "x2"], "y")
    A = np.c_[np.ones(300), x.astype(np.float64)]
    want, *_ = np.linalg.lstsq(A, y.astype(np.float64), rcond=None)
    assert out["feature"].tolist() == ["intercept", "x1", "x2"]
    assert np.allclose(out["beta"].to_numpy(), want, rtol=1e-9)


def test_fit_exact_recovery_no_noise(ray_session):
    x = np.array([[i, (i * 3) % 7] for i in range(60)], dtype=np.int64)
    y = 5 + 4 * x[:, 0] + 9 * x[:, 1]
    out = linear_fit_exact(_ds(x, y), ["x1", "x2"], "y")
    assert np.allclose(out["beta"].to_numpy(), [5, 4, 9], atol=1e-8)


def test_fit_three_features_solve_path(ray_session):
    rnd = np.random.default_rng(1)
    x = rnd.integers(0, 20, size=(150, 3)).astype(np.int64)
    y = (1 + x[:, 0] + 2 * x[:, 1] + 3 * x[:, 2]).astype(np.int64)
    out = linear_fit_exact(_ds(x, y), ["x1", "x2", "x3"], "y")
    assert np.allclose(out["beta"].to_numpy(), [1, 1, 2, 3], atol=1e-7)


def test_singular_raises(ray_session):
    x = np.array([[i, 2 * i] for i in range(40)], dtype=np.int64)  # collinear
    y = x[:, 0].copy()
    with pytest.raises(ValueError, match="singular"):
        linear_fit_exact(_ds(x, y), ["x1", "x2"], "y")


def test_cramer_sql_renders_all_vars():
    c = cramer3_sql(n="s.n", sx1="s.sx1")
    assert "s.n*" in c["det"] and "s.sx1*" in c["det"]
    # the default render reproduces the python expressions verbatim
    assert cramer3_sql() == CRAMER3


def test_overflow_guard(ray_session):
    x = np.full((4, 2), 2**31, dtype=np.int64)
    y = np.full(4, 2**31, dtype=np.int64)
    with pytest.raises(Exception, match="int64|overflow|Overflow"):
        suffstats_int(_ds(x, y, parts=1), ["x1", "x2"], "y")
