"""equi_join_auto: size-adaptive equi-join — broadcast probe vs
safe_hash_join fallback, DuckDB parity on randomized inputs.

Covers: null keys on both sides (never match), duplicate build keys
(inner multiplicity), column-name collisions (right suffix), string
keys, schema parity between the two paths (Ray's join drops the right
key column — the broadcast path must too), and the forced-fallback
threshold."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.state.blocks import equi_join_auto

pytestmark = pytest.mark.usefixtures("ray_session")


def _frames(seed=7, n=5000, m=800):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 500, n).astype("float64")
    lk[rng.random(n) < 0.05] = np.nan
    rk = rng.integers(0, 400, m).astype("float64")
    rk[rng.random(m) < 0.05] = np.nan
    left = pd.DataFrame({"k": pd.array(lk, dtype="Int64"), "lv": np.arange(n)})
    # 'lv' collides with a left column on purpose
    right = pd.DataFrame(
        {
            "rk": pd.array(rk, dtype="Int64"),
            "rv": rng.integers(0, 10, m),
            "lv": rng.integers(0, 3, m),
        }
    )
    return left, right


_SQL = {
    "inner": "SELECT L.k, L.lv, R.rv, R.lv AS lv_r FROM L JOIN R ON L.k = R.rk",
    "left_semi": (
        "SELECT L.k, L.lv FROM L WHERE L.k IN (SELECT rk FROM R WHERE rk IS NOT NULL)"
    ),
    "left_anti": (
        "SELECT L.k, L.lv FROM L WHERE L.k IS NULL "
        "OR L.k NOT IN (SELECT rk FROM R WHERE rk IS NOT NULL)"
    ),
}


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        df[c] = pd.to_numeric(df[c])
    cols = sorted(df.columns)
    return (
        df[cols].sort_values(cols).reset_index(drop=True).astype("float64").fillna(-1)
    )


@pytest.mark.parametrize("join_type", ["inner", "left_semi", "left_anti"])
@pytest.mark.parametrize("threshold", [None, 10])  # None=broadcast, 10=fallback
def test_duckdb_parity(join_type, threshold):
    left, right = _frames()
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(4)
    con = duckdb.connect()
    con.register("L", left)
    con.register("R", right)
    exp = _canon(con.execute(_SQL[join_type]).df())
    out = _canon(
        equi_join_auto(
            lds, rds, join_type, 8, on=("k",), right_on=("rk",),
            threshold_bytes=threshold,
        ).to_pandas()
    )
    assert list(out.columns) == list(exp.columns)  # schema parity across paths
    assert out.shape == exp.shape
    assert (out == exp).all().all()


def test_string_keys_multiplicity():
    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.choice(["a", "b", "c", "d", "e"], 1000), "lv": np.arange(1000)})
    right = pd.DataFrame({"rk": ["a", "a", "b", "zz"], "rv": [1, 2, 3, 4]})
    out = equi_join_auto(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right),
        "inner", 4, on=("k",), right_on=("rk",),
    ).to_pandas()
    con = duckdb.connect()
    con.register("L", left)
    con.register("R", right)
    exp = con.execute("SELECT L.k, L.lv, R.rv FROM L JOIN R ON L.k = R.rk").df()
    assert sorted(map(tuple, out[["k", "lv", "rv"]].values.tolist())) == sorted(
        map(tuple, exp.values.tolist())
    )


def test_empty_right_broadcast():
    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"rk": pd.array([], dtype="Int64"), "rv": pd.array([], dtype="Int64")})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    # empty build drains to None -> safe_hash_join guards take over
    assert equi_join_auto(lds, rds, "left_anti", 4, on=("k",), right_on=("rk",)).count() == 3
    assert equi_join_auto(lds, rds, "left_semi", 4, on=("k",), right_on=("rk",)).count() == 0
    assert equi_join_auto(lds, rds, "inner", 4, on=("k",), right_on=("rk",)).count() == 0


def test_all_null_build_keys_broadcast():
    # non-empty build side whose keys are ALL null: drains under the
    # threshold (so the broadcast path runs), the null filter empties the
    # probe table, and nothing may ever match — no crash, schema intact
    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"rk": pd.array([None, None], dtype="Int64"), "rv": [1, 2]})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    inner = equi_join_auto(lds, rds, "inner", 4, on=("k",), right_on=("rk",))
    assert inner.count() == 0
    assert sorted(inner.schema().names) == ["k", "lv", "rv"]
    assert equi_join_auto(lds, rds, "left_semi", 4, on=("k",), right_on=("rk",)).count() == 0
    assert equi_join_auto(lds, rds, "left_anti", 4, on=("k",), right_on=("rk",)).count() == 3
