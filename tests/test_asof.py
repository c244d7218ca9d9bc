"""asof_join unit tests (coarse-partition merge_asof plan) — checked
against a pandas per-key reference on random data, plus string keys and
no-match edge cases. The driver `asof_join` oracle covers the DuckDB-ASOF
parity path; these pin the library API directly."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.join.asof import asof_join

pytestmark = pytest.mark.usefixtures("ray_session")


def _reference(l_df, r_df, by, on, right_prefix="r_", direction="backward"):
    out = []
    r_cols = [c for c in r_df.columns if c != by]
    for _, lrow in l_df.iterrows():
        rg = r_df[r_df[by] == lrow[by]]
        if direction == "backward":
            rg = rg[rg[on] <= lrow[on]].sort_values(on)
            match = rg.iloc[-1] if len(rg) else None
        else:
            rg = rg[rg[on] >= lrow[on]].sort_values(on)
            match = rg.iloc[0] if len(rg) else None
        row = dict(lrow)
        for c in r_cols:
            row[right_prefix + c] = match[c] if match is not None else np.nan
        out.append(row)
    return pd.DataFrame(out)


def _canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_asof_matches_pandas_reference_int_keys():
    rng = np.random.default_rng(7)
    l_df = pd.DataFrame(
        {
            "uid": rng.integers(0, 20, 300),
            "ts": rng.integers(0, 1000, 300),
            "lv": np.arange(300),
        }
    )
    r_df = pd.DataFrame(
        {
            "uid": rng.integers(0, 20, 100),
            "ts": rng.integers(0, 1000, 100),
            "rv": np.arange(100) * 10,
        }
    )
    # unique (uid, ts) on the right so the reference pick is deterministic
    r_df = r_df.drop_duplicates(["uid", "ts"]).reset_index(drop=True)
    got = asof_join(
        ray.data.from_pandas(l_df), ray.data.from_pandas(r_df), by="uid", on="ts"
    ).to_pandas()
    want = _reference(l_df, r_df, "uid", "ts")
    got, want = _canon(got), _canon(want[got.columns.tolist()] if set(got.columns) == set(want.columns) else want)
    assert len(got) == len(want)
    for c in ("uid", "ts", "lv"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()
    ga = got["r_rv"].to_numpy(dtype=float)
    wa = want["r_rv"].to_numpy(dtype=float)
    assert np.allclose(ga, wa, equal_nan=True)


def test_asof_string_keys_and_forward():
    l_df = pd.DataFrame({"k": ["a", "a", "b", "c"], "ts": [5, 9, 7, 1], "lv": [1, 2, 3, 4]})
    r_df = pd.DataFrame({"k": ["a", "b"], "ts": [6, 8], "rv": [100, 200]})
    got = asof_join(
        ray.data.from_pandas(l_df),
        ray.data.from_pandas(r_df),
        by="k",
        on="ts",
        direction="forward",
    ).to_pandas()
    got = got.sort_values(["k", "ts"]).reset_index(drop=True)
    # a@5 -> r@6; a@9 -> none; b@7 -> r@8; c@1 -> none (no right key)
    assert got.loc[0, "r_rv"] == 100
    assert np.isnan(got.loc[1, "r_rv"])
    assert got.loc[2, "r_rv"] == 200
    assert np.isnan(got.loc[3, "r_rv"])


def test_asof_empty_right_side():
    l_df = pd.DataFrame({"k": [1, 2], "ts": [5, 7], "lv": [1, 2]})
    r_df = pd.DataFrame({"k": pd.Series([], dtype="int64"), "ts": pd.Series([], dtype="int64"), "rv": pd.Series([], dtype="int64")})
    got = asof_join(
        ray.data.from_pandas(l_df), ray.data.from_pandas(r_df), by="k", on="ts"
    ).to_pandas()
    assert len(got) == 2
    assert got["r_rv"].isna().all()
