"""Exact distributed quantiles, HLL distinct sketch, top-k n-grams."""

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.sketch import (
    grouped_quantiles_exact,
    hll_count_distinct,
    hll_estimate,
    quantiles_exact,
)
from incubator_sedona_ray.sketch.hll import _registers_of
from incubator_sedona_ray.text.ngrams import top_ngrams

pytestmark = pytest.mark.usefixtures("ray_session")

QS = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _duck_disc(sorted_vals: np.ndarray, q: float):
    """DuckDB quantile_disc: value at 1-based rank ceil(q*n)."""
    n = len(sorted_vals)
    r = min(max(int(np.ceil(np.float64(q) * np.float64(n))), 1), n)
    return sorted_vals[r - 1]


def _chunked(df: pd.DataFrame, sz: int = 1500):
    return ray.data.from_pandas([df.iloc[i : i + sz] for i in range(0, len(df), sz)])


def test_quantiles_int_fast_path_exact():
    rng = np.random.default_rng(11)
    vals = rng.integers(-50, 950, size=12_001)
    ds = _chunked(pd.DataFrame({"x": vals}))
    got = quantiles_exact(ds, "x", QS)
    sv = np.sort(vals)
    for q in QS:
        assert got[q] == _duck_disc(sv, q), q


def test_quantiles_float_refine_path_exact():
    rng = np.random.default_rng(12)
    vals = np.concatenate([rng.normal(0, 1, 8000), rng.normal(40, 0.01, 2000)])  # hot bin
    rng.shuffle(vals)
    ds = _chunked(pd.DataFrame({"x": vals}))
    got = quantiles_exact(ds, "x", QS, buckets=32)
    sv = np.sort(vals)
    for q in QS:
        assert got[q] == _duck_disc(sv, q), q


def test_quantiles_non_integer_values_never_take_int_path():
    # min/max are integral but interior values are not: {1.0, 1.5, 2.0}
    vals = np.array([1.0, 1.5, 2.0] * 500)
    ds = _chunked(pd.DataFrame({"x": vals}), sz=400)
    got = quantiles_exact(ds, "x", [0.5])
    assert got[0.5] == _duck_disc(np.sort(vals), 0.5) == 1.5


def test_quantiles_constant_and_empty():
    ds = _chunked(pd.DataFrame({"x": np.full(100, 7.0)}))
    assert quantiles_exact(ds, "x", [0.1, 0.9]) == {0.1: 7.0, 0.9: 7.0}
    empty = ray.data.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="float64")}))
    assert quantiles_exact(empty, "x", [0.5]) == {0.5: None}


def test_quantiles_refine_limit_guard():
    ds = _chunked(pd.DataFrame({"x": np.random.default_rng(0).normal(size=5000)}))
    with pytest.raises(ValueError, match="refine_limit"):
        quantiles_exact(ds, "x", [0.5], buckets=2, refine_limit=10)


def test_grouped_quantiles_match_pandas():
    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {"x": rng.integers(0, 300, size=9000), "g": rng.choice(list("abcd"), size=9000)}
    )
    out = grouped_quantiles_exact(_chunked(df), "x", [0.25, 0.5, 0.9], by="g").to_pandas()
    for g, sub in df.groupby("g"):
        sv = np.sort(sub["x"].to_numpy())
        for q in [0.25, 0.5, 0.9]:
            got = out[(out.g == g) & (out.q == q)]["value"].iloc[0]
            assert got == _duck_disc(sv, q), (g, q)


def test_hll_error_bound_and_determinism():
    rng = np.random.default_rng(14)
    keys = [f"k{v}" for v in rng.integers(0, 20_000, size=60_000)]
    exact = len(set(keys))
    ds = _chunked(pd.DataFrame({"k": keys}), sz=7000)
    est1 = hll_count_distinct(ds, "k", p=12)
    est2 = hll_count_distinct(ds, "k", p=12)
    assert est1 == est2  # sha256-hashed: bit-deterministic
    # 1.04/sqrt(4096) ~= 1.6% sigma; 4 sigma bound with slack
    assert abs(est1 - exact) / exact < 0.065


def test_hll_partial_merge_equals_whole():
    vals = np.array([f"v{i%500}" for i in range(4000)], dtype=object)
    whole = _registers_of(vals, 12)
    merged = np.maximum(_registers_of(vals[:1500], 12), _registers_of(vals[1500:], 12))
    assert np.array_equal(whole, merged)
    assert hll_estimate(whole) == hll_estimate(merged)


def test_hll_small_range_linear_counting():
    vals = np.array([f"only{i}" for i in range(25)], dtype=object)
    est = hll_estimate(_registers_of(vals, 12))
    assert abs(est - 25) < 2  # linear counting is near-exact here


def test_top_ngrams_exact_vs_naive():
    texts = [
        "the quick brown fox jumps",
        "the quick red fox",
        "a  the quick thing",
        "Solo",
        "",
        "the quick brown fox again",
    ] * 50
    ds = ray.data.from_pandas(
        [pd.DataFrame({"text": texts[i : i + 40]}) for i in range(0, len(texts), 40)]
    )
    got = top_ngrams(ds, n=2, k=5).to_pandas()
    # naive reference
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        c.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["ngram"], got["cnt"])) == exp


def test_top_ngrams_trigrams():
    texts = ["a b c d", "a b c", "b c d"] * 30
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = top_ngrams(ds, n=3, k=2).to_pandas()
    assert list(zip(got["ngram"], got["cnt"])) == [("a b c", 60), ("b c d", 60)]


def test_grouped_moments_bit_exact():
    from incubator_sedona_ray.sketch import grouped_moments

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {"x": rng.integers(0, 10_000, size=8000), "g": rng.choice(["p", "q", "r"], size=8000)}
    )
    out = grouped_moments(_chunked(df), "x", by="g").to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        v = sub["x"].to_numpy().astype(np.int64)
        n, s1, s2 = len(v), int(v.sum()), int((v * v).sum())
        row = out.loc[g]
        assert (row["n"], row["s1"], row["s2"]) == (n, s1, s2)
        # the float finalization must be the exact fixed expression
        assert row["mean"] == np.float64(s1) / np.float64(n)
        assert row["var_pop"] == (np.float64(s2) - np.float64(s1) * np.float64(s1) / np.float64(n)) / np.float64(n)


def test_grouped_moments_overflow_guard():
    from incubator_sedona_ray.sketch import grouped_moments

    df = pd.DataFrame({"x": np.full(10, 2**33, dtype=np.int64), "g": ["a"] * 10})
    with pytest.raises(Exception, match="(?i)overflow|too large"):
        grouped_moments(ray.data.from_pandas(df), "x", by="g").to_pandas()


def test_top_collocations_vs_naive():
    from collections import Counter

    from incubator_sedona_ray.text.ngrams import top_collocations

    texts = (
        ["new york city", "new york times", "in new york", "the city that"] * 8
        + ["the the the", "of the city", "a b", "x"] * 6
    )
    ds = ray.data.from_pandas(
        [pd.DataFrame({"text": texts[i : i + 11]}) for i in range(0, len(texts), 11)]
    )
    got = top_collocations(ds, k=4, min_count=3).to_pandas()

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        uni.update(toks)
        bi.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    nu, nb = sum(uni.values()), sum(bi.values())
    scored = [
        (g, c, (np.float64(c) * np.float64(nu) * np.float64(nu)) / (np.float64(uni[g.split()[0]]) * np.float64(uni[g.split()[1]]) * np.float64(nb)))
        for g, c in bi.items()
        if c >= 3
    ]
    exp = sorted(scored, key=lambda x: (-x[2], x[0]))[:4]
    assert list(zip(got["ngram"], got["cnt"], got["lift"])) == exp

    # join path (no driver unigram broadcast): bit-identical to broadcast
    got_j = top_collocations(ds, k=4, min_count=3, mode="join").to_pandas()
    assert list(zip(got_j["ngram"], got_j["cnt"], got_j["lift"])) == exp
    # auto must pick join when the vocabulary exceeds the broadcast cap
    got_a = top_collocations(ds, k=4, min_count=3, broadcast_max_words=1).to_pandas()
    assert list(zip(got_a["ngram"], got_a["cnt"], got_a["lift"])) == exp


def test_hll_grouped_matches_global_per_group():
    from incubator_sedona_ray.sketch import hll_count_distinct, hll_count_distinct_by_group

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "k": [f"v{v}" for v in rng.integers(0, 4000, size=30_000)],
            "g": rng.choice(["en", "fr"], size=30_000),
        }
    )
    got = hll_count_distinct_by_group(_chunked(df, 4000), "k", "g", p=12).to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        solo = hll_count_distinct(ray.data.from_pandas(sub.reset_index(drop=True)), "k", p=12)
        assert got.loc[g, "estimate"] == solo  # identical registers either way
        exact = sub["k"].nunique()
        assert abs(got.loc[g, "estimate"] - exact) / exact < 0.065
