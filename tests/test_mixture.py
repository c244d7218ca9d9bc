"""Tests for training-mixture rebalancing (dedup/sample.py mixture_rates)."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.dedup.sample import keep_mask, mixture_rates, sample_stratified


def _corpus(per_lang_tokens):
    rows_id, rows_lang, rows_text = [], [], []
    i = 0
    for lang, sizes in per_lang_tokens.items():
        for n in sizes:
            rows_id.append(i)
            rows_lang.append(lang)
            rows_text.append(" ".join(["w"] * n))
            i += 1
    return pa.table({"doc_id": pa.array(rows_id, type=pa.int64()), "lang": rows_lang, "text": rows_text})


def test_mixture_rates_equal_share(ray_session):
    from incubator_sedona_ray.text.packing import count_tokens_batch

    t = _corpus({"en": [100] * 8, "de": [50] * 2, "fr": [10]})
    counted = ray.data.from_arrow(t).map_batches(count_tokens_batch, batch_format="pyarrow")
    rates = mixture_rates(counted, strata_col="lang", tokens_col="n_tokens")
    total = 800 + 100 + 10
    target = total * 1 // (4 * 3)
    assert rates["en"] == target / 800.0
    assert rates["de"] == min(1.0, target / 100.0)
    assert rates["fr"] == 1.0  # capped: tiny lang is fully kept
    # end-to-end: the sampled corpus respects the per-lang rates exactly
    out = sample_stratified(counted, rates, strata_col="lang", seed=11).to_pandas()
    for lang, n_docs, rate in (("en", 8, rates["en"]), ("de", 2, rates["de"]), ("fr", 1, 1.0)):
        ids = np.array([i for i, l in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()) if l == lang])
        want = ids[keep_mask(ids, np.full(len(ids), rate), seed=11)]
        got = sorted(out[out["lang"] == lang]["doc_id"])
        assert got == sorted(want.tolist())


def test_mixture_rates_empty_and_zero_token_stratum(ray_session):
    from incubator_sedona_ray.text.packing import count_tokens_batch

    t = _corpus({"en": [40, 40], "xx": [0]})  # xx has zero tokens
    counted = ray.data.from_arrow(t).map_batches(count_tokens_batch, batch_format="pyarrow")
    rates = mixture_rates(counted, strata_col="lang", tokens_col="n_tokens")
    assert "xx" not in rates  # zero-token stratum contributes nothing
    assert set(rates) == {"en"}
