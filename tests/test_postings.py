"""Inverted-index build + bucket-pruned term lookup (text/index.py)."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray

from incubator_sedona_ray.text.index import build_inverted_index, term_postings, token_bucket

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus():
    texts = [
        "the quick brown fox",
        "the the lazy dog",
        "quick quick quick",
        "fox and dog and fox",
    ] * 25
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


def test_build_and_pruned_lookup(tmp_path):
    df = _corpus()
    ds = ray.data.from_pandas([df.iloc[i : i + 30] for i in range(0, len(df), 30)])
    path = str(tmp_path / "idx")
    buckets = build_inverted_index(ds, path, n_buckets=16)
    assert sum(buckets.values()) > 0

    out, scanned, total = term_postings(path, ["quick", "dog"])
    got = out.to_pandas().sort_values(["token", "doc_id"]).reset_index(drop=True)
    assert scanned <= len({int(b) for b in token_bucket(np.array(["quick", "dog"], dtype=object), 16)})
    assert scanned < total

    # exact tf reference
    exp = []
    for _, r in df.iterrows():
        toks = r["text"].lower().split()
        for t in ("dog", "quick"):
            c = toks.count(t)
            if c:
                exp.append((t, r["doc_id"], c))
    exp = pd.DataFrame(exp, columns=["token", "doc_id", "tf"]).sort_values(["token", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"tf": "int64"}), exp.astype({"tf": "int64"}))


def test_rebuild_skips_done_buckets(tmp_path):
    df = _corpus()
    ds = ray.data.from_pandas(df)
    path = str(tmp_path / "idx2")
    b1 = build_inverted_index(ds, path, n_buckets=8)
    man1 = json.load(open(os.path.join(path, "_postings_manifest.json")))
    mtimes = {
        d: os.path.getmtime(os.path.join(path, d, "part-0.parquet"))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    b2 = build_inverted_index(ds, path, n_buckets=8)  # resume: all done
    assert b1 == b2
    man2 = json.load(open(os.path.join(path, "_postings_manifest.json")))
    assert man1 == man2
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(path, d, "part-0.parquet")) == m  # untouched


def test_missing_term_and_empty_lookup(tmp_path):
    ds = ray.data.from_pandas(_corpus())
    path = str(tmp_path / "idx3")
    build_inverted_index(ds, path, n_buckets=8)
    out, scanned, total = term_postings(path, ["zzz_not_present"])
    assert out.to_pandas().shape[0] == 0
