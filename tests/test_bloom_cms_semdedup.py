"""Bloom anti-join, Count-Min exact heavy hitters, SemDeDup, blocklist."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.dedup.semdedup import semdedup
from incubator_sedona_ray.sketch.bloom import BloomFilter, bloom_anti_join, bloom_from_dataset
from incubator_sedona_ray.sketch.cms import CountMinSketch, cms_from_pairs, heavy_hitters_exact
from incubator_sedona_ray.text.blocklist import blocklist_clean, blocklist_flags

pytestmark = pytest.mark.usefixtures("ray_session")


def _chunked(df: pd.DataFrame, sz: int):
    return ray.data.from_pandas([df.iloc[i : i + sz] for i in range(0, len(df), sz)])


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_low_fpr():
    vals = np.array([f"key-{i}" for i in range(2000)], dtype=object)
    bf = BloomFilter.build(vals, num_bits=1 << 15, num_hashes=7)
    assert bf.contains(vals).all()  # no false negatives, ever
    other = np.array([f"other-{i}" for i in range(20000)], dtype=object)
    assert bf.contains(other).mean() < 0.02


def test_bloom_distributed_build_matches_local():
    df = pd.DataFrame({"k": [f"key-{i % 700}" for i in range(3000)]})
    dist = bloom_from_dataset(_chunked(df, 311), "k", num_bits=1 << 14, num_hashes=5)
    local = BloomFilter.build(
        np.unique(df["k"].to_numpy()), num_bits=1 << 14, num_hashes=5
    )
    # mergeable-by-OR determinism: any batch split -> bit-identical bitmap
    assert dist.to_bytes() == local.to_bytes()


def test_bloom_anti_join_exact():
    ds = _chunked(pd.DataFrame({"k": [f"k{i}" for i in range(1200)], "v": range(1200)}), 173)
    seen = _chunked(pd.DataFrame({"k": [f"k{i}" for i in range(0, 1200, 2)]}), 97)
    out = bloom_anti_join(ds, seen, col="k", num_bits=1 << 12).to_pandas()
    # tiny bitmap -> plenty of false positives, the verify join must scrub all
    assert sorted(out["v"]) == list(range(1, 1200, 2))


def test_bloom_anti_join_distinct_key_names():
    ds = _chunked(pd.DataFrame({"url": ["a", "b", "c", "d"], "v": [1, 2, 3, 4]}), 2)
    seen = _chunked(pd.DataFrame({"seen_url": ["b", "d", "zz"]}), 2)
    out = bloom_anti_join(ds, seen, col="url", seen_col="seen_url", num_bits=1 << 10)
    assert sorted(out.to_pandas()["v"]) == [1, 3]


# ---------------------------------------------------------------- cms

def test_cms_never_underestimates_and_merges():
    rng = np.random.default_rng(7)
    keys = rng.choice([f"w{i}" for i in range(500)], size=20000, p=None)
    df = pd.DataFrame({"ngram": keys, "cnt": np.ones(len(keys), dtype=np.int64)})
    cms = cms_from_pairs(_chunked(df, 1234), "ngram", "cnt", depth=4, width=1 << 12)
    truth = df.groupby("ngram")["cnt"].sum()
    est = cms.estimate(pa.array(truth.index.to_numpy(dtype=object), pa.string()))
    assert (est >= truth.to_numpy()).all()
    # split-invariance: different chunking -> identical matrix
    cms2 = cms_from_pairs(_chunked(df, 333), "ngram", "cnt", depth=4, width=1 << 12)
    assert np.array_equal(cms.mat, cms2.mat)


def test_heavy_hitters_exact_matches_bruteforce():
    texts = []
    for i in range(400):
        words = [f"rare{i}"]
        if i % 2 == 0:
            words += ["hot", "hot"]
        if i % 5 == 0:
            words += ["warm"]
        texts.append(" ".join(words))
    ds = _chunked(pd.DataFrame({"text": texts}), 57)
    # tiny width forces CMS collisions -> candidate superset; exact pass scrubs
    out = heavy_hitters_exact(ds, threshold=80, n=1, width=1 << 8).to_pandas()
    got = dict(zip(out["ngram"], out["cnt"]))
    assert got == {"hot": 400, "warm": 80}


# ---------------------------------------------------------------- semdedup

def test_semdedup_drops_planted_duplicates_only():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(120, 16))
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float32).tolist()} for i in range(120)]
    # planted dups: scaled copies of ids 0..29 at higher ids
    rows += [
        {"vec_id": 1000 + i, "embedding": (3.0 * base[i]).astype(np.float32).tolist()}
        for i in range(30)
    ]
    ds = ray.data.from_items(rows)
    out = semdedup(ds, id_col="vec_id", vec_col="embedding", k=4, tau=0.95).to_pandas()
    assert sorted(out["vec_id"]) == list(range(120))
    # dup shares its source's cluster by scale invariance
    cl = dict(zip(out["vec_id"], out["cluster"]))
    assert set(cl.values()) <= set(range(4))


def test_semdedup_split_invariant():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(300),
            "embedding": [rng.normal(size=8).astype(np.float32).tolist() for _ in range(300)],
        }
    )
    a = semdedup(_chunked(df, 41), k=5, tau=0.9).to_pandas().sort_values("vec_id")
    b = semdedup(_chunked(df, 150), k=5, tau=0.9).to_pandas().sort_values("vec_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


# ---------------------------------------------------------------- blocklist

def test_blocklist_flags_and_clean_partition_corpus():
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "The Spark engine"},
            {"doc_id": 1, "text": "clean row"},
            {"doc_id": 2, "text": "spark and WINDOW and spark"},
            {"doc_id": 3, "text": "a slow merge indeed"},
        ]
    )
    terms = ["spark", "window", "slow merge"]
    fl = blocklist_flags(docs, terms).to_pandas().sort_values("doc_id")
    assert dict(zip(fl["doc_id"], fl["n_blocked"])) == {0: 1, 2: 2, 3: 1}
    cl = blocklist_clean(docs, terms).to_pandas()
    assert list(cl["doc_id"]) == [1]


# ---------------------------------------------------------------- tfidf

def test_hashed_tfidf_exact_and_split_invariant():
    import hashlib

    from incubator_sedona_ray.text.tfidf import hashed_tfidf

    def bucket(t, dim=1 << 18):
        return int(hashlib.sha256(t.encode()).hexdigest()[:15], 16) % dim

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a a b", "B c", "   "],
        }
    )
    out = hashed_tfidf(_chunked(docs, 2), dim=1 << 18, scale=10**6).to_pandas()
    got = {(r.doc_id, r.bucket): r.weight for r in out.itertuples()}
    # N=3; df: a=1 b=2 c=1 -> idf a=3e6, b=1.5e6, c=3e6 (integer floor)
    assert got == {
        (0, bucket("a")): 2 * 3_000_000,
        (0, bucket("b")): 1_500_000,
        (1, bucket("b")): 1_500_000,
        (1, bucket("c")): 3_000_000,
    }
    out2 = hashed_tfidf(_chunked(docs, 1), dim=1 << 18, scale=10**6).to_pandas()
    a = out.sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    assert a.equals(b)


def test_semdedup_equal_ids_never_prune_each_other():
    v = np.ones(8, dtype=np.float32).tolist()
    rows = [
        {"vec_id": 5, "embedding": v},
        {"vec_id": 5, "embedding": v},     # same id, identical vector
        {"vec_id": 9, "embedding": v},     # strictly higher id -> pruned
    ]
    out = semdedup(ray.data.from_items(rows), k=1, tau=0.9).to_pandas()
    assert sorted(out["vec_id"]) == [5, 5]


def test_semdedup_empty_input():
    ds = ray.data.from_items([{"vec_id": 1, "embedding": [1.0, 0.0]}]).filter(
        lambda r: False
    )
    res = semdedup(ds, k=2, tau=0.9)
    assert res.count() == 0
    assert sorted(res.schema().names) == ["cluster", "vec_id"]
