"""Smoke tests for the CorpusDataset facade — delegation only, each
underlying operator has its own deep tests."""

import pyarrow as pa
import ray

from incubator_sedona_ray.corpus_dataset import CorpusDataset


def _docs():
    rows = [
        (0, "en", "the quick brown fox jumps over the lazy dog " * 3),
        (1, "en", "the quick brown fox jumps over the lazy dog " * 3),  # dup of 0
        (2, "de", "ein zwei drei vier fünf sechs sieben acht"),
        (3, "en", "tiny"),
        (4, "fr", "un deux trois quatre cinq six sept huit neuf dix"),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "lang": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }
        )
    )


def test_chain_normalize_dedup_pack(ray_session):
    c = CorpusDataset(_docs())
    out = c.normalize().dedup_exact()
    ids = sorted(out.ds.to_pandas()["doc_id"])
    assert ids == [0, 2, 3, 4]  # doc 1 deduped away
    packed = out.pack(8).to_pandas().sort_values("doc_id")
    assert packed["token_start"].iloc[0] == 0
    assert (packed["n_tokens"] > 0).all()


def test_quality_signals_and_filter(ray_session):
    c = CorpusDataset(_docs()).quality_signals()
    assert "alpha_ratio" in c.ds.schema().names
    kept = c.token_counts().filter_batches(
        lambda t: t["n_tokens"].to_numpy(zero_copy_only=False) >= 8
    )
    assert sorted(kept.ds.to_pandas()["doc_id"]) == [0, 1, 2, 4]


def test_token_counts_mixture_and_bpe(ray_session):
    c = CorpusDataset(_docs())
    counted = c.token_counts()
    assert "n_tokens" in counted.ds.schema().names
    mixed = counted.sample_mixture(seed=3)
    assert set(mixed.ds.to_pandas().columns) >= {"doc_id", "lang"}
    merges = c.bpe_train(3)
    assert len(merges) == 3
    enc = c.bpe_encode(merges).to_pandas()
    assert len(enc) == 5 and (enc["n_bpe_tokens"] > 0).all()


def test_dup_spans_terminal(ray_session):
    rep = CorpusDataset(_docs()).dup_spans(n=3).to_pandas()
    assert set(rep["doc_id"]) == {0, 1}  # only the exact-dup pair shares spans
    assert (rep["dup_frac"] == 1.0).all()


def test_facade_new_methods(ray_session):
    pages = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "url": ["https://a.com/", "https://b.com/"],
            "html": [
                b"<title>A</title><a href=\"https://b.com/\">to b</a>",
                b"<title>B</title>",
            ],
            "text": ["one two three four five six", "repeat repeat repeat repeat"],
        }
    )
    c = CorpusDataset(ray.data.from_arrow(pages))
    t = c.titles()
    assert t.ds.to_pandas()["title"].tolist() == ["A", "B"]
    a = c.anchors().to_pandas()
    assert a["dst_url"].tolist() == ["https://b.com/"] and a["n_links"].tolist() == [1]
    w = c.sliding(3, 2).to_pandas().sort_values(["doc_id", "chunk_id"])
    # 6 tokens, L=3 S=2 -> starts 0,2,4 (the last window reaches the end)
    assert w[w["doc_id"] == 0]["chunk_id"].tolist() == [0, 1, 2]
    r = c.compression_ratio().ds.to_pandas()
    assert r["comp_ratio"].iloc[1] < r["comp_ratio"].iloc[0]  # repetition compresses better
