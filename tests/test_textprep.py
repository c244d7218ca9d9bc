"""Tests for the training-data text-prep operators added in round 3:
PII redaction, Gopher-style repetition scores, corpus-level paragraph
dedup, and URL canonicalize + keep-latest dedup."""

import numpy as np
import pyarrow as pa
import pytest

from incubator_sedona_ray.dedup.paragraph import (
    chunk_into_lines_fn,
    dedup_paragraphs,
    explode_paragraphs_fn,
)
from incubator_sedona_ray.text.redact import oracle_redact_sql, redact_batch
from incubator_sedona_ray.text.repetition import repetition_batch
from incubator_sedona_ray.text.urls import canonicalize_batch, dedup_urls


# ---------------------------------------------------------------- redaction


def test_redact_rules_and_counts():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a.b+c@x.co.uk and 192.168.0.1 now",
                "call +1 555 0001234 or (303) 555-9999",
                "clean",
            ],
        }
    )
    out = redact_batch(t)
    assert out["text"].to_pylist() == [
        "mail <EMAIL> and <IP> now",
        "call <PHONE> or (<PHONE>",
        "clean",
    ]
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_ip"].to_pylist() == [1, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 2, 0]


def test_redact_order_ip_before_phone():
    # the dotted quad must become <IP>, not be half-eaten by the phone rule
    t = pa.table({"text": ["ip 10.20.30.40 phone 5551234567"]})
    out = redact_batch(t, counts=False)
    assert out["text"].to_pylist() == ["ip <IP> phone <PHONE>"]


def test_redact_out_col_and_empty():
    t = pa.table({"text": pa.array([], type=pa.string())})
    out = redact_batch(t, out_col="clean_text")
    assert out.num_rows == 0 and "clean_text" in out.column_names


def test_redact_sql_parity():
    duckdb = pytest.importorskip("duckdb")
    texts = [
        "a@b.io 1.2.3.4.5 +44 20 7946 0958",
        "x.y@z.museum, 255.255.255.255!",
        "nothing",
    ]
    con = duckdb.connect()
    sql = con.execute(
        f"SELECT {oracle_redact_sql('t')} FROM (SELECT unnest(?) AS t)", [texts]
    ).fetchall()
    got = redact_batch(pa.table({"text": texts}), counts=False)["text"].to_pylist()
    assert got == [r[0] for r in sql]


# --------------------------------------------------------------- repetition


def test_repetition_hand_case():
    t = pa.table({"text": ["a b a b c", "x", "", "y y y y"]})
    out = repetition_batch(t)
    assert out["n_words"].to_pylist() == [5, 1, 0, 4]
    # "a b a b c": 3 distinct of 5; top word "a"/"b" x2; 2-grams
    # (ab, ba, ab, bc) -> 3 distinct of 4
    assert out["dup_word_frac"].to_pylist() == pytest.approx([1 - 3 / 5, 0.0, 0.0, 1 - 1 / 4])
    assert out["top_word_frac"].to_pylist() == pytest.approx([2 / 5, 1.0, 0.0, 1.0])
    assert out["dup_2gram_frac"].to_pylist() == pytest.approx([1 - 3 / 4, 0.0, 0.0, 1 - 1 / 3])


def test_repetition_case_fold_and_whitespace():
    t = pa.table({"text": ["The THE the", "  a   b  "]})
    out = repetition_batch(t)
    assert out["n_words"].to_pylist() == [3, 2]
    assert out["dup_word_frac"].to_pylist() == pytest.approx([2 / 3, 0.0])


def test_repetition_empty_batch():
    out = repetition_batch(pa.table({"text": pa.array([], type=pa.string())}))
    assert out.num_rows == 0
    assert set(out.column_names) >= {"n_words", "dup_word_frac", "top_word_frac", "dup_2gram_frac"}


# ---------------------------------------------------------- paragraph dedup


def test_chunk_into_lines():
    t = pa.table({"text": ["one two three four five", "  spaced   out  ", ""]})
    out = chunk_into_lines_fn(2)(t)
    assert out["text"].to_pylist() == ["one two\nthree four\nfive", "spaced out", ""]


def test_explode_paragraphs_packed():
    t = pa.table({"doc_id": [7], "text": ["p0\np1\n\np3"]})
    out = explode_paragraphs_fn()(t)
    assert out["para"].to_pylist() == ["p0", "p1", "p3"]  # empty para dropped
    assert out["packed"].to_pylist() == [(7 << 20) | 0, (7 << 20) | 1, (7 << 20) | 3]


def test_explode_rejects_out_of_range_ids():
    t = pa.table({"doc_id": [1 << 43], "text": ["x"]})
    with pytest.raises(ValueError, match="packable"):
        explode_paragraphs_fn()(t)


def test_dedup_paragraphs_end_to_end(ray_session):
    import ray

    rows = {
        "doc_id": [1, 2, 3],
        "text": ["A\nB\nC", "B\nD", "A\nB"],  # doc 3 loses everything
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = dedup_paragraphs(ds, num_parts=4).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]
    assert out["text"].tolist() == ["A\nB\nC", "D"]


def test_dedup_paragraphs_within_doc(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"doc_id": [5], "text": ["X\nX\nY"]}))
    out = dedup_paragraphs(ds, num_parts=2).to_pandas()
    assert out["text"].tolist() == ["X\nY"]  # second X removed, order kept


# -------------------------------------------------------------- familiarity


def test_familiarity_hand_case(ray_session):
    import ray

    from incubator_sedona_ray.text.lm import familiarity_scores

    # bigrams: d1 {a b, b c}, d2 {a b, b d}, d3 {x}, d4 {}
    # corpus counts: "a b"=2 (kept), others singletons (pruned)
    t = pa.table({"doc_id": [1, 2, 3, 4], "text": ["a b c", "a b d", "x", ""]})
    out = (
        familiarity_scores(ray.data.from_arrow(t), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_bigrams"].tolist() == [2, 2, 0, 0]
    assert out["familiarity"].tolist() == pytest.approx([1.0, 1.0, 0.0, 0.0])


def test_familiarity_external_model(ray_session):
    import ray

    from incubator_sedona_ray.text.lm import familiarity_scores, fit_bigram_model

    corpus = ray.data.from_arrow(pa.table({"text": ["p q", "p q", "p q r"]}))
    model = fit_bigram_model(corpus, min_count=2)  # {"p q": 3}
    target = ray.data.from_arrow(pa.table({"doc_id": [9], "text": ["p q z"]}))
    out = familiarity_scores(target, model=model).to_pandas()
    # bigrams {p q (c=3), q z (unseen)} -> (3 + 0) / 2
    assert out["familiarity"].tolist() == pytest.approx([1.5])


# ------------------------------------------------------------------ urls


def test_canonicalize_cases():
    urls = [
        "https://A.B/p/1?q=2#f",
        "HTTP://HOST/Path/",
        "https://a.b/p/1",
        "relative/path/",
    ]
    out = canonicalize_batch(pa.table({"url": urls}))["canon_url"].to_pylist()
    assert out == ["https://a.b/p/1", "http://host/Path", "https://a.b/p/1", "relative/path"]


def test_dedup_urls_keep_latest_and_tiebreak(ray_session):
    import ray

    ts = np.array(
        ["2024-01-01T00:00:00", "2024-01-02T00:00:00", "2024-01-02T00:00:00"],
        dtype="datetime64[us]",
    )
    t = pa.table(
        {
            "url": ["https://a.b/x", "https://A.B/x?t=1", "https://a.b/x/"],
            "warc_ts": pa.array(ts),
            "payload": ["old", "q", "slash"],
        }
    )
    out = dedup_urls(ray.data.from_arrow(t), num_parts=3).to_pandas()
    assert len(out) == 1
    # both variants share the max ts; ascending raw url breaks the tie
    # ("https://A.B/x?t=1" < "https://a.b/x/" because "A" < "a")
    assert out["payload"].tolist() == ["q"]
    assert out["canon_url"].tolist() == ["https://a.b/x"]


def test_dedup_urls_distinct_survive(ray_session):
    import ray

    t = pa.table(
        {
            "url": ["https://a.b/1", "https://a.b/2"],
            "warc_ts": pa.array(np.array(["2024-01-01", "2024-01-01"], dtype="datetime64[us]")),
        }
    )
    out = dedup_urls(ray.data.from_arrow(t), num_parts=2).to_pandas()
    assert sorted(out["url"]) == ["https://a.b/1", "https://a.b/2"]


def test_script_mix_counts_and_dominant(ray_session):
    from incubator_sedona_ray.text.analysis import SCRIPTS, script_mix_fn

    texts = [
        "Hello world",
        "Привет мир",
        "你好世界 ok",
        "مرحبا بالعالم",
        "mixed Привет hello",
        "",
        "12345 !!!",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = script_mix_fn()(t).to_pandas()

    # hand-computed rows (codepoint counts / codepoint length)
    r0 = out.iloc[0]
    assert r0["frac_latin"] == 10 / 11 and r0["dominant_script"] == "Latin"
    r1 = out.iloc[1]
    assert r1["frac_cyrillic"] == 9 / 10 and r1["dominant_script"] == "Cyrillic"
    r2 = out.iloc[2]
    assert r2["frac_han"] == 4 / 7 and r2["dominant_script"] == "Han"
    r3 = out.iloc[3]
    assert r3["dominant_script"] == "Arabic"
    # empty + no-script rows: all fractions 0, tie broken alphabetically
    assert out.iloc[5]["dominant_script"] == "Arabic"
    assert out.iloc[6]["dominant_script"] == "Arabic"
    assert set(f"frac_{s.lower()}" for s in SCRIPTS) <= set(out.columns)
