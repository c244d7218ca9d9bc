"""Tests for Unicode normalization (text/normalize.py)."""

import unicodedata

import pyarrow as pa
import ray

from incubator_sedona_ray.text.normalize import normalize_batch, normalize_text


def test_control_strip_and_compose():
    t = pa.table(
        {
            "text": [
                "plain ascii",
                "tab\tand\nnewline kept",
                "ctrl\x01here\x7f",
                "café decomposed",
                "\x0bcombined ctrl + café",
            ]
        }
    )
    out = normalize_batch(t)
    got = out["text_norm"].to_pylist()
    assert got[0] == "plain ascii"
    assert got[1] == "tab\tand\nnewline kept"
    assert got[2] == "ctrlhere"
    assert got[3] == "café decomposed" == unicodedata.normalize("NFC", t["text"][3].as_py())
    assert got[4] == "combined ctrl + café"
    assert out["changed"].to_pylist() == [False, False, True, True, True]


def test_already_nfc_non_ascii_unchanged():
    t = pa.table({"text": ["café composed", "日本語テキスト"]})
    out = normalize_batch(t)
    assert out["text_norm"].to_pylist() == t["text"].to_pylist()
    assert out["changed"].to_pylist() == [False, False]


def test_normalize_dataset(ray_session):
    rows = ["a\x01b", "é"] * 20
    ds = ray.data.from_arrow(pa.table({"text": rows})).repartition(4)
    out = normalize_text(ds).to_pandas()
    assert sorted(out["text_norm"].unique()) == ["ab", "é"]
    assert out["changed"].all()
