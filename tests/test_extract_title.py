"""Tests for <title> extraction (text/extract.py extract_titles)."""

import pyarrow as pa
import ray

from incubator_sedona_ray.text.extract import extract_title_batch, extract_titles


def test_title_basic_entities_whitespace():
    t = pa.table(
        {
            "html": [
                b"<html><head><title>Hello</title></head></html>",
                b"<html><head><title>  A &amp; B\n\tC </title></head></html>",
                b"<html><head><TITLE lang='en'>Upper</TITLE></html>",
                b"<html><body>no title</body></html>",
                b"<title>first</title><title>second</title>",
                "<title>café &lt;tag&gt;</title>".encode(),
            ]
        }
    )
    got = extract_title_batch(t)["title"].to_pylist()
    assert got == ["Hello", "A & B C", "Upper", "", "first", "café <tag>"]


def test_title_dataset(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "html": [f"<title>t{i}</title>".encode() for i in range(6)],
        }
    )
    out = extract_titles(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["title"].tolist() == [f"t{i}" for i in range(6)]
