"""HTML -> text extraction (text/extract.py): strip/text modes, entity
handling, the numeric-reference fallback path, and the north-star
byte-identity invariant over the synthesized page table."""

import pyarrow as pa
import pytest

from incubator_sedona_ray.text.extract import (
    extract_text,
    extract_text_array,
    extract_text_batch,
)


def _one(html: str, mode: str = "strip") -> str:
    out = extract_text_array(pa.array([html]), mode=mode)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out[0].as_py()


class TestStripMode:
    def test_plain_wrapper(self):
        assert _one("<html><body>hello world</body></html>") == "hello world"

    def test_head_dropped_wholesale(self):
        assert (
            _one("<html><head><title>My Title</title><meta charset='x'></head><body>t</body></html>")
            == "t"
        )

    def test_script_and_style_bodies_dropped(self):
        h = "<body><script>var x = '<p>not text</p>';</script>a<style>p{color:red}</style>b</body>"
        assert _one(h) == "ab"

    def test_script_with_attrs_and_case(self):
        assert _one("<BODY><SCRIPT type='text/js'>x<y</SCRIPT>ok</BODY>") == "ok"

    def test_comments_dropped_even_with_tags_inside(self):
        assert _one("a<!-- <script>hidden</script> -->b") == "ab"

    def test_multiline_script(self):
        assert _one("<script>\nline1\nline2\n</script>text") == "text"

    def test_whitespace_preserved_exactly(self):
        assert _one("<body>a  b\n\n c\t</body>") == "a  b\n\n c\t"

    def test_self_closing_and_attr_tags(self):
        assert _one('x<br/>y<img src="a.png" alt="z">w') == "xyw"

    def test_named_entities(self):
        assert _one("1 &lt; 2 &amp;&amp; 3 &gt; 2 &quot;q&quot; &apos;a&apos;&nbsp;!") == (
            "1 < 2 && 3 > 2 \"q\" 'a'\xa0!"
        )

    def test_double_encoded_amp_decodes_once(self):
        # &amp;lt; is the LITERAL text "&lt;" — must not double-decode to "<"
        assert _one("&amp;lt;script&amp;gt;") == "&lt;script&gt;"

    def test_entity_decode_after_tag_strip(self):
        # &lt;script&gt; decodes to literal "<script>" and must survive as text
        assert _one("say &lt;script&gt; aloud") == "say <script> aloud"

    def test_numeric_entities_fallback(self):
        assert _one("A&#66;C &#x44; &#8364;") == "ABC D €"

    def test_numeric_fallback_only_on_matching_rows(self):
        arr = pa.array(["plain &lt;x&gt;", "num &#65;"])
        out = extract_text_array(arr)
        vals = out.to_pylist() if not isinstance(out, pa.ChunkedArray) else out.combine_chunks().to_pylist()
        assert vals == ["plain <x>", "num A"]

    def test_binary_input(self):
        out = extract_text_array(pa.array([b"<b>bytes</b>"], type=pa.binary()))
        got = out[0].as_py() if not isinstance(out, pa.ChunkedArray) else out.combine_chunks()[0].as_py()
        assert got == "bytes"

    def test_null_row_passthrough(self):
        arr = pa.array([None, "<i>x</i>"], type=pa.string())
        out = extract_text_array(arr)
        vals = out.to_pylist() if not isinstance(out, pa.ChunkedArray) else out.combine_chunks().to_pylist()
        assert vals == [None, "x"]

    def test_null_row_with_numeric_fallback_in_batch(self):
        arr = pa.array([None, "n &#65;"], type=pa.string())
        out = extract_text_array(arr)
        vals = out.to_pylist() if not isinstance(out, pa.ChunkedArray) else out.combine_chunks().to_pylist()
        assert vals == [None, "n A"]


class TestTextMode:
    def test_block_tags_become_newlines(self):
        assert _one("<p>one</p><p>two</p>", mode="text") == "one\ntwo"

    def test_whitespace_collapsed(self):
        assert _one("<div>a   b</div>\n\n\n<div>c</div>", mode="text") == "a b\nc"

    def test_br_and_li(self):
        assert _one("x<br>y<ul><li>i1</li><li>i2</li></ul>", mode="text") == "x\ny\ni1\ni2"

    def test_inline_tags_no_newline(self):
        assert _one("<p>a <b>bold</b> c</p>", mode="text") == "a bold c"

    def test_trimmed(self):
        assert _one("<p> padded </p>", mode="text") == "padded"


class TestBatchAndDataset:
    def test_batch_appends_column(self):
        t = pa.table({"html": pa.array([b"<body>x</body>"], type=pa.binary()), "k": [1]})
        out = extract_text_batch(t)
        assert out.column_names == ["html", "k", "extracted_text"]
        assert out["extracted_text"][0].as_py() == "x"

    def test_mode_validation(self):
        with pytest.raises(ValueError):
            extract_text_array(pa.array(["x"]), mode="nope")

    def test_north_star_byte_identity(self, ray_session):
        """synth_pages_fn chrome -> strip-mode extraction == text, byte-for-byte."""
        import ray

        from incubator_sedona_ray.pipelines.pages import synth_pages_fn

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        )
        pages = docs.map_batches(synth_pages_fn, batch_format="pyarrow")
        out = extract_text(pages, html_col="html", out_col="extracted_text").to_pandas()
        assert len(out) > 0
        assert (out["extracted_text"] == out["text"]).all()
        # bytes, not just str equality
        assert all(
            e.encode() == t.encode() for e, t in zip(out["extracted_text"], out["text"])
        )
