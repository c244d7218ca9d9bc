"""HTML -> text extraction over the ``html:binary`` page column.

The input-table contract (BASELINE.json input_hint) carries raw page bytes
in ``html:binary`` next to the reference-extracted ``text:string``; the
north-star invariant is *byte-identical extracted text per url*. This stage
re-derives ``text`` from ``html`` as a pure per-batch Arrow kernel chain so
the invariant is checkable end-to-end (``html_extract`` query: every row's
extraction must equal the ``text`` column byte-for-byte).

Scale shape: everything hot is RE2 over the flat utf-8 buffer via
``pyarrow.compute`` (decode, head/script/style/comment removal, tag strip,
named-entity decode, optional whitespace normalization) — zero Python per
row. The single non-vectorizable piece, numeric character references
(``&#NNN;`` / ``&#xHH;``), takes a per-row fallback that runs ONLY on rows
that contain one (mask via ``count_substring_regex`` first); on corpora
without them the stage never leaves Arrow.

Extraction order matters and is part of the contract:

1. drop ``<head>…</head>`` wholesale (title/meta/link are chrome, not text)
2. drop ``<script>…</script>`` / ``<style>…</style>`` bodies and comments
3. ``mode="text"`` only: block-level tags become ``\n``
4. strip every remaining tag
5. decode entities LAST — ``&lt;script&gt;`` must decode to the literal
   text ``<script>`` *after* tag stripping so it can never be re-parsed
   as markup (the classic double-decode injection bug)
6. ``mode="text"`` only: collapse runs of spaces/newlines

``mode="strip"`` (default) performs 1-2-4-5 only and is exact: for any
document whose body is plain text wrapped in removable chrome, the output
is byte-identical to the original text.

Reference scope note: the Sedona reference has no HTML stage (it is a
spatial engine); this operator comes from the north rule's Common-Crawl
input shape, with C4/trafilatura-style semantics.
"""

from __future__ import annotations

import html as _html

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns (no lookaround/backrefs) shared with tests.
HEAD_RE = r"(?is)<head[\s>].*?</head\s*>"
SCRIPT_RE = r"(?is)<script[\s>].*?</script\s*>"
STYLE_RE = r"(?is)<style[\s>].*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|br|hr|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody|"
    r"h[1-6]|section|article|aside|header|footer|nav|main|form|fieldset|"
    r"blockquote|pre|figure|figcaption|address)(?:\s[^>]*)?/?\s*>"
)
ANY_TAG_RE = r"(?s)</?[A-Za-z!][^>]*>"
NUMERIC_ENTITY_RE = r"&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};"

# Named entities decoded vectorized, in order; &amp; MUST come last so
# "&amp;lt;" decodes to the literal "&lt;" and no further. Rows routed
# through the numeric-entity fallback decode the FULL HTML5 named table
# (html.unescape); the vectorized path covers these common seven — both
# agree on every entity in this tuple.
NAMED_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", "\xa0"),  # U+00A0, matching html.unescape on the fallback path
    ("&amp;", "&"),
)


def _decode_utf8(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    typ = col.type if not isinstance(col, pa.ChunkedArray) else col.type
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pc.cast(col, pa.large_string() if pa.types.is_large_binary(typ) else pa.string())
    return col


def extract_text_array(
    col: pa.ChunkedArray | pa.Array, *, mode: str = "strip"
) -> pa.ChunkedArray | pa.Array:
    """The kernel: html (binary or string) column -> extracted-text column.

    ``mode="strip"``: remove head/script/style/comments/tags, decode
    entities — whitespace is preserved exactly (the byte-identity mode).
    ``mode="text"``: additionally turn block tags into newlines and
    normalize whitespace (C4-style display text).
    """
    if mode not in ("strip", "text"):
        raise ValueError(f"mode must be 'strip' or 'text', got {mode!r}")
    s = _decode_utf8(col)
    for pat in (COMMENT_RE, HEAD_RE, SCRIPT_RE, STYLE_RE):
        s = pc.replace_substring_regex(s, pattern=pat, replacement="")
    if mode == "text":
        s = pc.replace_substring_regex(s, pattern=BLOCK_TAG_RE, replacement="\n")
    s = pc.replace_substring_regex(s, pattern=ANY_TAG_RE, replacement="")
    # entity decode: named entities via the vectorized chain; numeric
    # character references take a per-row html.unescape fallback ONLY on
    # the rows that contain one (each row decodes through exactly one
    # path, so "&amp;lt;" can never double-decode)
    n_numeric = pc.count_substring_regex(s, pattern=NUMERIC_ENTITY_RE)
    named = s
    for ent, rep in NAMED_ENTITIES:
        named = pc.replace_substring(named, pattern=ent, replacement=rep)
    if (pc.sum(n_numeric).as_py() or 0) > 0:
        mask = pc.greater(n_numeric, 0)
        py = s.to_pylist()
        m = mask.to_pylist()
        decoded = pa.array(
            [_html.unescape(v) if (f and v is not None) else None for v, f in zip(py, m)],
            type=pa.string(),
        )
        s = pc.if_else(mask, decoded, pc.cast(named, pa.string()))
    else:
        s = named
    if mode == "text":
        s = pc.replace_substring_regex(s, pattern=r"[ \t\r\f\v]+", replacement=" ")
        s = pc.replace_substring_regex(s, pattern=r" ?\n ?", replacement="\n")
        s = pc.replace_substring_regex(s, pattern=r"\n{2,}", replacement="\n")
        s = pc.utf8_trim_whitespace(s)
    return s


TITLE_RE = r"(?is)<title[^>]*>(?P<t>.*?)</title\s*>"


def extract_title_batch(
    batch: pa.Table, *, html_col: str = "html", out_col: str = "title"
) -> pa.Table:
    """Append the first ``<title>`` body (entity-decoded, whitespace
    collapsed+trimmed) — the WAT-style page-metadata harvest. One RE2
    ``extract_regex`` per batch; pages without a title get ''. Mirrors the
    SQL oracle's ``regexp_extract(html, ..., 1)`` + trim chain."""
    s = _decode_utf8(batch[html_col])
    s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    m = pc.extract_regex(s, TITLE_RE)
    t = pc.if_else(pc.is_valid(m), m.field("t"), pa.scalar("", type=pa.string()))
    t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    for ent, rep in NAMED_ENTITIES:  # vectorized, &amp; last (see table note)
        t = pc.replace_substring(t, pattern=ent, replacement=rep)
    return batch.append_column(out_col, t)


def extract_titles(ds, *, html_col: str = "html", out_col: str = "title"):
    """Streaming map — Dataset with ``out_col`` appended. Zero shuffles."""
    return ds.map_batches(
        lambda b: extract_title_batch(b, html_col=html_col, out_col=out_col),
        batch_format="pyarrow",
    )


def extract_text_batch(
    batch: pa.Table,
    html_col: str = "html",
    out_col: str = "extracted_text",
    *,
    mode: str = "strip",
) -> pa.Table:
    """One Arrow batch in, batch + ``out_col`` (utf-8 extraction)."""
    out = extract_text_array(batch[html_col], mode=mode)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    if out_col in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(out_col), out_col, out)
    return batch.append_column(out_col, out)


def extract_text(ds, html_col: str = "html", out_col: str = "extracted_text", *, mode: str = "strip"):
    """Dataset -> Dataset with ``out_col`` extracted from ``html_col``.

    Stateless vectorized stage — plain ``map_batches`` over zero-copy Arrow
    batches; the streaming executor pipelines it with the read."""
    return ds.map_batches(
        lambda b: extract_text_batch(b, html_col, out_col, mode=mode),
        batch_format="pyarrow",
    )
