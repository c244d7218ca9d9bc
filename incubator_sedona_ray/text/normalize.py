"""Unicode text normalization — the corpus-hygiene stage every web-text
pipeline runs before hashing/dedup/tokenization (C4/CCNet-style cleanup):
strip C0/DEL control characters (keeping \\t \\n \\r), then canonical-
compose to NFC so visually identical strings hash identically.

Scale shape: the control strip is one RE2 ``replace_substring_regex`` per
batch. True NFC needs canonical COMPOSITION, which Arrow's
``utf8_normalize`` does not perform (pyarrow's kernel leaves ``e +
U+0301`` as two codepoints — verified divergence from DuckDB/CPython
NFC), so composition runs through ``unicodedata.normalize`` ONLY on rows
containing a non-ASCII byte (one vectorized mask; ASCII rows — the bulk
of a lang-filtered web corpus — never leave Arrow). Same masked-fallback
pattern as the numeric-entity path in :mod:`.extract`.

The SQL oracle runs DuckDB's ``regexp_replace`` + ``nfc_normalize`` with
the same pattern and order (control chars are NFC-invariant; the order is
fixed purely for the mirrored contract).

Reference scope note: Sedona has no text stages; this operator comes from
the north rule's Common-Crawl input shape.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# C0 controls except \t \n \r, plus DEL — RE2-safe class shared with the oracle
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_NON_ASCII_RE = r"[^\x00-\x7F]"


def normalize_batch(
    t: pa.Table,
    *,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
) -> pa.Table:
    """Append ``out_col`` (stripped + normalized) and ``changed`` (bool)."""
    s = pc.replace_substring_regex(t[text_col], pattern=CONTROL_RE, replacement="")
    s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    mask = pc.match_substring_regex(s, _NON_ASCII_RE)
    mask_np = mask.to_numpy(zero_copy_only=False)
    mask_np = np.asarray(mask_np, dtype=object) == True  # noqa: E712 — nulls -> False
    if mask_np.any():
        # patch ONLY the non-ASCII rows: gather them, normalize, splice
        # back with replace_with_mask — ASCII rows never leave Arrow
        idx = np.flatnonzero(mask_np)
        fixed = pa.array(
            [
                unicodedata.normalize(form, v)
                for v in s.take(pa.array(idx, type=pa.int64())).to_pylist()
            ],
            type=pa.string(),
        )
        s = pc.replace_with_mask(s, pa.array(mask_np, type=pa.bool_()), fixed)
    changed = pc.invert(pc.equal(s, t[text_col]))
    if out_col == text_col:  # in-place replacement
        t = t.set_column(t.column_names.index(text_col), text_col, s)
    else:
        t = t.append_column(out_col, s)
    return t.append_column("changed", changed)


def normalize_text(ds, *, text_col: str = "text", out_col: str = "text_norm", form: str = "NFC"):
    """Streaming map — Dataset with ``out_col`` + ``changed`` appended."""
    return ds.map_batches(
        lambda t: normalize_batch(t, text_col=text_col, out_col=out_col, form=form),
        batch_format="pyarrow",
    )
