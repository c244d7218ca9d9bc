"""PII redaction: vectorized regex scrubbing of emails / IPv4 addresses /
phone numbers from a text column, with per-type match counts.

Training-data pipelines redact PII before anything else touches the text
(C4 and Gopher both describe a scrub pass); at 100 TB the stage must be a
pure per-batch Arrow kernel — `pc.replace_substring_regex` runs RE2 over
the flat utf-8 buffer with zero Python per row. DuckDB's `regexp_replace`
is also RE2, so the oracle applies the *identical* pattern strings and the
outputs are byte-equal (verified in tests/test_redact.py).

Order matters and is part of the contract: emails first (so the digits in
an email never half-match the phone pattern), then IPv4 (so dotted quads
are not eaten by the phone pattern), then phones over the residue.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Patterns are RE2 (no lookarounds, no backrefs) so Arrow and DuckDB agree.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d() \-]{6,}\d"

# (name, pattern, replacement) in application order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_batch(
    batch: pa.Table, text_col: str = "text", out_col: str | None = None, counts: bool = True
) -> pa.Table:
    """One Arrow batch in, same batch with the text scrubbed (and, when
    ``counts``, one int64 ``n_<type>`` column per rule counting the matches
    that were replaced). ``out_col=None`` redacts in place."""
    col = batch[text_col]
    redacted = col
    count_cols: dict[str, pa.Array] = {}
    for name, pat, rep in PII_RULES:
        if counts:
            count_cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(redacted, pattern=pat), pa.int64()
            )
        redacted = pc.replace_substring_regex(redacted, pattern=pat, replacement=rep)
    if out_col is None or out_col == text_col:
        batch = batch.set_column(batch.schema.get_field_index(text_col), text_col, redacted)
    else:
        batch = batch.append_column(out_col, redacted)
    for cname, arr in count_cols.items():
        batch = batch.append_column(cname, arr)
    return batch


def redact_pii(ds, text_col: str = "text", out_col: str | None = None, counts: bool = True):
    """Dataset -> Dataset with PII scrubbed from ``text_col``. Stateless
    vectorized stage: plain ``map_batches`` over zero-copy Arrow batches —
    no shuffle, no actor state, streams at any scale."""

    def fn(batch: pa.Table) -> pa.Table:
        return redact_batch(batch, text_col=text_col, out_col=out_col, counts=counts)

    return ds.map_batches(fn, batch_format="pyarrow")


def oracle_redact_sql(expr: str) -> str:
    """The DuckDB expression equivalent to the redaction chain applied to
    SQL expression ``expr`` — the same RE2 patterns in the same order, so
    outputs are byte-identical to :func:`redact_batch`."""
    out = expr
    for _, pat, rep in PII_RULES:
        # DuckDB single-quoted literals are standard SQL: backslashes pass
        # through verbatim, so the RE2 pattern needs only quote doubling.
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    return out
