"""Blocklist / multi-pattern term filtering — the URL-and-content
blocklist pass every web-corpus pipeline runs (UT1/adult lists, spam
phrases, boilerplate markers).

Two-stage shape so the per-term work never touches the whole corpus:

1. **any-hit prefilter** — ONE RE2 alternation of all (escaped) terms over
   the lowercased text (`pyarrow.compute.match_substring_regex`, a single
   vectorized automaton sweep per batch; RE2's alternation is a lazy DFA,
   i.e. Aho-Corasick-class linear scanning, not per-term re-scans). Clean
   rows — the overwhelming majority at any real blocklist hit-rate — exit
   here with zero further work.
2. **per-term count** — only flagged rows get the per-term membership
   probes that produce the distinct-terms-matched count.

Matching contract (kept deliberately SQL-reproducible): case-insensitive
SUBSTRING containment — `instr(lower(text), term) > 0` — no word
boundaries. Terms are lowercased on entry.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["blocklist_flags", "blocklist_clean"]


def _alternation(terms: list[str]) -> str:
    return "|".join(re.escape(t) for t in terms)


def blocklist_flags(ds, terms: list[str], *, id_col: str = "doc_id", text_col: str = "text"):
    """Rows containing >= 1 blocked term, as (id_col, n_blocked) with
    n_blocked = number of DISTINCT terms present."""
    terms = sorted({t.lower() for t in terms if t})
    if not terms:
        raise ValueError("empty blocklist")
    pat = _alternation(terms)

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], batch.schema.field(id_col).type),
             "n_blocked": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        low = pc.utf8_lower(batch[text_col])
        hit = pc.match_substring_regex(low, pat)
        flagged = batch.filter(hit)
        if flagged.num_rows == 0:
            return empty
        low_f = pc.utf8_lower(flagged[text_col])
        n = np.zeros(flagged.num_rows, dtype=np.int64)
        for t in terms:
            n += pc.match_substring(low_f, t).to_numpy(zero_copy_only=False)
        return pa.table({id_col: flagged[id_col], "n_blocked": pa.array(n)})

    return ds.map_batches(fn, batch_format="pyarrow")


def blocklist_clean(ds, terms: list[str], *, text_col: str = "text"):
    """The complementary filter: rows containing NO blocked term, schema
    unchanged — one alternation sweep, zero shuffles."""
    terms = sorted({t.lower() for t in terms if t})
    if not terms:
        raise ValueError("empty blocklist")
    pat = _alternation(terms)

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hit = pc.match_substring_regex(pc.utf8_lower(batch[text_col]), pat)
        return batch.filter(pc.invert(hit))

    return ds.map_batches(fn, batch_format="pyarrow")
