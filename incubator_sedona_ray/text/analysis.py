"""Text analysis stages: language ID, quality scoring, token counting,
fingerprinting. All vectorized batch transforms; the language-ID stage is a
callable CLASS (actor pool) because it compiles patterns / holds stopword
tables once per actor."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

def _utf8_flat(col):
    """(u8, offs) — zero-copy flat byte buffer + int64 row offsets of a
    no-null string column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1].astype(
        np.int64
    )
    u8 = (
        np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    return u8, offs


def _count_per_row(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-row True counts of a flat byte mask: one cumsum + one diff of
    gathered row boundaries (no per-row work, no O(bytes) id array)."""
    c = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
    return c[offs[1:]] - c[offs[:-1]]


def _run_starts(member: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Mask of positions that START a maximal run of member bytes, with
    runs reset at row boundaries (a run never spans rows)."""
    prev = np.empty_like(member)
    prev[0:1] = False
    prev[1:] = member[:-1]
    starts_idx = offs[:-1]
    starts_idx = starts_idx[starts_idx < len(member)]
    prev[starts_idx] = False  # row start: no previous byte
    return member & ~prev


# top-stopword lists per language (public knowledge, heuristic langid)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "im", "für", "auf", "des", "ein", "eine", "nicht"},
    "fr": {"le", "la", "les", "des", "est", "et", "un", "une", "du", "dans", "que", "pour", "qui", "sur", "pas"},
    "es": {"el", "la", "los", "las", "de", "que", "es", "en", "un", "una", "por", "con", "para", "del", "se"},
    "it": {"il", "la", "di", "che", "è", "un", "una", "per", "con", "del", "le", "si", "da", "dei", "non"},
    "pt": {"o", "a", "os", "as", "de", "que", "é", "um", "uma", "para", "com", "do", "da", "em", "não"},
    "nl": {"de", "het", "een", "van", "en", "is", "dat", "op", "te", "zijn", "met", "voor", "niet", "aan", "er"},
}


class LangId:
    """Heuristic n-gram/stopword language classifier (actor-pool stage).

    Scores each language by stopword hit-rate over whitespace tokens; ties /
    no-hits fall back to "en". Deterministic."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.langs = sorted(self.tables)
        # combined vocab packed into uint64 keys (every stopword is <= 8
        # utf-8 bytes, so zero-padded little-endian packing is EXACT byte
        # equality — no hashing, no collisions) + per-language membership
        # matrix, built ONCE per actor
        vocab = sorted({w for ws in self.tables.values() for w in ws})
        enc = [w.encode("utf-8") for w in vocab]
        assert all(len(b) <= 8 for b in enc), "stopword longer than 8 bytes"
        keys = np.array(
            [int.from_bytes(b.ljust(8, b"\0"), "little") for b in enc], dtype=np.uint64
        )
        order = np.argsort(keys)
        self.vocab_keys = keys[order]
        self.memb = np.zeros((len(vocab), len(self.langs)), dtype=np.float64)
        pos = {w: i for i, w in enumerate(vocab)}
        for j, lang in enumerate(self.langs):
            for w in self.tables[lang]:
                self.memb[pos[w], j] = 1.0
        self.memb = self.memb[order]
        self.lang_names = np.array(self.langs)

    def classify(self, text: str) -> str:
        """Single-row reference implementation (kept as the semantic spec
        the vectorized __call__ is tested against)."""
        toks = self.word_re.findall(text.lower())
        if not toks:
            return "und"
        best, best_score = "en", -1.0
        for lang in self.langs:
            tbl = self.tables[lang]
            score = sum(1 for t in toks if t in tbl) / len(toks)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0 else "en"

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized scoring, byte-level (VERDICT r02 #6 — no per-token
        python set lookups, and no RE2 split either): lowercase in arrow,
        then token runs of ``[a-z]`` / ``à-ÿ`` (utf-8 pair C3 A0-BF) are
        found with flat byte masks; tokens <= 8 bytes pack into uint64 and
        stopword membership is one searchsorted against the packed vocab
        (exact equality — longer tokens can never be stopwords); per-row
        per-language scores come from one bincount + one tiny matmul."""
        n = batch.num_rows
        if n == 0:
            return batch.append_column(self.out_col, pa.array([], type=pa.string()))
        lower = pc.utf8_lower(batch[self.text_col])
        u8, offs = _utf8_flat(lower)
        a_z = (u8 >= 0x61) & (u8 <= 0x7A)
        c3 = u8 == 0xC3
        cont = (u8 >= 0xA0) & (u8 <= 0xBF)
        member = a_z
        if c3.any():
            pair = np.zeros(len(u8), dtype=bool)
            pair[:-1] = c3[:-1] & cont[1:]  # first byte of à..ÿ
            member = member | pair
            pair2 = np.zeros(len(u8), dtype=bool)
            pair2[1:] = pair[:-1]  # second byte
            member = member | pair2
        starts_mask = _run_starts(member, offs)
        tok_counts = _count_per_row(starts_mask, offs)
        s_pos = np.flatnonzero(starts_mask)
        V = len(self.vocab_keys)
        preds = np.full(n, "en", dtype=object)
        if len(s_pos):
            # i ends a run iff member[i] and (last byte overall, or the
            # next byte is not a member, or the next byte starts a new row)
            nxt = np.zeros(len(u8), dtype=bool)
            nxt[:-1] = member[1:]
            rs = offs[1:-1]  # interior row starts
            rs = rs[(rs > 0) & (rs < len(u8) + 1)]
            nxt[rs - 1] = False  # next byte belongs to another row
            ends_mask = member & ~nxt
            e_pos = np.flatnonzero(ends_mask)
            lens = e_pos - s_pos + 1
            sel = lens <= 8
            sp, ln = s_pos[sel], lens[sel]
            if len(sp):
                gather = sp[:, None] + np.arange(8, dtype=np.int64)[None, :]
                colmask = np.arange(8)[None, :] < ln[:, None]
                np.minimum(gather, len(u8) - 1, out=gather)
                padded = u8[gather] * colmask
                tok64 = np.ascontiguousarray(padded).view(np.uint64).ravel()
                vpos = np.searchsorted(self.vocab_keys, tok64)
                vpos_c = np.minimum(vpos, V - 1)
                hit = self.vocab_keys[vpos_c] == tok64
                if hit.any():
                    # row of each hit token
                    hrow = np.searchsorted(offs, sp[hit], side="right") - 1
                    cnt = np.bincount(
                        hrow * V + vpos_c[hit], minlength=n * V
                    ).reshape(n, V)
                    scores = cnt.astype(np.float64) @ self.memb
                    ratios = scores / np.maximum(tok_counts, 1)[:, None]
                    best_idx = np.argmax(ratios, axis=1)  # first max == sorted tie rule
                    best_score = ratios[np.arange(n), best_idx]
                    preds = np.where(best_score > 0, self.lang_names[best_idx], "en")
        preds = np.where(tok_counts == 0, "und", preds)
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


def quality_fn(text_col: str = "text"):
    """Append quality-signal columns. Definitions chosen to be mirrorable in
    DuckDB SQL (see matching expressions in __ray_entry__.oracle_sql):

    * n_chars_q  = length(text)
    * n_alpha    = #[A-Za-z]
    * alpha_ratio = n_alpha / max(n_chars, 1)
    * n_digits   = #[0-9]
    * n_spaces   = #' '
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        n_chars = pc.utf8_length(texts)
        # byte-level counting: [A-Za-z], [0-9] and ' ' are pure-ASCII
        # classes (utf-8 continuation bytes are >= 0x80, so byte counts ==
        # char counts exactly); per-row sums are one cumsum + boundary
        # diff over the flat buffer — ~20x the per-row re.findall loops
        u8, offs = _utf8_flat(texts)
        is_alpha = ((u8 >= 0x41) & (u8 <= 0x5A)) | ((u8 >= 0x61) & (u8 <= 0x7A))
        is_digit = (u8 >= 0x30) & (u8 <= 0x39)
        alpha = pa.array(_count_per_row(is_alpha, offs), type=pa.int64())
        # ASCII [0-9] (not unicode isdigit) for DuckDB regexp parity
        digits = pa.array(_count_per_row(is_digit, offs), type=pa.int64())
        spaces = pa.array(_count_per_row(u8 == 0x20, offs), type=pa.int64())
        nc = n_chars.cast(pa.int64())
        ratio = pc.divide(
            alpha.cast(pa.float64()), pc.max_element_wise(nc, pa.scalar(1, type=pa.int64())).cast(pa.float64())
        )
        return (
            batch.append_column("n_chars_q", nc)
            .append_column("n_alpha", alpha)
            .append_column("alpha_ratio", ratio)
            .append_column("n_digits", digits)
            .append_column("n_spaces", spaces)
        )

    return fn


def token_count_fn(text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace tokenization count — equals DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty trimmed
    text, 0 for blank."""

    def fn(batch: pa.Table) -> pa.Table:
        # token count == number of \S+ runs, counted byte-level: run
        # starts over the flat buffer (ASCII whitespace set — python
        # str.split() also splits on unicode ws, but the DuckDB oracle's
        # regexp \s+ is ASCII, and these corpora carry none).
        u8, offs = _utf8_flat(batch[text_col])
        is_ws = (u8 == 0x20) | ((u8 >= 0x09) & (u8 <= 0x0D))
        starts = _run_starts(~is_ws, offs)
        counts = pa.array(_count_per_row(starts, offs), type=pa.int64())
        return batch.append_column(out_col, counts)

    return fn


_BPEISH = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]")


def bpe_ish_token_count(text: str) -> int:
    """GPT-2-style pre-tokenizer shape (letters runs / short digit runs /
    punctuation), a proxy for LLM token counts."""
    return len(_BPEISH.findall(text))


def fingerprint_fn(text_col: str = "text", out_col: str = "fingerprint", window: int = 8):
    """Rolling-hash document fingerprint: min FNV hash over sliding byte
    windows of the normalized text (a 1-perm minhash — stable under small
    edits elsewhere in the doc)."""
    from ..dedup.ngram import _FNV_OFFSET, _FNV_PRIME, _fnv

    def fp(text: str) -> int:
        b = np.frombuffer(" ".join(text.lower().split()).encode(), dtype=np.uint8)
        if len(b) == 0:
            return _fnv(b"")
        # FNV over ALL sliding windows at once (w tiny vector passes),
        # bit-identical to _fnv per window; len<=window -> one full window
        w = min(window, len(b))
        windows = np.lib.stride_tricks.sliding_window_view(b, w)
        h = np.full(windows.shape[0], _FNV_OFFSET, dtype=np.uint64)
        for j in range(w):
            h = (h ^ windows[:, j].astype(np.uint64)) * _FNV_PRIME
        return int(h.min())

    def fn(batch: pa.Table) -> pa.Table:
        vals = np.array([fp(t) for t in batch[text_col].to_pylist()], dtype=np.uint64)
        return batch.append_column(out_col, pa.array(vals.view(np.int64)))

    return fn


SCRIPTS = ("Arabic", "Cyrillic", "Han", "Latin")


def script_mix_fn(text_col: str = "text"):
    """Unicode-script composition per document — the multilingual-corpus
    triage stage (mixed-script spam, mislabeled languages, CJK in a
    'latin' shard). Fully vectorized: one RE2 ``\\p{Script}`` count kernel
    per script over the whole batch (Arrow ``count_substring_regex``), no
    per-row Python. Fractions are codepoint counts / codepoint length, and
    the dominant script breaks ties by (count desc, name asc) — both
    replayable in DuckDB's RE2 regexps for exact oracle parity."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        n = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        denom = np.maximum(n, 1).astype(np.float64)
        counts = np.empty((len(SCRIPTS), len(batch)), dtype=np.int64)
        for i, s in enumerate(SCRIPTS):
            counts[i] = pc.count_substring_regex(
                col, pattern=rf"\p{{{s}}}"
            ).to_numpy(zero_copy_only=False)
        # dominant: count desc, script-name asc (SCRIPTS is sorted)
        dom_idx = np.argmax(counts, axis=0)  # argmax takes the FIRST max
        dom = np.asarray(SCRIPTS, dtype=object)[dom_idx]
        out = batch
        for i, s in enumerate(SCRIPTS):
            out = out.append_column(
                f"frac_{s.lower()}", pa.array(counts[i] / denom, pa.float64())
            )
        return out.append_column("dominant_script", pa.array(dom, pa.string()))

    return fn


def compression_ratio_fn(text_col: str = "text", level: int = 6):
    """Append ``comp_ratio`` = len(zlib(text)) / len(text) in bytes — the
    Gopher-style repetitiveness signal (Rae et al. 2021 filter on
    "documents that compress too well"): boilerplate and template spam
    compress far below prose. Per-row zlib is a C call; the stage is a
    stateless streaming map (actor-pool-able at scale). Deterministic for
    a fixed zlib version/level — pinned by the sf0.01 golden fixture,
    not a SQL oracle (no SQL engine exposes deflate)."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ratios = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            ratios.append(len(zlib.compress(raw, level)) / max(len(raw), 1))
        return batch.append_column("comp_ratio", pa.array(ratios, type=pa.float64()))

    return fn
