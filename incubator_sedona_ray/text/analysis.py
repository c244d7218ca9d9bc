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

    def classify(self, text: str) -> str:
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
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
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
        alpha = pa.array(
            [len(re.findall(r"[A-Za-z]", t)) for t in texts.to_pylist()], type=pa.int64()
        )
        # ASCII [0-9] (not unicode isdigit) for DuckDB regexp parity
        digits = pa.array([len(re.findall(r"[0-9]", t)) for t in texts.to_pylist()], type=pa.int64())
        spaces = pa.array([t.count(" ") for t in texts.to_pylist()], type=pa.int64())
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
        counts = pa.array(
            [len(t.split()) for t in batch[text_col].to_pylist()], type=pa.int64()
        )
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
    from ..dedup.ngram import _fnv

    def fp(text: str) -> int:
        b = " ".join(text.lower().split()).encode()
        if len(b) <= window:
            return _fnv(b)
        return min(_fnv(b[i : i + window]) for i in range(0, len(b) - window + 1))

    def fn(batch: pa.Table) -> pa.Table:
        vals = np.array([fp(t) for t in batch[text_col].to_pylist()], dtype=np.uint64)
        return batch.append_column(out_col, pa.array(vals.view(np.int64)))

    return fn
