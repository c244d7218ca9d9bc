"""Character/word shingling + exact n-gram Jaccard — the verification
kernel shared by the MinHash pipeline and usable standalone for
small-candidate-set dedup."""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def char_shingles(text: str, k: int = 5) -> set[int]:
    """k-char shingle hash set (FNV-1a over byte windows, lowercased)."""
    b = text.lower().encode("utf-8", "ignore")
    if len(b) < k:
        return {_fnv(b)} if b else set()
    return {_fnv(b[i : i + k]) for i in range(len(b) - k + 1)}


def word_shingles(text: str, n: int = 3) -> set[int]:
    words = text.lower().split()
    if len(words) < n:
        return {_fnv(" ".join(words).encode())} if words else set()
    return {_fnv(" ".join(words[i : i + n]).encode()) for i in range(len(words) - n + 1)}


def _fnv(b: bytes) -> int:
    h = 14695981039346656037
    for byte in b:
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5, mode: str = "char") -> float:
    sh = char_shingles if mode == "char" else word_shingles
    return jaccard(sh(text_a, k), sh(text_b, k))
