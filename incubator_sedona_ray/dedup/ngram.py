"""Character/word shingling + exact n-gram Jaccard — the verification
kernel shared by the MinHash pipeline and usable standalone for
small-candidate-set dedup."""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fmix64(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 64-bit finalizer — the repo's second deterministic hash
    stream on top of fnv_strings (sketch/bloom.py double hashing,
    sketch/cms.py row indices). One definition so the streams can never
    silently diverge."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def char_shingles_arr(text: str, k: int = 5) -> np.ndarray:
    """Unique k-char shingle hashes as a sorted uint64 array — the FNV-1a
    fold runs vectorized over ALL windows at once (k tiny passes over a
    sliding-window view) instead of a Python byte loop per window;
    bit-identical to :func:`_fnv` per window."""
    b = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(b, min(k, len(b)))
    h = np.full(windows.shape[0], _FNV_OFFSET, dtype=np.uint64)
    for j in range(windows.shape[1]):
        h = (h ^ windows[:, j].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


def jaccard_arr(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two unique-hash arrays (see :func:`char_shingles_arr`)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def char_shingles(text: str, k: int = 5) -> set[int]:
    """k-char shingle hash set (FNV-1a over byte windows, lowercased)."""
    return set(char_shingles_arr(text, k).tolist())


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


def fnv_strings(arr: "pa.Array") -> np.ndarray:
    """FNV-1a of every string in an Arrow StringArray, straight from the
    offsets/data buffers — no Python string materialization. Bit-identical
    to :func:`_fnv` of each utf-8 string."""
    import pyarrow as pa

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    offs = offs.astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    starts = offs[:-1]
    lens = offs[1:] - offs[:-1]
    m = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if m == 0:
        return h
    mat = np.zeros((n, m), dtype=np.uint8)
    row = np.repeat(np.arange(n), lens)
    col = np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
    mat[row, col] = data[np.repeat(starts, lens) + col]
    for j in range(m):
        active = lens > j
        h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_PRIME
    return h


def fnv_fold(word_hashes: np.ndarray, starts: np.ndarray, n: int) -> np.ndarray:
    """n-gram hash = FNV-style fold of n consecutive per-word hashes
    beginning at each ``starts`` index. Word boundaries are explicit in the
    fold, so it separates 'ab c' from 'a bc' like joined-string hashing
    would; n vectorized passes, no per-gram loop."""
    h = np.full(len(starts), _FNV_OFFSET, dtype=np.uint64)
    for j in range(n):
        h = (h ^ word_hashes[starts + j]) * _FNV_PRIME
    return h


def fnv_tokens(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a of many byte strings at once: rows padded to the longest
    token, folded with a per-column active mask — bit-identical to
    :func:`_fnv` per token, no Python byte loop."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    m = int(lens.max()) if lens.max() > 0 else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if m == 0:
        return h
    mat = np.zeros((n, m), dtype=np.uint8)
    buf = np.frombuffer(b"".join(tokens), dtype=np.uint8)
    row = np.repeat(np.arange(n), lens)
    col = np.arange(len(buf)) - np.repeat(np.cumsum(lens) - lens, lens)
    mat[row, col] = buf
    for j in range(m):
        active = lens > j
        h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_PRIME
    return h
