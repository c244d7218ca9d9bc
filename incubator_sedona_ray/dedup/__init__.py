"""Deduplication operators for training-data pipelines (driver brief:
first-class components alongside the spatial engine).

* :mod:`.exact`   — content-hash exact dedup (hash-partition + per-group min)
* :mod:`.minhash` — MinHash + LSH banding near-dup (shingle -> minhash ->
  band groupby -> verified Jaccard -> connected components)
* :mod:`.simhash` — 64-bit SimHash with banded candidate generation
* :mod:`.ngram`   — n-gram Jaccard verification kernel
* :mod:`.ssjoin`  — EXACT n-gram-Jaccard all-pairs via prefix filtering
  (PPJoin/Vernica-style; the deterministic alternative to MinHash)
* :mod:`.embed`   — embedding-cosine near-dup
* :mod:`.paragraph` — corpus-level exact paragraph dedup (keep-first,
  rebuild docs from survivors; Lee et al. 2021 at paragraph granularity)
"""

from .exact import add_text_hash_fn, dedup_exact, dedup_incremental  # noqa: F401
from .paragraph import dedup_paragraphs, explode_paragraphs_fn  # noqa: F401
from .minhash import minhash_dedup  # noqa: F401
from .phash import ImageDHash, dhash64, dhash_dedup  # noqa: F401
from .simhash import fingerprint_dedup, simhash_batch_fn, simhash_dedup  # noqa: F401
from .embed import embedding_dedup, embedding_dedup_survivors  # noqa: F401
from .sample import (  # noqa: F401
    fmix32,
    keep_mask,
    sample_fixed_k,
    sample_fixed_k_per_group,
    sample_stratified,
    sample_uniform,
)
from .ssjoin import jaccard_self_join  # noqa: F401
from .spans import dup_span_report  # noqa: F401
