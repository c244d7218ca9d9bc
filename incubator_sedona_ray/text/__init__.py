"""Web-page text stages: deterministic geocoding, language ID, quality
scoring, token counting, fingerprinting, PII redaction, repetition
(Gopher) scores, URL canonicalize+dedup, corpus-fit bigram familiarity
(SURVEY.md §7.0 + training-data pipeline ops)."""

from .decontam import contamination_report, decontaminate, heldout_ngram_hashes  # noqa: F401
from .bm25 import bm25_topk, corpus_stats  # noqa: F401
from .extract import extract_text, extract_text_array, extract_text_batch  # noqa: F401
from .geocode import geocode_batch, geocode_doc_ids, geocode_urls  # noqa: F401
from .lm import familiarity_scores, fit_bigram_model  # noqa: F401
from .packing import chunk_batch, seq_chunks  # noqa: F401
from .redact import redact_pii  # noqa: F401
from .repetition import repetition_scores  # noqa: F401
from .urls import dedup_urls, domain_stats, parse_urls, parse_urls_batch  # noqa: F401
