"""Web-page text stages: deterministic geocoding, language ID, quality
scoring, token counting, fingerprinting (SURVEY.md §7.0 + training-data
pipeline ops)."""

from .geocode import geocode_batch, geocode_doc_ids, geocode_urls  # noqa: F401
