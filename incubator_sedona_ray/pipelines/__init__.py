"""End-to-end pipelines (the flagship web-page spatial pipeline + helpers)."""

from .pages import flagship_pipeline, synth_pages_fn  # noqa: F401
