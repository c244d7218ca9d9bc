"""Checkpoint / resume / metrics (SURVEY.md §4 'Checkpoint / resume' row)."""

from .manifest import checkpointed_write, read_manifest  # noqa: F401
from .metrics import JoinMetrics  # noqa: F401
