"""The ST_ scalar-function catalog as vectorized batch stages (SURVEY.md §2.2)."""

from .st import FUNCTIONS, st_apply  # noqa: F401
