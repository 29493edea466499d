"""Deterministic synthetic corpora (FIXTURES.md F1 pages table)."""

from .synth import synth_pages, write_pages

__all__ = ["synth_pages", "write_pages"]
