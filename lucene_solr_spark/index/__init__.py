"""Inverted-index construction: invert → stats → salted pack → tables."""

from .builder import IndexBuilder, InvertedIndex  # noqa: F401
