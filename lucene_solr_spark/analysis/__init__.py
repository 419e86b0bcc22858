"""StandardAnalyzer-equivalent analysis chain as vectorized functions."""

from .analyzer import StandardAnalyzer, analyze_series, ENGLISH_STOP_WORDS  # noqa: F401
