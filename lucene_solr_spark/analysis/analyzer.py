"""StandardAnalyzer-equivalent pipeline: tokenize → lowercase → stop filter.

Mirrors `analysis/standard/StandardAnalyzer.java:81-90`:
  StandardTokenizer → LowerCaseFilter → StopFilter(stopwords)
with these reference defaults:
  - StandardAnalyzer's default stop set is EMPTY (`StandardAnalyzer.java:51-53`)
  - the canonical English set (33 words, `en/EnglishAnalyzer.java:43-54`)
    is what the benchmark/index pipeline uses, opt-in, as in EnglishAnalyzer
  - maxTokenLength = 255, over-long tokens skipped with position advance
  - StopFilter preserves position gaps (`FilteringTokenFilter.java:47-57`)

The Spark entrypoint is a vectorized pandas function (used from
`pandas_udf` / `mapInPandas`) — no per-row Python at the DataFrame layer.
"""

from __future__ import annotations

from functools import lru_cache
from dataclasses import dataclass, field

import pandas as pd

from .en import get_stemmer, possessive_strip
from .lowercase import simple_lowercase
from .tokenizer import DEFAULT_MAX_TOKEN_LENGTH, tokenize_raw

# en/EnglishAnalyzer.java:43-54 — frozen canonical list
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


@lru_cache(maxsize=64)
def _override_map(pairs: tuple) -> dict:
    return dict(pairs)


@dataclass(frozen=True)
class StandardAnalyzer:
    """tokenize → simple-lowercase → [possessive] → stop → [stem],
    with position gaps.

    ``possessive=True`` adds EnglishPossessiveFilter
    (`en/EnglishPossessiveFilter.java:47-55`); ``stemmer`` adds a final
    stem step — ``"minimal"`` (`en/EnglishMinimalStemmer.java:29`) or
    ``"porter"`` (`en/PorterStemmer.java`).  The reference EnglishAnalyzer
    chain (`en/EnglishAnalyzer.java:107-113`) is tokenizer → possessive →
    lowercase → stop → porter; our possessive strip runs post-lowercase,
    which is equivalent (lowercasing maps 'S→'s and never creates or
    destroys an apostrophe-s tail)."""

    stop_words: frozenset = field(default_factory=frozenset)
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
    possessive: bool = False
    stemmer: str | None = None
    # ASCIIFoldingFilter (miscellaneous/ASCIIFoldingFilter.java:57):
    # fold Latin accents/ligatures to ASCII, applied after lowercase
    # and before the stop filter (so "thé" stops as "the")
    ascii_folding: bool = False
    # SetKeywordMarkerFilter (miscellaneous/SetKeywordMarkerFilter.java:31):
    # terms in this set are protected from the stemmer (KeywordAttribute)
    keyword_terms: frozenset = field(default_factory=frozenset)
    # StemmerOverrideFilter (miscellaneous/StemmerOverrideFilter.java:37):
    # term → stem dictionary consulted BEFORE the stemmer; an override
    # hit also sets the keyword attribute, so the stemmer never runs on it
    stem_overrides: tuple = ()

    def _finish(self, low: str):
        """Post-lowercase filter chain: fold → possessive → stop → stem.
        Returns the final term, or None if stop-filtered (the position
        still advances — FilteringTokenFilter.java:47-57)."""
        if self.ascii_folding:
            from .folding import ascii_fold
            low = ascii_fold(low)
        if self.possessive:
            low = possessive_strip(low)
        if low in self.stop_words:
            return None
        if self.stem_overrides:
            ov = _override_map(self.stem_overrides)
            if low in ov:
                return ov[low]
        if low in self.keyword_terms:
            return low
        st = get_stemmer(self.stemmer)
        return st(low) if st else low

    def tokens(self, text: str) -> list[str]:
        """Post-analysis token stream (the norm length is len() of this)."""
        return self.tokens_positions(text)[0]

    def tokens_positions(self, text: str) -> tuple[list[str], list[int]]:
        """(tokens, positions) — positions count skipped/stopped slots."""
        if not text:
            return [], []
        toks, pos = [], []
        p = 0
        for t in tokenize_raw(text):
            if len(t) <= self.max_token_length:
                out = self._finish(simple_lowercase(t))
                if out is not None:
                    toks.append(out)
                    pos.append(p)
            p += 1
        return toks, pos

    def term_freqs(self, text: str) -> dict[str, int]:
        """Per-document term → freq map (the IndexingChain per-doc hash)."""
        tf: dict[str, int] = {}
        for t in self.tokens(text):
            tf[t] = tf.get(t, 0) + 1
        return tf

    def term_positions(self, text: str) -> dict[str, list[int]]:
        tp: dict[str, list[int]] = {}
        toks, pos = self.tokens_positions(text)
        for t, p in zip(toks, pos):
            tp.setdefault(t, []).append(p)
        return tp

    def term_occurrences(self, text: str) -> dict[str, list[tuple]]:
        """{term: [(position, start, end)]} — positions as in
        :meth:`term_positions` plus character offsets into ``text``
        (the OffsetAttribute surface, for offsets-enabled indexes)."""
        from .tokenizer import tokenize_raw_spans
        if not text:
            return {}
        out: dict[str, list[tuple]] = {}
        p = 0
        for t, s, e in tokenize_raw_spans(text):
            if len(t) <= self.max_token_length:
                low = self._finish(simple_lowercase(t))
                if low is not None:
                    out.setdefault(low, []).append((p, s, e))
            p += 1
        return out


ENGLISH_ANALYZER = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)

# The full reference chain (`en/EnglishAnalyzer.java:107-113`):
# StandardTokenizer → EnglishPossessiveFilter → LowerCaseFilter →
# StopFilter(English) → PorterStemFilter.
ENGLISH_STEM_ANALYZER = StandardAnalyzer(
    stop_words=ENGLISH_STOP_WORDS, possessive=True, stemmer="porter")

# Lighter variant with Harman's S-stemmer (EnglishMinimalStemFilter) —
# the stem step is ANSI-SQL-expressible, so queries over this analyzer
# carry full DuckDB oracles.
ENGLISH_MINIMAL_ANALYZER = StandardAnalyzer(
    stop_words=ENGLISH_STOP_WORDS, possessive=True, stemmer="minimal")


def analyze_series(texts: pd.Series, analyzer: StandardAnalyzer) -> pd.Series:
    """Vectorized entry for pandas_udf: Series[str] → Series[list[str]]."""
    return texts.fillna("").map(analyzer.tokens)


def term_freqs_series(texts: pd.Series, analyzer: StandardAnalyzer) -> pd.Series:
    """Series[str] → Series[dict[str,int]] for MapType pandas_udf."""
    return texts.fillna("").map(analyzer.term_freqs)
