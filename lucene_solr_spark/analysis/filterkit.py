"""Small token-filter kit — Keep/Length/Trim/Truncate/LimitTokenCount.

Reference semantics:

* KeepWordFilter (`miscellaneous/KeepWordFilter.java:30`): keep only
  tokens in the word set (the inverse of StopFilter).
* LengthFilter (`miscellaneous/LengthFilter.java:32`): keep tokens
  whose length is within [min, max] inclusive.
* TrimFilter (`miscellaneous/TrimFilter.java:28`): strip leading and
  trailing whitespace from each token.
* TruncateTokenFilter (`miscellaneous/TruncateTokenFilter.java:33`):
  cut every token to the prefix of the given length (keyword-marked
  tokens exempt in the reference; the expr twin takes the raw stream).
* LimitTokenCountFilter (`miscellaneous/LimitTokenCountFilter.java:31`):
  index only the first maxTokenCount tokens of the stream — the
  classic maxFieldLength guard for pathological web documents.

All expr twins are single codegen array operations over a token-array
column (filter / transform / slice) — no Python, no shuffle, fused
into whatever projection already carries the tokens.  These compose:
``limit_token_count_expr(length_filter_expr(trim_expr(c), 2, 40), 1000)``
is still one Project.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def keep_word_expr(col: Column | str, words: Sequence[str]) -> Column:
    """Column[array<string>] → tokens present in ``words`` only."""
    lit = F.array(*[F.lit(w) for w in sorted(set(words))])
    return F.filter(_c(col), lambda t: F.array_contains(lit, t))


def length_filter_expr(col: Column | str, min_len: int,
                       max_len: int) -> Column:
    """Column[array<string>] → tokens with min_len <= len <= max_len."""
    return F.filter(_c(col), lambda t: (F.length(t) >= min_len) &
                                       (F.length(t) <= max_len))


def trim_expr(col: Column | str) -> Column:
    """Column[array<string>] → whitespace-trimmed tokens."""
    return F.transform(_c(col), lambda t: F.trim(t))


def truncate_expr(col: Column | str, length: int) -> Column:
    """Column[array<string>] → tokens cut to ``length`` chars."""
    return F.transform(_c(col),
                       lambda t: F.substring(t, F.lit(1), F.lit(length)))


def limit_token_count_expr(col: Column | str, max_tokens: int) -> Column:
    """Column[array<string>] → the first ``max_tokens`` tokens."""
    c = _c(col)
    return F.when(F.size(c) <= max_tokens, c) \
            .otherwise(F.slice(c, 1, max_tokens))


def keyword_repeat_stem_filter(stem):
    """The KeywordRepeatFilter chain composite — KeywordRepeatFilter
    (`miscellaneous/KeywordRepeatFilter.java:30`: every token emitted
    twice, first keyword-protected, second posInc 0) → stemmer (skips
    the keyword copy) → RemoveDuplicatesTokenFilter (drops the stemmed
    copy when it equals the original). The surviving stream — original
    plus distinct stem stacked at the SAME position — is produced
    directly; exact-form and stemmed queries both match, phrases keep
    positions. CustomAnalyzer token_filters element."""
    def run(stream):
        out = []
        for t, p in stream:
            out.append((t, p))
            s = stem(t)
            if s != t:
                out.append((s, p))
        return out
    return run


def remove_duplicates_filter():
    """RemoveDuplicatesTokenFilter
    (`miscellaneous/RemoveDuplicatesTokenFilter.java:33`): drop a token
    that repeats an earlier token AT THE SAME POSITION; distinct
    positions keep their repeats."""
    def run(stream):
        out, seen, cur = [], set(), None
        for t, p in stream:
            if p != cur:
                cur, seen = p, set()
            if t in seen:
                continue
            seen.add(t)
            out.append((t, p))
        return out
    return run
