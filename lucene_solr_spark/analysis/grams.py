"""N-gram / edge-n-gram / common-grams / fingerprint token filters.

Reference semantics (each pinned against the reference's own tests in
tests/test_grams.py):

* NGramTokenFilter (`analysis/ngram/NGramTokenFilter.java:41`): all
  grams of size minGram..maxGram, sorted by offset in the original
  token first, then increasing length ("abc", 1..2 → a, ab, b, bc, c);
  preserveOriginal keeps tokens shorter than minGram and appends the
  original after the grams for tokens longer than maxGram.
* EdgeNGramTokenFilter (`analysis/ngram/EdgeNGramTokenFilter.java:39`):
  prefixes of size minGram..maxGram; preserveOriginal as above.
* CommonGramsFilter (`analysis/commongrams/CommonGramsFilter.java:35`):
  unigrams kept, bigram "w1_w2" overlaid (posInc 0) after w1 whenever
  w1 or w2 is a common word ("the fox" → the, the_fox, fox).
* CommonGramsQueryFilter (`commongrams/CommonGramsQueryFilter.java:38`):
  one token per position — the bigram replaces the unigram where it
  starts, and the final unigram drops when the preceding bigram
  already covers it ("n n s" → n, n_s; "s n n" → s_n, n, n).
* FingerprintFilter (`miscellaneous/FingerprintFilter.java:38`): ONE
  token = the sorted, de-duplicated input tokens joined by the
  separator; NO token when the result exceeds maxOutputTokenSize.
  Sort order is binary/codepoint (identical in Spark and Python for
  the engine's lowercase-ASCII token streams — documented envelope).

Every Catalyst expression is pure codegen-side JVM work (substring /
sequence / transform / flatten / array_sort) — no Python, no shuffle;
grams widen the row, and the downstream explode+count is the same
map-side-combined plan as every facet.  The Python twins serve the
per-doc analyzer path and differential tests.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- n-grams


def ngram_tokens(token: str, min_gram: int, max_gram: int,
                 preserve_original: bool = False) -> list[str]:
    """Python twin of NGramTokenFilter: offset-major, then length."""
    n = len(token)
    if n < min_gram:
        return [token] if preserve_original else []
    out = []
    for pos in range(0, n - min_gram + 1):
        for g in range(min_gram, max_gram + 1):
            if pos + g <= n:
                out.append(token[pos:pos + g])
    if preserve_original and n > max_gram:
        out.append(token)
    return out


def ngram_expr(col: Column | str, min_gram: int, max_gram: int,
               preserve_original: bool = False) -> Column:
    """Catalyst twin: Column[str] → Column[array<string>] of n-grams."""
    t = F.col(col) if isinstance(col, str) else col
    n = F.length(t)
    sizes = F.sequence(F.lit(min_gram), F.lit(max_gram))
    starts = F.when(n >= min_gram,
                    F.sequence(F.lit(1), n - min_gram + 1)) \
             .otherwise(F.array().cast("array<int>"))
    grams = F.flatten(F.transform(
        starts,
        lambda p: F.filter(
            F.transform(sizes,
                        lambda g: F.when(p + g - 1 <= n,
                                         F.substring(t, p, g))),
            lambda x: x.isNotNull())))
    if preserve_original:
        short = F.when(n < min_gram, F.array(t)) \
                 .otherwise(F.array().cast("array<string>"))
        long_ = F.when(n > max_gram, F.array(t)) \
                 .otherwise(F.array().cast("array<string>"))
        grams = F.concat(short, grams, long_)
    return grams


def edge_ngram_tokens(token: str, min_gram: int, max_gram: int,
                      preserve_original: bool = False) -> list[str]:
    """Python twin of EdgeNGramTokenFilter: prefixes min..max."""
    n = len(token)
    if n < min_gram:
        return [token] if preserve_original else []
    out = [token[:g] for g in range(min_gram, min(max_gram, n) + 1)]
    if preserve_original and n > max_gram:
        out.append(token)
    return out


def edge_ngram_expr(col: Column | str, min_gram: int, max_gram: int,
                    preserve_original: bool = False) -> Column:
    """Catalyst twin: Column[str] → Column[array<string>] of prefixes."""
    t = F.col(col) if isinstance(col, str) else col
    n = F.length(t)
    sizes = F.when(n >= min_gram,
                   F.sequence(F.lit(min_gram), F.least(F.lit(max_gram), n))) \
            .otherwise(F.array().cast("array<int>"))
    grams = F.transform(sizes, lambda g: F.substring(t, F.lit(1), g))
    if preserve_original:
        short = F.when(n < min_gram, F.array(t)) \
                 .otherwise(F.array().cast("array<string>"))
        long_ = F.when(n > max_gram, F.array(t)) \
                 .otherwise(F.array().cast("array<string>"))
        grams = F.concat(short, grams, long_)
    return grams


# ----------------------------------------------------------- common grams

SEPARATOR = "_"


def common_grams_tokens(tokens: Sequence[str],
                        common: Iterable[str]) -> list[str]:
    """Python twin of CommonGramsFilter (indexing mode): unigrams plus
    overlaid bigrams where either member is common."""
    cs = set(common)
    out = []
    for i, tok in enumerate(tokens):
        out.append(tok)
        if i + 1 < len(tokens) and (tok in cs or tokens[i + 1] in cs):
            out.append(tok + SEPARATOR + tokens[i + 1])
    return out


def common_grams_query_tokens(tokens: Sequence[str],
                              common: Iterable[str]) -> list[str]:
    """Python twin of CommonGramsQueryFilter: one token per position —
    gram where one starts; unigram otherwise, except the final unigram
    when the preceding bigram already covers it."""
    cs = set(common)
    n = len(tokens)
    gram_at = [i + 1 < n and (tokens[i] in cs or tokens[i + 1] in cs)
               for i in range(n)]
    out = []
    for i in range(n):
        if gram_at[i]:
            out.append(tokens[i] + SEPARATOR + tokens[i + 1])
        elif not (i == n - 1 and n >= 2 and gram_at[i - 1]):
            out.append(tokens[i])
    return out


def _is_common(tok: Column, common: Sequence[str]) -> Column:
    # bounded literal array probe — common-word sets are stopword-sized
    return F.array_contains(F.array(*[F.lit(w) for w in common]), tok)


def common_grams_expr(col: Column | str, common: Sequence[str]) -> Column:
    """Catalyst twin (indexing mode): Column[array<string>] →
    Column[array<string>] of unigrams + overlaid bigrams, in stream
    order."""
    toks = F.col(col) if isinstance(col, str) else col
    n = F.size(toks)
    idx = F.when(n >= 1, F.sequence(F.lit(1), F.greatest(n, F.lit(1)))) \
         .otherwise(F.array().cast("array<int>"))
    common = sorted(set(common))

    def per_pos(i):
        cur = F.element_at(toks, i)
        nxt = F.try_element_at(toks, i + 1)
        gram = F.when(
            (i < n) & (_is_common(cur, common) | _is_common(nxt, common)),
            F.array(F.concat(cur, F.lit(SEPARATOR), nxt))) \
            .otherwise(F.array().cast("array<string>"))
        return F.concat(F.array(cur), gram)

    return F.flatten(F.transform(idx, per_pos))


def common_grams_query_expr(col: Column | str,
                            common: Sequence[str]) -> Column:
    """Catalyst twin (query mode): one token per position."""
    toks = F.col(col) if isinstance(col, str) else col
    n = F.size(toks)
    idx = F.when(n >= 1, F.sequence(F.lit(1), F.greatest(n, F.lit(1)))) \
         .otherwise(F.array().cast("array<int>"))
    common = sorted(set(common))

    def gram_at(i):
        # try_element_at: position n+1 reads past the array → NULL, and
        # the three-valued (i < n) & NULL collapses to false
        cur = F.try_element_at(toks, i)
        nxt = F.try_element_at(toks, i + 1)
        return (i < n) & (_is_common(cur, common) | _is_common(nxt, common))

    def per_pos(i):
        cur = F.element_at(toks, i)
        nxt = F.try_element_at(toks, i + 1)
        return F.when(gram_at(i),
                      F.array(F.concat(cur, F.lit(SEPARATOR), nxt))) \
                .otherwise(
            F.when((i == n) & (n >= 2) & gram_at(F.greatest(i - 1, F.lit(1))),
                   F.array().cast("array<string>"))
             .otherwise(F.array(cur)))

    return F.flatten(F.transform(idx, per_pos))


# ------------------------------------------------------------ fingerprint

DEFAULT_MAX_OUTPUT_TOKEN_SIZE = 1024


def fingerprint_token(tokens: Sequence[str], separator: str = " ",
                      max_output_token_size: int =
                      DEFAULT_MAX_OUTPUT_TOKEN_SIZE) -> str | None:
    """Python twin of FingerprintFilter: one sorted-deduped token, or
    None when empty / over the size cap."""
    if not tokens:
        return None
    fp = separator.join(sorted(set(tokens)))
    return fp if len(fp) <= max_output_token_size else None


def fingerprint_expr(col: Column | str, separator: str = " ",
                     max_output_token_size: int =
                     DEFAULT_MAX_OUTPUT_TOKEN_SIZE) -> Column:
    """Catalyst twin: Column[array<string>] → Column[str] (null when
    empty or over the cap) — array_distinct + array_sort + array_join,
    all codegen."""
    toks = F.col(col) if isinstance(col, str) else col
    fp = F.array_join(F.array_sort(F.array_distinct(toks)), separator)
    return F.when((F.size(toks) >= 1) &
                  (F.length(fp) <= max_output_token_size), fp)
