"""DictionaryCompoundWordTokenFilter — compound splitting by lexicon.

Reference semantics (`lucene/analysis/common/src/java/org/apache/lucene/
analysis/compound/DictionaryCompoundWordTokenFilter.java:30` over
`CompoundWordTokenFilterBase.java:90-121`): tokens at least
``min_word_size`` (5) chars long are scanned — every substring of
length ``min_subword_size`` (2) .. ``max_subword_size`` (15) present
in the dictionary becomes an extra token stacked at the SAME position
(posInc 0) behind the always-kept original; ``only_longest_match``
keeps, per start offset, only the longest dictionary hit. Scan order
is start-offset ascending, then length ascending — reproduced exactly
so the emitted subword sequence matches the reference stream.

The classic use is German/Dutch/Scandinavian web text
("Donaudampfschiff" → donau, dampf, schiff) so compound queries and
part queries meet in the index. The German decompounding lexicon
itself ships with the deployment, not the engine — tests plant one.

Spark shape: a CustomAnalyzer token-filter (per-doc builder path — an
arbitrary lexicon probe is not a codegen expression); the subword scan
is O(len × sizes) dict lookups per long token, bounded by
``max_subword_size``. For corpus-scale batch decompounding outside
the index there is :func:`decompound_expr` — the same scan as a
codegen-free Spark expression is not expressible, so it stays an
honest Python filter; the hot index path is unaffected unless the
filter is in the chain.
"""

from __future__ import annotations

from typing import Iterable

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def decompose(token: str, dictionary, min_subword_size: int,
              max_subword_size: int, only_longest_match: bool,
              lowercase_match: bool = True) -> list[str]:
    """The reference's ``decompose()`` loop verbatim in shape:
    start offsets ascending, lengths ascending, per-start longest kept
    under only_longest_match."""
    probe = token.lower() if lowercase_match else token
    n = len(probe)
    out: list[str] = []
    for i in range(0, n - min_subword_size + 1):
        longest = None
        for j in range(min_subword_size, max_subword_size + 1):
            if i + j > n:
                break
            sub = probe[i:i + j]
            if sub in dictionary:
                if only_longest_match:
                    if longest is None or len(longest) < j:
                        longest = sub
                else:
                    out.append(sub)
        if only_longest_match and longest is not None:
            out.append(longest)
    return out


def dictionary_compound_filter(dictionary: Iterable[str],
                               min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                               min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                               max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                               only_longest_match: bool = False,
                               lowercase_match: bool = True):
    """CustomAnalyzer ``token_filters`` element: original token always
    passes; dictionary subwords stack on its position (posInc 0 — the
    CompoundWordTokenFilterBase emission discipline)."""
    if min_subword_size <= 0 or max_subword_size < min_subword_size:
        raise ValueError("need 0 < min_subword_size <= max_subword_size")
    if min_word_size <= 0:
        raise ValueError("min_word_size must be positive")
    lex = frozenset(w.lower() if lowercase_match else w
                    for w in dictionary)
    if not lex:
        raise ValueError("dictionary must not be empty")

    def run(stream):
        out = []
        for t, p in stream:
            out.append((t, p))
            if len(t) >= min_word_size:
                for sub in decompose(t, lex, min_subword_size,
                                     max_subword_size, only_longest_match,
                                     lowercase_match):
                    out.append((sub, p))
        return out
    return run
