"""StandardTokenizer-equivalent word segmentation.

The reference tokenizer (`analysis/standard/StandardTokenizer.java:39` +
the JFlex DFA in `StandardTokenizerImpl.java`) implements UAX#29 word
boundaries, emitting ALPHANUM / NUM / CJK / HANGUL / EMOJI tokens and
*skipping* tokens longer than ``maxTokenLength`` (default 255) while still
advancing the position counter (`StandardTokenizer.java:154-166`).

This is a from-scratch regex approximation of UAX#29 rules WB5-WB13
adequate for web text:

- runs of Unicode letters/digits/marks/underscore (``\\w``) form a token
- medial apostrophe (' or U+2019) and medial dot join alphanumeric runs
  (UAX#29 MidLetter / MidNumLet), e.g. ``o'neill``, ``wi.fi``, ``3.14``
- CJK ideographs are emitted one codepoint per token (Lucene's IDEOGRAPHIC
  type behaves this way in StandardTokenizer)
- everything else is a boundary

Exact UAX#29 conformance on exotic scripts is NOT claimed; the pinned
golden fixtures in tests/test_analyzer.py define the supported envelope,
and the synthetic benchmark corpus stays inside it.
"""

from __future__ import annotations

import re

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH (:39)

# CJK unified ideographs + extensions A, Hiragana/Katakana kept as runs is
# NOT Lucene behavior: StandardTokenizer emits IDEOGRAPHIC one char at a
# time but keeps HIRAGANA single / KATAKANA runs. We emit: one token per
# ideograph, runs for kana.
_IDEO = "一-鿿㐀-䶿"
_KANA = "぀-ヿ"

_TOKEN_RE = re.compile(
    rf"(?:[{_IDEO}])"              # single ideograph
    rf"|(?:[{_KANA}]+)"            # kana run
    r"|(?:\w+(?:['’.]\w+)*)",  # alphanumeric with medial '/./'
    re.UNICODE,
)

# \w includes ideographs/kana; exclude them from the alphanumeric branch by
# post-splitting: simpler and still linear — see _split_mixed below.
_HAS_IDEO_RE = re.compile(rf"[{_IDEO}{_KANA}]")


def tokenize_raw(text: str) -> list[str]:
    """Segment `text` into tokens (pre-lowercase, pre-stop, no length skip)."""
    out = []
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if _HAS_IDEO_RE.search(tok) and len(tok) > 1 and not _HAS_IDEO_RE.fullmatch(tok[0]):
            # mixed latin+ideo matched by the \w branch — split on script
            out.extend(_split_mixed(tok))
        else:
            out.append(tok)
    return out


def tokenize_raw_spans(text: str) -> list[tuple[str, int, int]]:
    """Like :func:`tokenize_raw` but with character offsets:
    [(token, start, end)] — the OffsetAttribute of the reference's
    token stream (`analysis/tokenattributes/OffsetAttribute.java:25`).
    Offsets index the input string exactly as given."""
    out = []
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if (_HAS_IDEO_RE.search(tok) and len(tok) > 1
                and not _HAS_IDEO_RE.fullmatch(tok[0])):
            base = m.start()
            for part, s, e in _split_mixed_spans(tok):
                out.append((part, base + s, base + e))
        else:
            out.append((tok, m.start(), m.end()))
    return out


def _split_mixed(tok: str) -> list[str]:
    parts = []
    for m in re.finditer(rf"[{_IDEO}]|[{_KANA}]+|[^{_IDEO}{_KANA}]+", tok):
        parts.append(m.group(0))
    return parts


def _split_mixed_spans(tok: str) -> list[tuple[str, int, int]]:
    return [(m.group(0), m.start(), m.end())
            for m in re.finditer(rf"[{_IDEO}]|[{_KANA}]+|[^{_IDEO}{_KANA}]+",
                                 tok)]


def tokenize_with_positions(text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """→ (tokens, positions). Over-long tokens are skipped but consume a position,
    matching StandardTokenizer.java:154-166."""
    toks, pos = [], []
    p = 0
    for t in tokenize_raw(text):
        if len(t) <= max_token_length:
            toks.append(t)
            pos.append(p)
        p += 1
    return toks, pos
