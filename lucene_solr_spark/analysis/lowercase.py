"""Java-compatible *simple* lowercase mapping.

The reference's LowerCaseFilter (`analysis/LowerCaseFilter.java:40-43` →
`CharacterUtils.toLowerCase`) lowercases one codepoint at a time with
``Character.toLowerCase`` — the Unicode *simple* 1:1 mapping. Python's
``str.lower()`` applies *full* case mappings (SpecialCasing.txt), which
differ for a handful of codepoints (e.g. U+0130 LATIN CAPITAL LETTER I
WITH DOT ABOVE lowers to "i" + U+0307 under full mapping but to plain
"i" under Java's simple mapping).

Strategy: ``str.lower()`` is the fast path; any codepoint whose full
lowercase expands to more than one character gets its Java simple
mapping from an exception table instead.
"""

from __future__ import annotations

import re
import sys
from functools import lru_cache


@lru_cache(maxsize=1)
def _multi_char_exceptions() -> dict[str, str]:
    """Codepoints whose str.lower() differs from Java's simple mapping →
    the Java simple mapping. Two classes:

    - multi-char full mappings (SpecialCasing.txt): Java's simple mapping
      is the single-codepoint lowercase from UnicodeData.txt if one
      exists, else the character itself (e.g. U+00DF ß, U+FB00 ﬀ stay
      as-is under simple mapping — they only change under full case
      *folding*, which the reference does not use);
    - CONTEXT-SENSITIVE mappings: U+03A3 GREEK CAPITAL SIGMA lowers to
      final sigma ς word-finally under Python's full mapping but always
      to σ under Java's context-free Character.toLowerCase — forcing it
      through the exception table keeps per-char semantics AND routes
      Σ-bearing documents to the exact per-doc path in the vectorized
      inverter (index/builder.py _fallback_re).
    """
    exc = {}
    for cp in range(sys.maxunicode + 1):
        ch = chr(cp)
        low = ch.lower()
        if len(low) > 1:
            simple = {0x0130: "i"}.get(cp, ch)
            exc[ch] = simple
    exc[chr(0x03A3)] = "σ"        # Σ → σ, never context-dependent ς
    return exc


@lru_cache(maxsize=1)
def _exception_re():
    chars = "".join(re.escape(c) for c in _multi_char_exceptions())
    return re.compile(f"[{chars}]")


def simple_lowercase(s: str) -> str:
    """Lowercase `s` with Java Character.toLowerCase per-codepoint semantics."""
    if s.isascii():
        return s.lower()
    exc = _multi_char_exceptions()
    if _exception_re().search(s) is None:
        return s.lower()
    return "".join(exc.get(c, c.lower()) for c in s)
