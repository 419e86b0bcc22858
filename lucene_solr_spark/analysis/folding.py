"""ASCIIFoldingFilter analog — fold Latin-script letters to ASCII.

Mirrors `lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/ASCIIFoldingFilter.java:57-187` (foldToASCII): accented
and ligature Latin letters are replaced by their unaccented ASCII
equivalents ("café" → "cafe", "straße" → "strasse", "Œuvre" →
"OEuvre"). The reference's table is a generated switch over many
Unicode blocks; this port covers the Latin-1 Supplement and Latin
Extended-A/B blocks (U+0080–U+024F) — the folding envelope for
web-text European languages — and passes everything else through
unchanged.  The table is derived at import time from Unicode NFKD
decomposition (identical to the reference's mappings for every
decomposable letter) plus explicit entries for the non-decomposable
letters the reference also maps (ß, Æ, Ø, Þ, Ð, Œ, ł, đ, ħ, ŋ, ı, ĸ,
ſ, ƒ …).

Like the reference filter, folding is a per-token string→string map
(1:1 in token count, possibly expanding in characters), so it slots
into the post-lowercase filter chain of both the per-doc analyzer and
the vectorized vocabulary path (`index/builder.py:_vocab_map`).
"""

from __future__ import annotations

import unicodedata

# Letters in the covered blocks with no NFKD decomposition but an
# ASCII equivalent in the reference table (ASCIIFoldingFilter.java's
# generated cases for the same codepoints).
_EXPLICIT = {
    "Æ": "AE", "æ": "ae",   # Æ æ
    "Ð": "D", "ð": "d",     # Ð ð
    "Ø": "O", "ø": "o",     # Ø ø
    "Þ": "TH", "þ": "th",   # Þ þ
    "ß": "ss",                   # ß
    "Đ": "D", "đ": "d",     # Đ đ
    "Ħ": "H", "ħ": "h",     # Ħ ħ
    "ı": "i",                    # ı (dotless i)
    "ĸ": "k",                    # ĸ
    "Ł": "L", "ł": "l",     # Ł ł
    "Ŋ": "N", "ŋ": "n",     # Ŋ ŋ
    "Œ": "OE", "œ": "oe",   # Œ œ
    "Ŧ": "T", "ŧ": "t",     # Ŧ ŧ
    "ſ": "s",                    # ſ (long s)
    "ƀ": "b", "Ɖ": "D", "Ƒ": "F", "ƒ": "f",
    "Ɨ": "I", "ƚ": "l", "Ɵ": "O", "Ơ": "O",
    "ơ": "o", "ɇ": "e", "Ɉ": "J", "ɉ": "j",
}


def _build_table() -> dict[int, str]:
    table: dict[int, str] = {}
    for cp in range(0x0080, 0x0250):
        ch = chr(cp)
        if ch in _EXPLICIT:
            table[cp] = _EXPLICIT[ch]
            continue
        if not ch.isalpha():
            continue
        # NFKD, keep only ASCII base letters (strip combining marks)
        dec = unicodedata.normalize("NFKD", ch)
        ascii_part = "".join(c for c in dec if ord(c) < 0x80
                             and not unicodedata.combining(c))
        if ascii_part and all(c.isalpha() or c == "'" for c in ascii_part):
            table[cp] = ascii_part
    return table


_FOLD_TABLE = _build_table()


def ascii_fold(s: str) -> str:
    """Fold one token (or text) — non-Latin codepoints pass through."""
    return s.translate(_FOLD_TABLE)


def has_foldable(s: str) -> bool:
    """True if folding would change ``s`` (cheap pre-check for batches)."""
    return any(ord(c) in _FOLD_TABLE for c in s)
