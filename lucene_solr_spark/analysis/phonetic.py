"""PhoneticFilter analog — American Soundex encoding.

Mirrors Solr's PhoneticFilterFactory with the Soundex encoder
(`lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java:33`; the encoder semantics are the
published NARA/commons-codec American Soundex): letter + 3 digits,
h/w never separate equal codes, vowels do.

The encoding is expressed as ONE uniform string pipeline so the exact
same derivation runs as a Catalyst Column (whole-stage codegen), as
DuckDB oracle SQL, and as the per-token Python twin:

  1. lowercase; keep the first letter
  2. drop h/w AFTER position 1 (they never separate codes)
  3. map letters → digits (b f p v→1, c g j k q s x z→2, d t→3, l→4,
     m n→5, r→6), vowels+y → 0 (separator marker)
  4. collapse adjacent equal digits (the first letter's code
     participates, so "Pfister" → P236 not P123)
  5. drop the first code, drop the 0 separators
  6. first letter + digits, zero-padded / truncated to 3

Pinned against the published NARA examples (Robert/Rupert→R163,
Ashcraft→A261, Tymczak→T522, Pfister→P236) in
tests/test_phonetic.py.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_MAPS = [("[bfpv]", "1"), ("[cgjkqsxz]", "2"), ("[dt]", "3"),
         ("[l]", "4"), ("[mn]", "5"), ("[r]", "6"), ("[aeiouy]", "0")]


def soundex(word: str) -> str:
    """Per-token Python twin of :func:`soundex_expr`."""
    x = "".join(c for c in word.lower() if c.isalpha())
    if not x:
        return ""
    first = x[0].upper()
    y = x[0] + re.sub(r"[hw]", "", x[1:])
    for pat, rep in _MAPS:
        y = re.sub(pat, rep, y)
    for d in "0123456":                       # collapse adjacent equals
        y = re.sub(d + "{2,}", d, y)          # (RE2-safe: no backrefs,
    digits = y[1:].replace("0", "")           #  same chain as the oracle)
    return first + (digits + "000")[:3]


def soundex_expr(col: Column | str) -> Column:
    """Catalyst Soundex — the same pipeline as :func:`soundex`, pure
    codegen. (Spark ships a built-in ``F.soundex``, but its h/w rule
    follows a different lineage; this expression IS the oracle-shared
    derivation, so engine and DuckDB agree by construction.)"""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_replace(F.lower(c), "[^a-z]", "")
    first = F.upper(F.substring(x, 1, 1))
    y = F.concat(F.substring(x, 1, 1),
                 F.regexp_replace(x.substr(F.lit(2), F.length(x)),
                                  "[hw]", ""))
    for pat, rep in _MAPS:
        y = F.regexp_replace(y, pat, rep)
    for d in "0123456":
        y = F.regexp_replace(y, d + "{2,}", d)
    digits = F.regexp_replace(y.substr(F.lit(2), F.length(y)), "0", "")
    out = F.concat(first, F.substring(F.concat(digits, F.lit("000")), 1, 3))
    return F.when(x == "", F.lit("")).otherwise(out)


def phonetic_terms(terms_df, word: str, field: str = "text",
                   size: int = 64) -> list[str]:
    """Dictionary terms sharing ``word``'s Soundex code — the
    PhoneticFilter query-side expansion (top-terms-capped like every
    MultiTermQuery rewrite)."""
    code = soundex(word)
    rows = (terms_df.filter(F.col("field") == field)
            .filter(soundex_expr(F.col("term")) == code)
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term")).limit(size).collect())
    return sorted(r["term"] for r in rows)
