"""WordDelimiterGraphFilter analog — intra-word splitting.

Mirrors `lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterGraphFilter.java:47-120` with the Solr
schema defaults (generateWordParts=1, generateNumberParts=1,
splitOnCaseChange=1, splitOnNumerics=1, stemEnglishPossessive=1):

  "PowerShot500"  → power shot 500
  "Wi-Fi"         → wi fi
  "O'Neil's"      → o neil
  "APIKey"        → api key        (uppercase-run boundary)
  "j2se"          → j 2 se

Splits happen at (a) non-alphanumeric delimiters, (b) lower→upper case
transitions, (c) letter↔digit transitions, and (d) the end of an
uppercase run followed by a lowercased word ("APIKey" → API|Key).
``preserve_original`` and ``catenate_all`` add the whole token /
delimiter-stripped concatenation, as in the reference's CATENATE_ALL /
PRESERVE_ORIGINAL flags.  Graph position bookkeeping (posLen
attributes) is out of envelope — subwords advance one position each,
which matches how the engine consumes token streams.

Two implementations, differential-tested in tests/test_worddelim.py:

* :func:`word_delimiter_expr` — a pure Catalyst Column (regexp-
  boundary insertion + split), the 100-TB path: whole-stage codegen,
  no Python in the executor.
* :func:`word_delimiter_split` — per-token Python twin for analyzer /
  per-doc contexts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# boundary rules (order matters: uppercase-run before case-change)
_RULES = [
    (r"(\p{Lu})(\p{Lu}\p{Ll})", r"$1 $2"),   # APIKey   -> API Key (Java regex)
    (r"(\p{Ll})(\p{Lu})", r"$1 $2"),          # powerShot -> power Shot
    (r"([A-Za-z])([0-9])", r"$1 $2"),          # shot500  -> shot 500
    (r"([0-9])([A-Za-z])", r"$1 $2"),          # 2se      -> 2 se
]
# the same rules for Python's re (no \p classes: the case-transition
# rules are ASCII-envelope in the Python twin, while delimiters match
# the Java class — beyond-ASCII case transitions are the Catalyst
# path's job; tests pin the ASCII differential)
_PY_RULES = [
    (re.compile(r"([A-Z])([A-Z][a-z])"), r"\1 \2"),
    (re.compile(r"([a-z])([A-Z])"), r"\1 \2"),
    (re.compile(r"([A-Za-z])([0-9])"), r"\1 \2"),
    (re.compile(r"([0-9])([A-Za-z])"), r"\1 \2"),
]
_POSSESSIVE = re.compile(r"['’]s$")
_DELIM = re.compile(r"[\W_]+", re.UNICODE)  # == Java [^\p{L}\p{N}]+


def word_delimiter_split(token: str, preserve_original: bool = False,
                         catenate_all: bool = False) -> list[str]:
    """Subwords for one token (reference order: parts first)."""
    t = _POSSESSIVE.sub("", token)
    for rx, rep in _PY_RULES:
        t = rx.sub(rep, t)
    parts = [p for p in _DELIM.split(t) if p]
    out = list(parts) if len(parts) > 1 or (parts and parts[0] != token) \
        else list(parts)
    if catenate_all and len(parts) > 1:
        out.append("".join(parts))
    if preserve_original and (len(parts) != 1 or parts[0] != token):
        out.append(token)
    return out


def word_delimiter_expr(col: Column | str, catenate_all: bool = False):
    """Catalyst twin: Column[str] → Column[array<str>] of subwords.

    regexp_replace (Java regex, so \\p{Lu}/\\p{Ll} work and the rule
    set matches the reference beyond ASCII) inserts spaces at every
    subword boundary, then one split.  Stays inside whole-stage
    codegen — the per-token Python twin never runs on the executors.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"['’]s$", "")
    for pat, rep in _RULES:
        c = F.regexp_replace(c, pat, rep)
    parts = F.filter(F.split(c, r"[^\p{L}\p{N}]+"), lambda x: x != "")
    if catenate_all:
        cat = F.array_join(parts, "")
        parts = F.when(F.size(parts) > 1,
                       F.concat(parts, F.array(cat))).otherwise(parts)
    return parts
