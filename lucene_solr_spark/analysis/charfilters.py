"""CharFilter analogs — HTMLStrip, Mapping, PatternReplace.

Mirrors the pre-tokenization character stream rewriters:

* HTMLStripCharFilter (`lucene/analysis/common/src/java/org/apache/
  lucene/analysis/charfilter/HTMLStripCharFilter.java:58`, JFlex
  grammar `HTMLStripCharFilter.jflex`): drops tags, comments, CDATA
  wrappers, <script>/<style> element CONTENT, processing instructions
  and doctypes; decodes HTML character entities (named + decimal +
  hex numeric); inter-tag text passes through.  The reference replaces
  each stripped run so that tokenization cannot glue words across a
  tag boundary — our analog substitutes one space per stripped
  construct (documented envelope: the reference preserves the original
  offsets instead; offset-correct highlighting over HTML is out of
  envelope here, same as the r3 decision for the passage scorer).
* MappingCharFilter (`charfilter/MappingCharFilter.java:37`): ordered
  longest-match-first string rewrites from a NormalizeCharMap.
* PatternReplaceCharFilter (`pattern/PatternReplaceCharFilter.java:40`)
  and PatternReplaceFilter (`pattern/PatternReplaceFilter.java:33`):
  regex rewrite of the char stream / of each token.

Two implementations each, differential-tested in
tests/test_charfilters.py:

* ``*_expr`` — pure Catalyst Columns (regexp_replace / replace
  chains): the 100-TB path, whole-stage codegen, zero Python on the
  executors.  The codegen entity decoder covers the named set
  {amp lt gt quot apos nbsp} plus the numeric (decimal and hex)
  spellings of those same six characters — a chr() lookup over
  arbitrary numerics is not codegen-expressible, so other numeric
  entities pass through verbatim (documented envelope; the Python
  twin decodes everything via the stdlib table).
* ``html_strip`` / ``mapping_filter`` — exact Python twins for the
  per-doc analyzer path and for oracle-free differential tests.
"""

from __future__ import annotations

import html as _html
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- HTML strip

# stripped-as-a-block constructs, in reference grammar order:
# comments, CDATA (wrapper only — content passes through), script and
# style ELEMENTS including content, PIs/doctypes, then any remaining tag
_PY_BLOCKS = [
    re.compile(r"<!--.*?-->", re.S),
    re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I),
    re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I),
    re.compile(r"<!\[CDATA\[|\]\]>"),
    re.compile(r"<[!?][^>]*>"),
    re.compile(r"</?[A-Za-z][^>]*>"),
]
# Java-regex twins (same patterns; (?s)/(?i) inline flags)
_J_BLOCKS = [
    r"(?s)<!--.*?-->",
    r"(?si)<script\b[^>]*>.*?</script\s*>",
    r"(?si)<style\b[^>]*>.*?</style\s*>",
    r"<!\[CDATA\[|\]\]>",
    r"<[!?][^>]*>",
    r"</?[A-Za-z][^>]*>",
]

_NAMED = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
          ("&quot;", '"'), ("&apos;", "'"), ("&nbsp;", " ")]


def html_strip(text: str) -> str:
    """Exact Python twin: strip + full entity decode (stdlib tables =
    the HTML5 superset of the reference's HTML4 set, documented)."""
    if not text:
        return text
    for rx in _PY_BLOCKS:
        text = rx.sub(" ", text)
    return _html.unescape(text)


def html_strip_expr(col: Column | str) -> Column:
    """Catalyst twin: Column[str] → stripped Column[str].

    One regexp_replace per construct + the bounded entity table —
    a straight-line codegen Project; the scan fuses with it, so at
    100 TB this is exactly one pass over the html/text column with
    no shuffle and no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat in _J_BLOCKS:
        c = F.regexp_replace(c, pat, " ")
    # numeric spellings of the six named characters (&#38; == &amp; …);
    # F.replace is a literal (non-regex) substitution so no escaping
    # concerns; &amp;/&#38; are decoded LAST so "&amp;lt;" yields
    # "&lt;" not "<" — the reference decoder is likewise single-pass
    for ent, rep in [("&#60;", "<"), ("&#x3c;", "<"), ("&#62;", ">"),
                     ("&#x3e;", ">"), ("&#34;", '"'), ("&#x22;", '"'),
                     ("&#39;", "'"), ("&#x27;", "'"), ("&#160;", " "),
                     ("&#xa0;", " ")]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    for ent, rep in (_NAMED[1:] + _NAMED[:1]):  # &amp; last
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.replace(c, F.lit("&#38;"), F.lit("&"))
    c = F.replace(c, F.lit("&#x26;"), F.lit("&"))
    return c


def html_strip_expr_lite(col: Column | str) -> Column:
    """The benchmark-shaped strip: tags/comments/script/style + the six
    named entities only (no numeric table) — 8 regexp_replace calls
    total, for pipelines whose corpus is known entity-light."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in _J_BLOCKS:
        c = F.regexp_replace(c, pat, " ")
    for ent, rep in (_NAMED[1:] + _NAMED[:1]):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


# ------------------------------------------------------------ MappingCharFilter

def mapping_filter(text: str, mapping: dict[str, str]) -> str:
    """Python twin: greedy longest-match-first left-to-right rewrite —
    the NormalizeCharMap FST contract (`charfilter/NormalizeCharMap.
    java:36`): at each position the LONGEST matching key wins and the
    cursor jumps past the replacement (no re-scan of output)."""
    if not text or not mapping:
        return text
    keys = sorted(mapping, key=len, reverse=True)
    out, i, n = [], 0, len(text)
    while i < n:
        for k in keys:
            if text.startswith(k, i):
                out.append(mapping[k])
                i += len(k)
                break
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def mapping_filter_expr(col: Column | str, mapping: dict[str, str]) -> Column:
    """Catalyst twin: ordered F.replace chain, longest key first.

    Envelope: exact whenever no mapping VALUE contains another
    mapping's KEY (no re-scan-of-output divergence) — the common case
    for fold maps; tests assert the differential on such maps.  Pure
    codegen, no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    for k in sorted(mapping, key=len, reverse=True):
        c = F.replace(c, F.lit(k), F.lit(mapping[k]))
    return c


# ------------------------------------------------------------ PatternReplace

def pattern_replace_expr(col: Column | str, pattern: str,
                         replacement: str, replace_all: bool = True) -> Column:
    """PatternReplace(Char)Filter: regex rewrite of the stream/token.

    `pattern/PatternReplaceFilter.java:33` (ALL vs FIRST).  Java regex
    semantics both sides (Catalyst regexp_replace IS Java's Matcher).
    """
    c = F.col(col) if isinstance(col, str) else col
    if replace_all:
        return F.regexp_replace(c, pattern, replacement)
    # FIRST: append a capture that consumes the remainder, so the one
    # regexp_replace can only ever rewrite the leftmost match.  The
    # tail group's number is (groups in the user pattern) + 1.
    if "$" in replacement:
        raise ValueError("replace_first: group refs in replacement "
                         "are out of the codegen envelope — use the "
                         "Python analyzer path")
    tail = re.compile(pattern).groups + 1
    return F.regexp_replace(c, "(?s)(?:" + pattern + ")(.*)$",
                            replacement + f"${tail}")
