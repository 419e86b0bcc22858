"""UAX29URLEmailTokenizer analog — web tokens with URL/EMAIL types.

Mirrors `lucene/analysis/common/src/java/org/apache/lucene/analysis/
email/UAX29URLEmailTokenizer.java:41-66`: the StandardTokenizer UAX#29
word rules, extended so that URLs and e-mail addresses survive as
SINGLE tokens, typed <URL> / <EMAIL> (TOKEN_TYPES[URL]=6, [EMAIL]=7 in
the reference; ordinary words keep <ALPHANUM>/<NUM>).

The reference grammar (`UAX29URLEmailTokenizerImpl.jflex`) is a
~200-rule JFlex machine tracking RFC 3986/5321 productions.  Our
envelope, pinned in tests/test_urlemail.py:

* URL  = scheme form `(https?|ftp)://<authority+path>` or a bare
  `www.`-prefixed authority; trailing sentence punctuation `.,;:!?`
  is shed (the reference likewise excludes an unbalanced trailing
  dot via its lookahead rules).
* EMAIL = `local@domain.tld` with RFC-ish local chars `A-Za-z0-9._%+-`
  (the reference additionally admits quoted-string locals and IP
  literals — out of envelope, documented).
* Everything not consumed by those two rules tokenizes exactly as the
  standard chain (same regex as analysis/tokenizer.py).

Two twins, differential-tested:

* :func:`url_email_expr` — Catalyst: ONE regexp_extract_all with the
  alternation ordered URL | EMAIL | word, so the longest web construct
  wins before word rules can split it.  Whole-stage codegen; typing is
  a codegen CASE over the token's shape.  This is the 100-TB path: a
  single pass over text, no shuffle, no Python.
* :func:`tokenize_url_email` — per-doc Python twin returning
  (token, type) pairs for analyzer contexts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# alternation order matters: URL before EMAIL before words, so
# "http://u:p@h/x" is one URL, not an email plus fragments
_URL = r"(?:https?|ftp)://[^\s<>\"'`{}|\\^\[\]]+|www\.[^\s<>\"'`{}|\\^\[\]]+"
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# the standard word rule (tokenizer.py envelope): letters/digits with
# internal apostrophes/periods handled by the downstream splitter
_WORD = r"[A-Za-z0-9_]+(?:['.][A-Za-z0-9_]+)*"

_FULL = f"({_URL})|({_EMAIL})|({_WORD})"
_PY_RE = re.compile(_FULL)
_TRAIL = re.compile(r"[.,;:!?]+$")

URL_TYPE, EMAIL_TYPE, WORD_TYPE = "<URL>", "<EMAIL>", "<ALPHANUM>"


def _shed(tok: str) -> str:
    return _TRAIL.sub("", tok)


def tokenize_url_email(text: str) -> list[tuple[str, str]]:
    """Python twin: [(token, type)] in reading order."""
    out = []
    for m in _PY_RE.finditer(text or ""):
        if m.group(1) is not None:
            out.append((_shed(m.group(1)), URL_TYPE))
        elif m.group(2) is not None:
            out.append((m.group(2), EMAIL_TYPE))
        else:
            out.append((m.group(3), WORD_TYPE))
    return out


def url_email_tokens_expr(col: Column | str) -> Column:
    """Catalyst twin: Column[str] → array<struct<token,type>>.

    regexp_extract_all(text, alternation) then a transform that sheds
    trailing punctuation from URLs and CASEs the type from the token
    shape — all codegen (regexp_extract_all + transform + named_struct).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(_FULL), 0)

    def is_url(t):
        return t.rlike("^((?:https?|ftp)://|www\\.)")

    def is_email(t):
        return t.rlike(f"^{_EMAIL}$")

    return F.transform(
        toks,
        lambda t: F.struct(
            F.when(is_url(t), F.regexp_replace(t, r"[.,;:!?]+$", ""))
             .otherwise(t).alias("token"),
            F.when(is_url(t), F.lit(URL_TYPE))
             .when(is_email(t), F.lit(EMAIL_TYPE))
             .otherwise(F.lit(WORD_TYPE)).alias("type")))
