"""Misc token filters: Capitalization, TypeToken, DecimalDigit,
PatternCaptureGroup.

Reference semantics:

* CapitalizationFilter (`miscellaneous/CapitalizationFilter.java:38`):
  per token, words split at chars <= ' ' or '.'; word 0 gets
  first-upper/rest-lower, later words lowercase under onlyFirstWord;
  ``keep`` words pass (word 0 optionally force-first-letter),
  ``ok_prefix`` prefixes pass, words under ``min_word_length`` pass;
  tokens >= ``max_token_length`` or with more than ``max_word_count``
  words revert to the original.
* TypeTokenFilter (`core/.../TypeTokenFilter.java:28`): keep a token
  iff ``use_white_list == (type in types)`` — the FilteringTokenFilter
  discipline over a typed stream (e.g. `analysis/urlemail.py` output).
* DecimalDigitFilter (`core/.../DecimalDigitFilter.java:31`): every
  Unicode decimal digit (category Nd) folds to its ASCII 0-9 value, so
  "٤٢" (Arabic-Indic) and "42" meet in the dictionary. The codegen
  twin is ONE `F.translate` with the full Nd mapping (lazy-built from
  unicodedata) — pure JVM, fused into the carrying projection.
* PatternCaptureGroupTokenFilter (`pattern/
  PatternCaptureGroupTokenFilter.java:66`): emit each non-empty
  capture group as a token stacked on the source position; groups
  advance in number order within a match, matches in find() order,
  multiple patterns merged by next-capture start offset;
  preserve_original emits the original first (and skips a capture
  equal to the whole token), otherwise the first capture REPLACES the
  original (token passes unchanged when nothing matches).
"""

from __future__ import annotations

import re
import sys
import unicodedata
from typing import Iterable, Sequence

from pyspark.sql import Column, functions as F


# ---------------------------------------------------------------------------
# CapitalizationFilter
# ---------------------------------------------------------------------------

def capitalize_token(token: str, only_first_word: bool = True,
                     keep: frozenset[str] | None = None,
                     keep_ignore_case: bool = False,
                     force_first_letter: bool = True,
                     ok_prefix: Sequence[str] = (),
                     min_word_length: int = 0,
                     max_word_count: int = sys.maxsize,
                     max_token_length: int = sys.maxsize) -> str:
    """One token through CapitalizationFilter.processWord."""
    if len(token) >= max_token_length:
        return token
    words: list[list[int | str]] = []      # [start, text]
    start = 0
    i = 0
    while i < len(token):
        c = token[i]
        if ord(c) <= 0x20 or c == ".":
            if i - start > 0:
                words.append([start, token[start:i]])
                start = i + 1
                i += 1                      # the reference's double-step
        i += 1
    if start < len(token):
        words.append([start, token[start:]])
    if len(words) > max_word_count:
        return token

    def in_keep(w: str) -> bool:
        if keep is None:
            return False
        return (w.lower() in keep) if keep_ignore_case else (w in keep)

    out = list(token)
    for wc, (off, w) in enumerate(words):
        if only_first_word and wc > 0:
            out[off:off + len(w)] = w.lower()
            continue
        if in_keep(w):
            if wc == 0 and force_first_letter:
                out[off] = w[0].upper()
            continue
        if len(w) < min_word_length:
            continue
        if any(w.startswith(p) for p in ok_prefix):
            continue
        out[off] = w[0].upper()
        out[off + 1:off + len(w)] = w[1:].lower()
    return "".join(out)


def capitalization_filter(**kwargs):
    """CustomAnalyzer token-filter element (1:1 rewrite)."""
    from .custom import map_filter
    return map_filter(lambda t: capitalize_token(t, **kwargs))


# ---------------------------------------------------------------------------
# TypeTokenFilter
# ---------------------------------------------------------------------------

def type_token_filter(typed: Iterable[tuple[str, str]],
                      types: Iterable[str],
                      use_white_list: bool = False) -> list[tuple[str, str]]:
    """Filter a [(token, type)] stream: keep iff
    use_white_list == (type in types)."""
    ts = frozenset(types)
    return [(t, ty) for t, ty in typed if use_white_list == (ty in ts)]


def typed_positions(typed: Iterable[tuple[str, str]],
                    types: Iterable[str],
                    use_white_list: bool = False) -> list[tuple[str, int]]:
    """Same filter but → [(token, position)] with FilteringTokenFilter
    gaps (removed tokens still advance positions)."""
    ts = frozenset(types)
    return [(t, i) for i, (t, ty) in enumerate(typed)
            if use_white_list == (ty in ts)]


# ---------------------------------------------------------------------------
# DecimalDigitFilter
# ---------------------------------------------------------------------------

_ND_MAP = None


def _nd_map() -> tuple[str, str]:
    global _ND_MAP
    if _ND_MAP is None:
        src, dst = [], []
        for cp in range(0x30, sys.maxunicode + 1):
            ch = chr(cp)
            if unicodedata.category(ch) == "Nd":
                d = unicodedata.decimal(ch, None)
                if d is not None and ch != str(d):
                    src.append(ch)
                    dst.append(str(d))
        _ND_MAP = ("".join(src), "".join(dst))
    return _ND_MAP


def fold_decimal_digits(token: str) -> str:
    """Python twin: Nd codepoints → ASCII 0-9."""
    src, dst = _nd_map()
    return token.translate(str.maketrans(src, dst))


def decimal_digit_filter():
    from .custom import map_filter
    return map_filter(fold_decimal_digits)


def decimal_digit_expr(col: Column | str) -> Column:
    """Codegen twin: one F.translate over the full Nd alphabet."""
    c = F.col(col) if isinstance(col, str) else col
    src, dst = _nd_map()
    return F.translate(c, src, dst)


# ---------------------------------------------------------------------------
# PatternCaptureGroupTokenFilter
# ---------------------------------------------------------------------------

def _captures(rx: re.Pattern, text: str, preserve_original: bool):
    """Yield (start, text) captures in the reference's per-matcher
    order: matches in find() order, groups in number order, empty and
    whole-token (under preserveOriginal) captures skipped."""
    for m in rx.finditer(text):
        for gi in range(1, rx.groups + 1):
            s, e = m.start(gi), m.end(gi)
            if s < 0 or s == e:
                continue
            if preserve_original and s == 0 and e == len(text):
                continue
            yield s, text[s:e]


def pattern_capture_tokens(token: str, patterns: Sequence[str | re.Pattern],
                           preserve_original: bool = False) -> list[str]:
    """One token → its output token list (all at the same position)."""
    regs = [re.compile(p) if isinstance(p, str) else p for p in patterns]
    gens = [_captures(rx, token, preserve_original) for rx in regs]
    heads: list[tuple[int, str] | None] = [next(g, None) for g in gens]
    caps: list[str] = []
    while True:
        best, best_i = None, -1
        for i, h in enumerate(heads):
            if h is not None and (best is None or h[0] < best[0]):
                best, best_i = h, i
        if best is None:
            break
        caps.append(best[1])
        heads[best_i] = next(gens[best_i], None)
    if preserve_original:
        return [token] + caps
    return caps if caps else [token]


def pattern_capture_group_filter(patterns: Sequence[str],
                                 preserve_original: bool = False):
    """CustomAnalyzer token-filter element (expansion — every emitted
    token stacks on the source position, posInc-0 discipline)."""
    from .custom import expand_filter
    regs = [re.compile(p) for p in patterns]
    return expand_filter(
        lambda t: pattern_capture_tokens(t, regs, preserve_original))


# ---------------------------------------------------------------------------
# ICUNormalizer2Filter (nfkc_cf approximation)
# ---------------------------------------------------------------------------

def nfkc_casefold(token: str) -> str:
    """ICUNormalizer2Filter (`analysis/icu/.../ICUNormalizer2Filter.
    java:55`, default Normalizer2 "nfkc_cf" COMPOSE): NFKC
    normalization + Unicode case folding. Python's unicodedata NFKC +
    str.casefold approximates ICU's fused nfkc_cf transform — the two
    differ on a handful of edge codepoints where ICU interleaves the
    passes (declared envelope; this repo ships no ICU dependency).
    Idempotent on its own output for the web-text alphabet, pinned in
    tests."""
    return unicodedata.normalize("NFKC", token).casefold()


def icu_normalizer_filter():
    from .custom import map_filter
    return map_filter(nfkc_casefold)
