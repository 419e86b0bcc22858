"""CJKBigramFilter — bigram CJK scripts, pass everything else through.

Reference: `lucene/analysis/common/src/java/org/apache/lucene/analysis/
cjk/CJKBigramFilter.java:56` (+ `CJKAnalyzer.java`): characters of
consecutive tokens typed HAN / HIRAGANA / KATAKANA / HANGUL (each
individually enableable) accumulate in a buffer; a non-CJK or
disabled-script token flushes it. A flushed buffer of n ≥ 2 chars
emits the n−1 overlapping bigrams (`<DOUBLE>`); a lone char emits a
unigram (`<SINGLE>`); with ``output_unigrams=True`` every buffered
char ALSO emits as a unigram beside the bigrams (the combined
unigram+bigram posture). Mixed-script tokens (e.g. "한국abc") are
typed ALPHANUM by StandardTokenizer and pass through unmodified —
the javadoc-documented behavior.

This restatement works over this engine's token stream, where the
tokenizer (`analysis/tokenizer.py`) emits Han ideographs one per
token, kana as runs, and Hangul inside the alphanumeric branch: a
token whose every char belongs to one enabled script contributes its
chars to the buffer, so a kana RUN token contributes the same char
sequence Lucene's per-char tokens would.

Spark shape: ``cjk_bigram_expr`` is the codegen path — CJK text runs
(maximal spans of enabled-script chars, exactly the spans whose tokens
would share one buffer) extracted with regexp_extract_all, bigrammed
with transform(sequence(...), substring), all JVM-side; the Python
chain version exists for CustomAnalyzer composition and as the
differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL_SCRIPTS = HAN | HIRAGANA | KATAKANA | HANGUL

# script ranges matching the tokenizer's envelope (BMP; extensions
# beyond ext-A documented out of envelope in analysis/tokenizer.py)
_RANGES = {
    HAN: (("一", "鿿"), ("㐀", "䶿")),
    HIRAGANA: (("぀", "ゟ"),),
    KATAKANA: (("゠", "ヿ"),),
    HANGUL: (("가", "힣"),),
}


def _script_of(ch: str) -> int:
    for flag, ranges in _RANGES.items():
        for lo, hi in ranges:
            if lo <= ch <= hi:
                return flag
    return 0


def _token_script(tok: str, flags: int) -> int:
    """Non-zero iff EVERY char of the token belongs to one enabled CJK
    script-set member (mixed-script tokens stay ALPHANUM → 0)."""
    seen = 0
    for ch in tok:
        sc = _script_of(ch)
        if sc == 0 or not (sc & flags):
            return 0
        seen |= sc
    return seen


def cjk_bigrams(tokens: list[str], flags: int = ALL_SCRIPTS,
                output_unigrams: bool = False,
                offsets: list[tuple[int, int]] | None = None) -> list[str]:
    """Token-chain form (CJKBigramFilter.incrementToken semantics).

    ``offsets`` — per-token (start, end) char offsets; a CJK token
    whose start != the previous CJK token's end clears the buffer
    first (the reference's unaligned-offset flush at
    CJKBigramFilter.java:188 — "イイ 漢" does NOT bigram across the
    space). Without offsets every consecutive pair is treated as
    aligned."""
    out: list[str] = []
    buf: list[str] = []
    last_end: int | None = None

    def flush():
        if not buf:
            return
        if len(buf) == 1 and not output_unigrams:
            out.append(buf[0])          # lone char → unigram form
        else:
            if output_unigrams:
                # reference interleaves unigram before the bigram it
                # starts; order here follows buffer position
                for i in range(len(buf) - 1):
                    out.append(buf[i])
                    out.append(buf[i] + buf[i + 1])
                out.append(buf[-1])
            else:
                for i in range(len(buf) - 1):
                    out.append(buf[i] + buf[i + 1])
        buf.clear()

    for i, tok in enumerate(tokens):
        if _token_script(tok, flags):
            if (offsets is not None and last_end is not None
                    and offsets[i][0] != last_end):
                flush()
            buf.extend(tok)
            if offsets is not None:
                last_end = offsets[i][1]
        else:
            flush()
            last_end = None
            out.append(tok)
    flush()
    return out


def cjk_bigram_tokenizer(flags: int = ALL_SCRIPTS,
                         output_unigrams: bool = False):
    """Drop-in ``tokenizer=`` for CustomAnalyzer (the CJKAnalyzer
    chain shape: StandardTokenizer → CJKBigramFilter) — offsets are
    consumed here, before the chain's (token, position) stream."""
    from .tokenizer import tokenize_raw_spans

    def run(text: str) -> list[str]:
        spans = tokenize_raw_spans(text)
        return cjk_bigrams([t for t, _, _ in spans], flags,
                           output_unigrams,
                           offsets=[(s, e) for _, s, e in spans])
    return run


def _char_class(flags: int) -> str:
    parts = []
    for flag, ranges in _RANGES.items():
        if flag & flags:
            for lo, hi in ranges:
                parts.append(f"{lo}-{hi}")
    return "".join(parts)


def cjk_bigram_expr(col: Column | str, flags: int = ALL_SCRIPTS,
                    output_unigrams: bool = False) -> Column:
    """Codegen path: array of the CJK bigram/unigram tokens of a raw
    text column (non-CJK tokens are the normal chain's job; a maximal
    enabled-script char run == one reference buffer)."""
    c = F.col(col) if isinstance(col, str) else col
    if flags & HANGUL:
        # a Hangul sub-run touching a Latin/digit char belongs to a
        # mixed ALPHANUM token (the "한국abc" javadoc case) — strip it
        # so it neither bigrams nor stitches its neighbors together
        c = F.regexp_replace(c, "(?<=[0-9A-Za-z_])[가-힣]+", "")
        c = F.regexp_replace(c, "[가-힣]+(?=[0-9A-Za-z_])", "")
    runs = F.regexp_extract_all(
        c, F.lit(f"([{_char_class(flags)}]+)"), 1)
    return F.flatten(F.transform(
        runs, lambda r: _per_run_col(r, output_unigrams)))


def _per_run_col(r: Column, output_unigrams: bool) -> Column:
    """Per-run CASE: 1 char → unigram; n chars → the n−1 bigrams,
    optionally interleaved with the n unigrams (reference order:
    each unigram precedes the bigram it starts)."""
    one = F.length(r) == 1
    n = F.length(r)
    if output_unigrams:
        uni_bi = F.flatten(F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.array(r.substr(i, F.lit(1)), r.substr(i, F.lit(2)))))
        both = F.concat(uni_bi, F.array(r.substr(n, F.lit(1))))
        return F.when(one, F.array(r)).otherwise(both)
    bigrams = F.transform(F.sequence(F.lit(1), n - 1),
                          lambda i: r.substr(i, F.lit(2)))
    return F.when(one, F.array(r)).otherwise(bigrams)
