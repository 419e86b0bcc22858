"""Arabic analysis — normalization + light stemming (Larkey 2002).

Reference semantics (`lucene/analysis/common/src/java/org/apache/
lucene/analysis/ar/ArabicNormalizer.java:43` and
`ArabicStemmer.java:55`, implementing Larkey/Ballesteros/Connell,
"Improving Stemming for Arabic Information Retrieval", SIGIR 2002):

* normalize: alef-madda/alef-hamza-above/alef-hamza-below → bare alef;
  dotless yeh → yeh; teh marbuta → heh; tatweel and the eight harakat
  (fathatan/dammatan/kasratan/fatha/damma/kasra/shadda/sukun) DELETED.
* stem: remove the FIRST matching prefix of [ال، وال، بال، كال، فال،
  لل، و] (single و requires ≥4 chars, the rest ≥ len(prefix)+2), then
  remove EACH matching suffix of [ها، ان، ات، ون، ين، يه، ية، ه، ة،
  ي] scanning the list once in order against the shrinking word
  (every suffix requires ≥2 chars to remain).

`arabic_light_analyzer()` assembles the ArabicAnalyzer-shaped chain
(`ar/ArabicAnalyzer.java:127`: LowerCase → Stop → Normalizer →
(exclusions) → Stemmer) as CustomAnalyzer filters — per-token pure
functions, usable in any chain.
"""

from __future__ import annotations

ALEF = "ا"
_NORM_MAP = str.maketrans({
    "آ": ALEF, "أ": ALEF, "إ": ALEF,   # alef variants
    "ى": "ي",                                # dotless yeh → yeh
    "ة": "ه",                                # teh marbuta → heh
})
_DELETE = "".join(["ـ",                           # tatweel
                   "ً", "ٌ", "ٍ",       # -tan marks
                   "َ", "ُ", "ِ",       # fatha/damma/kasra
                   "ّ", "ْ"])                # shadda/sukun
_DEL_MAP = {ord(c): None for c in _DELETE}

_PREFIXES = ["ال",             # al-
             "وال",       # wal-
             "بال",       # bal-
             "كال",       # kal-
             "فال",       # fal-
             "لل",             # lil-
             "و"]                   # wa-
_SUFFIXES = ["ها", "ان", "ات",
             "ون", "ين", "يه",
             "ية", "ه", "ة", "ي"]


def arabic_normalize(token: str) -> str:
    return token.translate(_NORM_MAP).translate(_DEL_MAP)


def arabic_stem(token: str) -> str:
    s = token
    for p in _PREFIXES:
        if len(p) == 1:
            if len(s) < 4:                 # wa- needs ≥3 after strip
                continue
        elif len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break                          # first match only
    for suf in _SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[:-len(suf)]
    return s


def arabic_light_analyzer(stop_words=(), stem_exclusions=()):
    """ArabicAnalyzer-shaped chain (`ar/ArabicAnalyzer.java:127`)."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    stops = frozenset(w.lower() for w in stop_words)
    excl = frozenset(stem_exclusions)

    def stem(t):
        return t if t in excl else arabic_stem(t)
    return CustomAnalyzer(token_filters=(
        map_filter(str.lower),
        stop_filter(stops),
        map_filter(arabic_normalize),
        map_filter(stem)))


# ---------------------------------------------------------------------------
# Persian (Farsi) — PersianNormalizer / PersianCharFilter
# ---------------------------------------------------------------------------

_FA_MAP = str.maketrans({
    "ی": "ي",     # farsi yeh → yeh
    "ے": "ي",     # yeh barree → yeh
    "ک": "ك",     # keheh → kaf
    "ۀ": "ه",     # heh+yeh → heh
    "ہ": "ه",     # heh goal → heh
    "ٔ": None,          # hamza above deleted
})


def persian_normalize(token: str) -> str:
    """PersianNormalizer (`fa/PersianNormalizer.java:36`): farsi
    yeh/yeh-barree → yeh, keheh → kaf, heh variants → heh, hamza-above
    deleted."""
    return token.translate(_FA_MAP)


def persian_char_normalize(text: str) -> str:
    """PersianCharFilter (`fa/PersianCharFilter.java:31`): zero-width
    non-joiner (U+200C) → space, so affixed forms tokenize apart."""
    return (text or "").replace("‌", " ")


def persian_analyzer(stop_words=()):
    """PersianAnalyzer-shaped chain (`fa/PersianAnalyzer.java:121`):
    ZWNJ char filter → LowerCase → decimal-digit fold → Arabic
    normalize → Persian normalize → Stop (no stemming — the reference
    relies on normalization + the stop set)."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    from .misc_filters import fold_decimal_digits
    stops = frozenset(stop_words)
    return CustomAnalyzer(
        char_filters=(persian_char_normalize,),
        token_filters=(map_filter(str.lower),
                       map_filter(fold_decimal_digits),
                       map_filter(arabic_normalize),
                       map_filter(persian_normalize),
                       stop_filter(stops)))


# ---------------------------------------------------------------------------
# Sorani Kurdish (ckb) — SoraniNormalizer / SoraniStemmer
# ---------------------------------------------------------------------------

import unicodedata as _ud


def sorani_normalize(token: str) -> str:
    """SoraniNormalizer (`ckb/SoraniNormalizer.java:43`): yeh variants
    → farsi yeh, kaf → keheh, heh+ZWNJ → ae, final heh → ae, teh
    marbuta → ae, heh-doachashmee → heh, initial reh → rreh,
    reh-above → rreh, tatweel/harakat and FORMAT codepoints deleted —
    the order-sensitive cases (ZWNJ lookbehind, final-heh) follow the
    reference's in-place scan."""
    # faithful port of the in-place scan: deletions shift the tail
    # left and i re-examines the shifted char; the final-heh rule
    # compares against the CURRENT length mid-scan, exactly like the
    # reference (so heh before a later-deleted diacritic stays heh)
    s = list(token)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in "يى":
            s[i] = "ی"
        elif ch == "ك":
            s[i] = "ک"
        elif ch == "‌":                    # ZWNJ
            if i > 0 and s[i - 1] == "ه":
                s[i - 1] = "ە"
            del s[i]
            continue
        elif ch == "ه":
            if i == len(s) - 1:
                s[i] = "ە"
        elif ch == "ة":
            s[i] = "ە"
        elif ch == "ھ":
            s[i] = "ه"
        elif ch == "ڒ":
            s[i] = "ڕ"
        elif ch == "ر":
            if i == 0:
                s[i] = "ڕ"
        elif ch in "ـًٌٍَُِّْ" or _ud.category(ch) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(token: str) -> str:
    """SoraniStemmer (`ckb/SoraniStemmer.java:30`): postposition
    (-دا/-نا/-ەوە) and possessive (-مان/-یان/-تان) strips, then ONE
    definite/indefinite/plural/demonstrative suffix via the
    reference's exact else-if ladder."""
    s = token
    n = len(s)
    if n > 5 and s.endswith("دا"):
        s = s[:n - 2]
    elif n > 4 and s.endswith("نا"):
        s = s[:n - 1]
    elif n > 6 and s.endswith("ەوە"):
        s = s[:n - 3]
    n = len(s)
    if n > 6 and s.endswith(("مان", "یان", "تان")):
        s = s[:n - 3]
        n -= 3
    if n > 6 and s.endswith("ێکی"):
        return s[:n - 3]
    if n > 7 and s.endswith("یەکی"):
        return s[:n - 4]
    if n > 5 and s.endswith("ێک"):
        return s[:n - 2]
    if n > 6 and s.endswith("یەک"):
        return s[:n - 3]
    if n > 6 and s.endswith("ەکە"):
        return s[:n - 3]
    if n > 5 and s.endswith("کە"):
        return s[:n - 2]
    if n > 7 and s.endswith("ەکان"):
        return s[:n - 4]
    if n > 6 and s.endswith("کان"):
        return s[:n - 3]
    if n > 7 and s.endswith("یانی"):
        return s[:n - 4]
    if n > 6 and s.endswith("انی"):
        return s[:n - 3]
    if n > 6 and s.endswith("یان"):
        return s[:n - 3]
    if n > 5 and s.endswith("ان"):
        return s[:n - 2]
    if n > 7 and s.endswith("یانە"):
        return s[:n - 4]
    if n > 6 and s.endswith("انە"):
        return s[:n - 3]
    if n > 5 and s.endswith(("ایە", "ەیە")):
        return s[:n - 2]
    if n > 4 and s.endswith("ە"):
        return s[:n - 1]
    if n > 4 and s.endswith("ی"):
        return s[:n - 1]
    return s


def sorani_analyzer(stop_words=(), stem_exclusions=()):
    """SoraniAnalyzer-shaped chain (`ckb/SoraniAnalyzer.java:101`:
    LowerCase → DecimalDigit → Normalizer → Stop → Stemmer)."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    from .misc_filters import fold_decimal_digits
    stops = frozenset(sorani_normalize(w.lower()) for w in stop_words)
    excl = frozenset(stem_exclusions)

    def stem(t):
        return t if t in excl else sorani_stem(t)
    return CustomAnalyzer(token_filters=(
        map_filter(str.lower),
        map_filter(fold_decimal_digits),
        map_filter(sorani_normalize),
        stop_filter(stops),
        map_filter(stem)))
