"""Hindi analysis — orthographic normalization + light stemming.

Reference semantics (`lucene/analysis/common/src/java/org/apache/
lucene/analysis/hi/HindiNormalizer.java:41` and
`HindiStemmer.java:30`, implementing Ramanathan & Rao, "A Lightweight
Stemmer for Hindi", EACL 2003 workshop):

* normalize: dead-n (न + virama) → bindu; candrabindu → bindu; nukta
  deletion and nukta-composed consonants → base consonants; ZWJ/ZWNJ
  and virama deleted; chandra/short vowel signs → standard; long
  independent and dependent vowels → short.
* stem: one suffix strip, longest tier first — 5/4/3/2/1-akshara
  suffix sets with the reference's length guards (len > suffix+1).

`hindi_analyzer()` assembles the HindiAnalyzer-shaped chain
(`hi/HindiAnalyzer.java:107`: LowerCase → DecimalDigit → IndicNorm →
HindiNorm → Stop → Stemmer) as CustomAnalyzer filters.
"""

from __future__ import annotations

_VIRAMA = "्"
_HI_DELETE = {ord(c): None for c in ("़", "‌", "‍",
                                     _VIRAMA)}
_HI_MAP = str.maketrans({
    "ँ": "ं",            # candrabindu → bindu
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",   # nukta consonants
    "ॅ": "े", "ॆ": "े",   # chandra/short e signs
    "ॉ": "ो", "ॊ": "ो",   # chandra/short o signs
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",   # long → short indep.
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
})


def hindi_normalize(token: str) -> str:
    # dead n (न + virama) → bindu, BEFORE the general virama delete
    s = token.replace("न" + _VIRAMA, "ं")
    return s.translate(_HI_MAP).translate(_HI_DELETE)


_HI_SUF5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा",
            "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी",
            "ेंगी", "एंगे", "ेंगे", "ूंगी", "ूंगा",
            "ातीं", "नाओं", "नाएं", "ताओं", "ताएं",
            "ियाँ", "ियों", "ियां")
_HI_SUF3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा",
            "ोगी", "ोगे", "ाने", "ाना", "ाते", "ाती",
            "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
            "ुआं")
_HI_SUF2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी",
            "ना", "ते", "ीं", "ती", "ता", "ाँ", "ां",
            "ों", "ें")
_HI_SUF1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(token: str) -> str:
    """One strip, longest tier first (Ramanathan & Rao 2003)."""
    n = len(token)
    for tier, sufs in ((5, _HI_SUF5), (4, _HI_SUF4), (3, _HI_SUF3),
                       (2, _HI_SUF2), (1, _HI_SUF1)):
        if n > tier + 1 and token.endswith(sufs):
            return token[:n - tier]
    return token


def _devanagari_tokenize(text: str):
    """Whitespace tokenizer: the standard chain's regex treats
    Devanagari combining signs as breaks; Hindi words must stay
    whole (the reference tokenizes with StandardTokenizer, whose
    UAX#29 keeps combining marks attached)."""
    return (text or "").split()


def hindi_analyzer(stop_words=(), stem_exclusions=()):
    """HindiAnalyzer-shaped chain (`hi/HindiAnalyzer.java:107`);
    stop words are matched POST-normalization, like the reference's
    normalized stopword file."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    from .misc_filters import fold_decimal_digits
    stops = frozenset(hindi_normalize(w.lower()) for w in stop_words)
    excl = frozenset(stem_exclusions)

    def stem(t):
        return t if t in excl else hindi_stem(t)
    return CustomAnalyzer(
        tokenizer=_devanagari_tokenize,
        token_filters=(
            map_filter(str.lower),
            map_filter(fold_decimal_digits),
            map_filter(hindi_normalize),
            stop_filter(stops),
            map_filter(stem)))
