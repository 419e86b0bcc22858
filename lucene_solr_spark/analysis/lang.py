"""French / German web-text analysis: elision + light stemming.

Reference semantics (restated from the published algorithms, not the
Java source):

* ElisionFilter (`analysis/util/ElisionFilter.java:38`): strip a
  leading article before the FIRST apostrophe (``'`` or U+2019) when
  the prefix is in the article set — "l'avion" → "avion". The French
  default article set is `fr/FrenchAnalyzer.java:61` (l, m, t, qu, n,
  s, j, d, c, jusqu, quoiqu, lorsqu, puisqu; matched lowercase).
* FrenchMinimalStemmer (`fr/FrenchMinimalStemmer.java:24`) — the
  minimal French stemmer of Savoy, "A stemming procedure and stopword
  list for general French corpora" (JASIS 1999): plural/feminine
  endings -x/-s/-r/-e/-é plus double-consonant collapse, words ≥ 6
  chars only.
* GermanLightStemmer (`de/GermanLightStemmer.java:35`) — the UniNE
  light German stemmer of Savoy/Jacques, CLEF 2003-2005: fold umlauts
  and accents to base vowels, then two suffix-strip steps
  (-ern/-em/-en/-er/-es/-e/-s after a valid st-ending, then
  -est/-er/-en/-st).

Spark shape: all three are 1:1 token rewrites — CustomAnalyzer
``map_filter`` components for indexing, plus codegen expr twins
(`elision_expr`) where the rewrite is regular. The stemmers are tiny
pure functions (same class as `analysis/en.py` Porter) usable from
any chain; `french_light_analyzer()` / `german_light_analyzer()`
assemble the FrenchAnalyzer/GermanAnalyzer-shaped chains
(`fr/FrenchAnalyzer.java:136-152`, `de/GermanAnalyzer.java:126-137`)
with caller-supplied stop/exclusion sets (the reference's
french_stop.txt / german_stop.txt snowball lists ship with a
deployment, not the engine).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, functions as F

FRENCH_ELISION_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"])

_APOSTROPHES = ("'", "’")


def elide(token: str,
          articles: frozenset[str] = FRENCH_ELISION_ARTICLES) -> str:
    """Strip ``<article>'`` off the token front (first apostrophe only,
    article matched lowercase — CharArraySet ignoreCase discipline)."""
    idx = -1
    for i, ch in enumerate(token):
        if ch in _APOSTROPHES:
            idx = i
            break
    if idx >= 0 and token[:idx].lower() in articles:
        return token[idx + 1:]
    return token


def elision_expr(col: Column | str,
                 articles: Iterable[str] = FRENCH_ELISION_ARTICLES) -> Column:
    """Codegen twin over a token-array column: one regexp_replace per
    token, fused into the carrying projection."""
    c = F.col(col) if isinstance(col, str) else col
    alts = "|".join(sorted(articles, key=len, reverse=True))
    pat = f"(?i)^({alts})['’]"
    return F.transform(c, lambda t: F.regexp_replace(t, pat, ""))


def french_minimal_stem(token: str) -> str:
    """FrenchMinimalStemmer (Savoy 1999): ≥6-char words only."""
    s = token
    n = len(s)
    if n < 6:
        return s
    if s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u":
            return s[:n - 2] + "l"
        return s[:n - 1]
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":            # é
        n -= 1
    if n >= 2 and s[n - 1] == s[n - 2] and s[n - 1].isalpha():
        n -= 1
    return s[:n]


_DE_FOLD = str.maketrans({
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
})

_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(token: str) -> str:
    """UniNE light German stemmer (Savoy, CLEF 2003): vowel fold, then
    two suffix passes."""
    s = token.translate(_DE_FOLD)
    n = len(s)
    # step 1
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_ENDING:
        n -= 1
    s = s[:n]
    # step 2
    if n > 5 and s.endswith("est"):
        n -= 3
    elif n > 4 and (s.endswith("er") or s.endswith("en")):
        n -= 2
    elif n > 4 and s.endswith("st") and s[n - 3] in _DE_ST_ENDING:
        n -= 2
    return s[:n]


def french_light_analyzer(stop_words: Iterable[str] = (),
                          stem_exclusions: Iterable[str] = ()):
    """FrenchAnalyzer-shaped chain (`fr/FrenchAnalyzer.java:136`):
    Elision → LowerCase → Stop → (exclusions) → minimal stem. The
    reference default uses FrenchLightStemFilter; the minimal stemmer
    is its conservative sibling from the same paper — declared
    envelope."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    stops = frozenset(w.lower() for w in stop_words)
    excl = frozenset(w.lower() for w in stem_exclusions)

    def stem(t):
        return t if t in excl else french_minimal_stem(t)
    return CustomAnalyzer(token_filters=(
        map_filter(elide),
        map_filter(str.lower),
        stop_filter(stops),
        map_filter(stem)))


def german_light_analyzer(stop_words: Iterable[str] = (),
                          stem_exclusions: Iterable[str] = ()):
    """GermanAnalyzer-shaped chain (`de/GermanAnalyzer.java:126`):
    LowerCase → Stop → (exclusions) → light stem."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    stops = frozenset(w.lower() for w in stop_words)
    excl = frozenset(w.lower() for w in stem_exclusions)

    def stem(t):
        return t if t in excl else german_light_stem(t)
    return CustomAnalyzer(token_filters=(
        map_filter(str.lower),
        stop_filter(stops),
        map_filter(stem)))


# ---------------------------------------------------------------------------
# Spanish / Italian / Portuguese light stemmers (Savoy, UniNE CLEF)
# ---------------------------------------------------------------------------

_ES_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
})


def spanish_light_stem(token: str) -> str:
    """SpanishLightStemmer (`es/SpanishLightStemmer.java:48`, Savoy
    CLEF): accent fold, then plural/vowel endings; < 5 chars pass."""
    if len(token) < 5:
        return token
    s = token.translate(_ES_FOLD)
    n = len(s)
    c = s[n - 1]
    if c in "oae":
        return s[:n - 1]
    if c == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return s[:n - 2]
        if s[n - 2] == "e" and s[n - 3] == "c":
            return s[:n - 3] + "z"
        if s[n - 2] in "oae":
            return s[:n - 2]
    return s


def italian_light_stem(token: str) -> str:
    """ItalianLightStemmer (`it/ItalianLightStemmer.java:48`): accent
    fold, then final-vowel endings with i/h doubling; < 6 chars pass."""
    if len(token) < 6:
        return token
    s = token.translate(_ES_FOLD)
    n = len(s)
    c, p = s[n - 1], s[n - 2]
    if c == "e":
        return s[:n - 2] if p in "ih" else s[:n - 1]
    if c == "i":
        return s[:n - 2] if p in "hi" else s[:n - 1]
    if c in "ao":
        return s[:n - 2] if p == "i" else s[:n - 1]
    return s


_PT_FOLD = dict(zip("àáâäãòóôöõèéêëùúûüìíîïç",
                    "aaaaaooooo" "eeee" "uuuu" "iiii" "c"))


def _ends(s: list, n: int, suf: str) -> bool:
    return n >= len(suf) and "".join(s[n - len(suf):n]) == suf


def _pt_remove_suffix(s: list, n: int) -> int:
    if n > 4 and _ends(s, n, "es") and s[n - 3] in "rslz":
        return n - 2
    if n > 3 and _ends(s, n, "ns"):
        s[n - 2] = "m"
        return n - 1
    if n > 4 and (_ends(s, n, "eis") or _ends(s, n, "éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "ais"):
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "is"):
        s[n - 1] = "l"
        return n
    if n > 3 and (_ends(s, n, "ões") or _ends(s, n, "ães")):
        n -= 1
        s[n - 2] = "ã"
        s[n - 1] = "o"
        return n
    if n > 6 and _ends(s, n, "mente"):
        return n - 5
    if n > 3 and s[n - 1] == "s":
        return n - 1
    return n


def _pt_norm_feminine(s: list, n: int) -> int:
    if n > 7 and (_ends(s, n, "inha") or _ends(s, n, "iaca")
                  or _ends(s, n, "eira")):
        s[n - 1] = "o"
        return n
    if n > 6:
        if (_ends(s, n, "osa") or _ends(s, n, "ica") or _ends(s, n, "ida")
                or _ends(s, n, "ada") or _ends(s, n, "iva")
                or _ends(s, n, "ama")):
            s[n - 1] = "o"
            return n
        if _ends(s, n, "ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return n - 1
        if _ends(s, n, "ora"):
            return n - 1
        if _ends(s, n, "esa"):
            s[n - 3] = "ê"
            return n - 1
        if _ends(s, n, "na"):
            s[n - 1] = "o"
            return n
    return n


def portuguese_light_stem(token: str) -> str:
    """PortugueseLightStemmer (`pt/PortugueseLightStemmer.java:47`,
    Savoy CLEF): plural suffix removal → feminine normalization →
    final-vowel strip → accent/ç fold (fold LAST — the rules compare
    accented characters); < 4 chars pass."""
    if len(token) < 4:
        return token
    s = list(token)
    n = _pt_remove_suffix(s, len(s))
    if n > 3 and s[n - 1] == "a":
        n = _pt_norm_feminine(s, n)
    if n > 4 and s[n - 1] in "eao":
        n -= 1
    return "".join(_PT_FOLD.get(ch, ch) for ch in s[:n])


def _light_analyzer(stem, stop_words=(), stem_exclusions=()):
    from .custom import CustomAnalyzer, map_filter, stop_filter
    stops = frozenset(w.lower() for w in stop_words)
    excl = frozenset(w.lower() for w in stem_exclusions)

    def run(t):
        return t if t in excl else stem(t)
    return CustomAnalyzer(token_filters=(
        map_filter(str.lower), stop_filter(stops), map_filter(run)))


def spanish_light_analyzer(stop_words=(), stem_exclusions=()):
    """SpanishAnalyzer-shaped chain (`es/SpanishAnalyzer.java:119`)."""
    return _light_analyzer(spanish_light_stem, stop_words, stem_exclusions)


def italian_light_analyzer(stop_words=(), stem_exclusions=()):
    """ItalianAnalyzer-shaped chain (elision set omitted — compose
    map_filter(elide) with an Italian article set for full parity)."""
    return _light_analyzer(italian_light_stem, stop_words, stem_exclusions)


def portuguese_light_analyzer(stop_words=(), stem_exclusions=()):
    """PortugueseAnalyzer-shaped chain (`pt/PortugueseAnalyzer.java`)."""
    return _light_analyzer(portuguese_light_stem, stop_words,
                           stem_exclusions)


# ---------------------------------------------------------------------------
# Russian light stemmer (Savoy, UniNE CLEF)
# ---------------------------------------------------------------------------

_RU_CASE4 = ("иями", "оями")
_RU_CASE3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
             "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_CASE2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию",
             "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей",
             "ём", "ев", "ий", "им", "ое", "ой", "ом", "ов", "ые",
             "ый", "ым", "ми")
_RU_CASE1 = frozenset("аеиоуйыяь")


def russian_light_stem(token: str) -> str:
    """RussianLightStemmer (`ru/RussianLightStemmer.java:47`, Savoy
    CLEF): case-ending removal (4/3/2/1-char tiers with length
    guards), then normalize (-ь/-и strip, -нн collapse)."""
    s = token
    n = len(s)
    # removeCase
    if n > 6 and s[n - 4:n] in _RU_CASE4:
        n -= 4
    elif n > 5 and s[n - 3:n] in _RU_CASE3:
        n -= 3
    elif n > 4 and s[n - 2:n] in _RU_CASE2:
        n -= 2
    elif n > 3 and s[n - 1] in _RU_CASE1:
        n -= 1
    # normalize
    if n > 3:
        c = s[n - 1]
        if c in "ьи":
            n -= 1
        elif c == "н" and s[n - 2] == "н":
            n -= 1
    return s[:n]


def russian_light_analyzer(stop_words=(), stem_exclusions=()):
    """RussianAnalyzer-shaped chain (`ru/RussianAnalyzer.java:107`)."""
    return _light_analyzer(russian_light_stem, stop_words,
                           stem_exclusions)


# ---------------------------------------------------------------------------
# Greek lowercase fold
# ---------------------------------------------------------------------------

_EL_MAP = str.maketrans({
    "ς": "σ",                                 # final sigma → sigma
    "Ά": "α", "ά": "α",                  # alpha + tonos
    "Έ": "ε", "έ": "ε",                  # epsilon + tonos
    "Ή": "η", "ή": "η",                  # eta + tonos
    "Ί": "ι", "Ϊ": "ι", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",                  # omicron + tonos
    "Ώ": "ω", "ώ": "ω",                  # omega + tonos
    "Ϛ": "ς",                                 # reserved U+03A2 analog
})


def greek_lowercase(token: str) -> str:
    """GreekLowerCaseFilter (`el/GreekLowerCaseFilter.java:31`): final
    sigma → sigma, tonos/dialytika vowels folded to base, then plain
    lowercase — so "ΚΑΛΌΣ", "καλός" and "καλοσ" meet."""
    return token.lower().translate(_EL_MAP)


def greek_analyzer(stop_words=()):
    """GreekAnalyzer-shaped chain (`el/GreekAnalyzer.java:84`:
    GreekLowerCase → Stop; the reference's GreekStemmer is a larger
    automaton left out of envelope — normalization is what dedups the
    web-corpus surface forms)."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    return CustomAnalyzer(token_filters=(
        map_filter(greek_lowercase),
        stop_filter(frozenset(greek_lowercase(w) for w in stop_words))))


# ---------------------------------------------------------------------------
# Turkish lowercase (dotted / dotless i)
# ---------------------------------------------------------------------------

def turkish_lowercase(token: str) -> str:
    """TurkishLowerCaseFilter (`tr/TurkishLowerCaseFilter.java:34`):
    Turkish has two i's — İ (dotted capital) lowers to i, I (dotless
    capital) lowers to ı. Plain str.lower() gets BOTH wrong (İ → i +
    combining dot U+0307, I → i), so the special cases run first; a
    combining-above-dot following an i is consumed (the filter's
    delete of COMBINING_DOT_ABOVE after I)."""
    out = []
    i, n = 0, len(token)
    while i < n:
        ch = token[i]
        if ch == "İ":
            out.append("i")
        elif ch == "I":
            # I + combining-dot-above is İ's decomposition → i (dot
            # consumed); bare I → dotless ı (TurkishLowerCaseFilter
            # isBeforeDot lookahead)
            if i + 1 < n and token[i + 1] == "̇":
                out.append("i")
                i += 1
            else:
                out.append("ı")
        else:
            out.append(ch.lower())
        i += 1
    return "".join(out)


def turkish_analyzer(stop_words=(), stem_exclusions=()):
    """TurkishAnalyzer-shaped chain (`tr/TurkishAnalyzer.java:93` minus
    the Snowball TurkishStemmer — out of envelope, documented; the
    lowercase fold is the part plain Spark `lower()` gets wrong)."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    stops = frozenset(turkish_lowercase(w) for w in stop_words)
    return CustomAnalyzer(token_filters=(
        map_filter(turkish_lowercase), stop_filter(stops)))


# ---------------------------------------------------------------------------
# Norwegian / Swedish light stemmers (Savoy, UniNE CLEF)
# ---------------------------------------------------------------------------

def norwegian_light_stem(token: str, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemmer (`no/NorwegianLightStemmer.java:70`):
    genitive -s, then suffix tiers; Bokmål and Nynorsk endings
    selectable exactly as the reference's flags."""
    if not (bokmaal or nynorsk):
        raise ValueError("at least one of bokmaal/nynorsk")
    s = token
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    w = s[:n]
    if n > 7 and ((bokmaal and w.endswith(("heter", "heten")))
                  or (nynorsk and w.endswith("heita"))):
        return w[:n - 5]
    if n > 8 and nynorsk and w.endswith(("heiter", "leiken", "leikar")):
        return w[:n - 6]
    if n > 5 and (w.endswith("dom") or (bokmaal and w.endswith("het"))):
        return w[:n - 3]
    if n > 6 and nynorsk and w.endswith(("heit", "semd", "leik")):
        return w[:n - 4]
    if n > 7 and w.endswith(("elser", "elsen")):
        return w[:n - 5]
    if n > 6 and ((bokmaal and w.endswith(("ende", "este", "eren")))
                  or (nynorsk and w.endswith(("ande", "aste", "aren")))
                  or w.endswith("else")):
        return w[:n - 4]
    if n > 5 and ((bokmaal and w.endswith(("ere", "est")))
                  or (nynorsk and w.endswith(("are", "ast", "ane")))
                  or w.endswith("ene")):
        return w[:n - 3]
    if n > 4 and (w.endswith(("er", "en", "et", "te"))
                  or (nynorsk and w.endswith("ar"))
                  or (bokmaal and w.endswith("st"))):
        return w[:n - 2]
    if n > 3 and w[n - 1] in "aen":
        return w[:n - 1]
    return w


def swedish_light_stem(token: str) -> str:
    """SwedishLightStemmer (`sv/SwedishLightStemmer.java:47`)."""
    s = token
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    w = s[:n]
    if n > 7 and w.endswith(("elser", "heten")):
        return w[:n - 5]
    if n > 6 and w.endswith(("arne", "erna", "ande", "else", "aste",
                             "orna", "aren")):
        return w[:n - 4]
    if n > 5 and w.endswith(("are", "ast", "het")):
        return w[:n - 3]
    if n > 4 and w.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return w[:n - 2]
    if n > 3 and w[n - 1] in "taen":
        return w[:n - 1]
    return w


def norwegian_light_analyzer(stop_words=(), stem_exclusions=(),
                             bokmaal: bool = True, nynorsk: bool = False):
    """NorwegianAnalyzer-shaped chain."""
    def stem(t):
        return norwegian_light_stem(t, bokmaal, nynorsk)
    return _light_analyzer(stem, stop_words, stem_exclusions)


def swedish_light_analyzer(stop_words=(), stem_exclusions=()):
    """SwedishAnalyzer-shaped chain."""
    return _light_analyzer(swedish_light_stem, stop_words,
                           stem_exclusions)


# ---------------------------------------------------------------------------
# Czech light stemmer (Dolamic & Savoy)
# ---------------------------------------------------------------------------

_CZ_CASE3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte",
             "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
             "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi",
             "ými")
_CZ_CASE2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us",
             "ým", "mi", "ou")
_CZ_VOWELS = frozenset("aeiouůyáéíýě")


def czech_stem(token: str) -> str:
    """CzechStemmer (`cz/CzechStemmer.java:37`, Dolamic & Savoy light
    Czech): case endings (5/4/3/2/1 tiers) → possessive -ov/-in/-ův →
    palatalization normalize (čt→ck, št→sk, c/č→k, z/ž→h, e-insertion
    collapse, ů→o)."""
    s = token
    n = len(s)
    # removeCase
    if n > 7 and s.endswith("atech"):
        n -= 5
    elif n > 6 and s.endswith(("ětem", "etem", "atům")):
        n -= 4
    elif n > 5 and s[n - 3:n] in _CZ_CASE3:
        n -= 3
    elif n > 4 and s[n - 2:n] in _CZ_CASE2:
        n -= 2
    elif n > 3 and s[n - 1] in _CZ_VOWELS:
        n -= 1
    s = s[:n]
    # removePossessives
    if n > 5 and s.endswith(("ov", "in", "ův")):
        n -= 2
        s = s[:n]
    if n == 0:
        return s
    # normalize
    if s.endswith("čt"):
        return s[:n - 2] + "ck"
    if s.endswith("št"):
        return s[:n - 2] + "sk"
    c = s[n - 1]
    if c in "cč":
        return s[:n - 1] + "k"
    if c in "zž":
        return s[:n - 1] + "h"
    if n > 1 and s[n - 2] == "e":
        return s[:n - 2] + s[n - 1]      # e-insertion collapse
    if n > 2 and s[n - 2] == "ů":
        return s[:n - 2] + "o" + s[n - 1]
    return s


def czech_analyzer(stop_words=(), stem_exclusions=()):
    """CzechAnalyzer-shaped chain (`cz/CzechAnalyzer.java:101`)."""
    return _light_analyzer(czech_stem, stop_words, stem_exclusions)


# ---------------------------------------------------------------------------
# Bulgarian light stemmer (Nakov 2003 / BulStem)
# ---------------------------------------------------------------------------

def _bg_remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:n - 3]
    if n > 5 and s.endswith(("ът", "то", "те", "та", "ия")):
        return s[:n - 2]
    if n > 4 and s.endswith("ят"):
        return s[:n - 2]
    return s


def _bg_remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:n - 3]
        if s.endswith("ове"):
            return s[:n - 3]
        if s.endswith("еве"):
            return s[:n - 3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:n - 3]
        if s.endswith("та"):
            return s[:n - 2]
        if s.endswith("ци"):
            return s[:n - 2] + "к"
        if s.endswith("зи"):
            return s[:n - 2] + "г"
        if s[n - 3] == "е" and s[n - 1] == "и":
            return s[:n - 3] + "я" + s[n - 2]
    if n > 4:
        if s.endswith("си"):
            return s[:n - 2] + "х"
        if s.endswith("и"):
            return s[:n - 1]
    return s


def bulgarian_stem(token: str) -> str:
    """BulgarianStemmer (`bg/BulgarianStemmer.java:30`, the light
    stemmer of Nakov's BulStem): -ища, definite articles, plural forms
    with palatalization reversals (ци→к, зи→г, си→х, еве→й, еXи→яX),
    final я/а/о/е, -ен → -н, ъN → N."""
    s = token
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _bg_remove_article(s)
    s = _bg_remove_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s.endswith(("а", "о", "е")):
            s = s[:-1]
    n = len(s)
    if n > 4 and s.endswith("ен"):
        s = s[:n - 2] + "н"
        n -= 1
    if n > 5 and s[n - 2] == "ъ":
        s = s[:n - 2] + s[n - 1]
    return s


def bulgarian_analyzer(stop_words=(), stem_exclusions=()):
    """BulgarianAnalyzer-shaped chain (`bg/BulgarianAnalyzer.java:104`)."""
    return _light_analyzer(bulgarian_stem, stop_words, stem_exclusions)


# ---------------------------------------------------------------------------
# Latvian stemmer (Samson 2008 light)
# ---------------------------------------------------------------------------

# (affix, vowel-count threshold, palatalizes) — order matters
_LV_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
]

_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    """The reference's unpalatalize over the truncated stem, peeking
    at the first removed character (s[len]) exactly as the in-place
    buffer allows (`lv/LatvianStemmer.java:73`)."""
    if removed_first == "u":
        if stem.endswith("kš"):
            return stem[:-1] + "st"      # kš+u → kst
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]
    for src, dst in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if stem.endswith(src):
            return stem[:-2] + dst
    if stem.endswith("č"):
        return stem[:-1] + "c"
    if stem.endswith("ļ"):
        return stem[:-1] + "l"
    if stem.endswith("ņ"):
        return stem[:-1] + "n"
    return stem


def latvian_stem(token: str) -> str:
    """LatvianStemmer (`lv/LatvianStemmer.java:36`, the light stemmer
    of Samson's thesis): ONE affix from the ordered table, gated by
    whole-word vowel count > affix-vc and stem length >= 3, with
    un-palatalization on the marked affixes."""
    nv = sum(1 for c in token if c in _LV_VOWELS)
    n = len(token)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and n >= len(affix) + 3 and token.endswith(affix):
            stem = token[:n - len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if pal else stem
    return token


def latvian_analyzer(stop_words=(), stem_exclusions=()):
    """LatvianAnalyzer-shaped chain (`lv/LatvianAnalyzer.java:101`)."""
    return _light_analyzer(latvian_stem, stop_words, stem_exclusions)


# ---------------------------------------------------------------------------
# Finnish light stemmer (Savoy, UniNE CLEF)
# ---------------------------------------------------------------------------

_FI_FOLD = str.maketrans({"ä": "a", "å": "a", "ö": "o"})
_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("kin"):
            return _fi_step1(s[:n - 3])
        if s.endswith("ko"):
            return _fi_step1(s[:n - 2])
    if n > 11:
        if s.endswith("dellinen"):
            return s[:n - 8]
        if s.endswith("dellisuus"):
            return s[:n - 9]
    return s


def _fi_step2(s: str) -> str:
    n = len(s)
    if n > 5:
        if s.endswith(("lla", "tse", "sti")):
            return s[:n - 3]
        if s.endswith("ni"):
            return s[:n - 2]
        if s.endswith("aa"):
            return s[:n - 1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:n - 4] + "s"
        if s.endswith("ntena"):
            return s[:n - 5] + "s"
        if s.endswith("tten"):
            return s[:n - 4]
        if s.endswith("eiden"):
            return s[:n - 5]
    if n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            return s[:n - 4]
        if s[n - 3] == "h" and s[n - 2] in _FI_VOWELS and s[n - 1] == "n":
            return s[:n - 3]
        if s.endswith("den"):
            return s[:n - 3] + "s"
        if s.endswith("ksen"):
            return s[:n - 4] + "s"
        if s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return s[:n - 3]
    if n > 5:
        if s.endswith(("na", "ne")):
            return s[:n - 2]
        if s.endswith("nei"):
            return s[:n - 3]
    if n > 4:
        if s.endswith(("ja", "ta")):
            return s[:n - 2]
        if s[n - 1] == "a":
            return s[:n - 1]
        if s[n - 1] == "n" and s[n - 2] in _FI_VOWELS:
            return s[:n - 2]
        if s[n - 1] == "n":
            return s[:n - 1]
    return s


def _fi_norm1(s: str) -> str:
    n = len(s)
    if n > 5 and s.endswith("hde"):
        s = s[:n - 3] + "ksi"             # falls through, like the loop
    n = len(s)
    if n > 4 and s.endswith(("ei", "at")):
        return s[:n - 2]
    if n > 3 and s[n - 1] in "tsjeai":
        return s[:n - 1]
    return s


def _fi_norm2(s: str) -> str:
    n = len(s)
    if n > 8 and s[n - 1] in "eou":
        s = s[:n - 1]
        n -= 1
    if n > 4:
        if s[n - 1] == "i":
            s = s[:n - 1]
            n -= 1
        if n > 4:
            # de-double k/p/t against the previous RETAINED char
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = "".join(out)
    return s


def finnish_light_stem(token: str) -> str:
    """FinnishLightStemmer (`fi/FinnishLightStemmer.java:47`, Savoy
    UniNE): ä/å/ö fold, particle recursion (-kin/-ko), derivational
    -dellinen/-dellisuus, case endings with s-substitutions
    (nnen/ntena/den/ksen → …s), hde→ksi, final-vowel trims, and k/p/t
    consonant de-doubling; < 4 chars pass."""
    if len(token) < 4:
        return token
    s = token.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))


def finnish_light_analyzer(stop_words=(), stem_exclusions=()):
    """FinnishAnalyzer-shaped chain."""
    return _light_analyzer(finnish_light_stem, stop_words,
                           stem_exclusions)
