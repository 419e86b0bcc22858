"""Indonesian stemming — Tala (2003) / Asian, Williams & Tahaghoghi.

Reference semantics (`lucene/analysis/common/src/java/org/apache/
lucene/analysis/id/IndonesianStemmer.java:30`): inflectional particles
(-kah/-lah/-pun) and possessive pronouns (-ku/-mu/-nya) always strip;
derivational stemming removes a first-order prefix (meng-/meny-/men-/
mem-/me-/peng-/peny-/pen-/pem-/di-/ter-/ke- with the sound-change
rules meny+V → s…, pen+V → t…), then — only following the reference's
rule-fired control flow — a suffix (-kan/-an/-i guarded by which
prefix fired, the DISALLOWED-combination table) and a second-order
prefix (ber-/bel-/be-CerC/per-/pel-/pe-). Every removal requires the
word to keep more than 2 syllables (vowel count).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

_KE, _PENG, _DI, _MENG, _TER, _BER, _PE = 1, 2, 4, 8, 16, 32, 64


class _State:
    __slots__ = ("syll", "flags")

    def __init__(self, word: str):
        self.syll = sum(1 for c in word if c in _VOWELS)
        self.flags = 0


def _remove_particle(s: str, st: _State) -> str:
    if s.endswith(("kah", "lah", "pun")):
        st.syll -= 1
        return s[:-3]
    return s


def _remove_possessive(s: str, st: _State) -> str:
    if s.endswith(("ku", "mu")):
        st.syll -= 1
        return s[:-2]
    if s.endswith("nya"):
        st.syll -= 1
        return s[:-3]
    return s


def _first_order_prefix(s: str, st: _State) -> str:
    n = len(s)
    if s.startswith("meng"):
        st.flags |= _MENG
        st.syll -= 1
        return s[4:]
    if s.startswith("meny") and n > 4 and s[4] in _VOWELS:
        st.flags |= _MENG
        st.syll -= 1
        return "s" + s[4:]          # meny+V → s…
    if s.startswith(("men", "mem")):
        st.flags |= _MENG
        st.syll -= 1
        return s[3:]
    if s.startswith("me"):
        st.flags |= _MENG
        st.syll -= 1
        return s[2:]
    if s.startswith("peng"):
        st.flags |= _PENG
        st.syll -= 1
        return s[4:]
    if s.startswith("peny") and n > 4 and s[4] in _VOWELS:
        st.flags |= _PENG
        st.syll -= 1
        return "s" + s[4:]
    if s.startswith("peny"):
        st.flags |= _PENG
        st.syll -= 1
        return s[4:]
    if s.startswith("pen") and n > 3 and s[3] in _VOWELS:
        st.flags |= _PENG
        st.syll -= 1
        return "t" + s[3:]          # pen+V → t…
    if s.startswith(("pen", "pem")):
        st.flags |= _PENG
        st.syll -= 1
        return s[3:]
    if s.startswith("di"):
        st.flags |= _DI
        st.syll -= 1
        return s[2:]
    if s.startswith("ter"):
        st.flags |= _TER
        st.syll -= 1
        return s[3:]
    if s.startswith("ke"):
        st.flags |= _KE
        st.syll -= 1
        return s[2:]
    return s


def _second_order_prefix(s: str, st: _State) -> str:
    n = len(s)
    if s.startswith("ber"):
        st.flags |= _BER
        st.syll -= 1
        return s[3:]
    if s == "belajar":
        st.flags |= _BER
        st.syll -= 1
        return s[3:]
    if (s.startswith("be") and n > 4 and s[2] not in _VOWELS
            and s[3] == "e" and s[4] == "r"):
        st.flags |= _BER
        st.syll -= 1
        return s[2:]
    if s.startswith("per"):
        st.syll -= 1
        return s[3:]
    if s == "pelajar":
        st.syll -= 1
        return s[3:]
    if s.startswith("pe"):
        st.flags |= _PE
        st.syll -= 1
        return s[2:]
    return s


def _suffix(s: str, st: _State) -> str:
    f = st.flags
    if s.endswith("kan") and not f & (_KE | _PENG | _PE):
        st.syll -= 1
        return s[:-3]
    if s.endswith("an") and not f & (_DI | _MENG | _TER):
        st.syll -= 1
        return s[:-2]
    if (s.endswith("i") and not s.endswith("si")
            and not f & (_BER | _KE | _PENG)):
        st.syll -= 1
        return s[:-1]
    return s


def indonesian_stem(token: str, stem_derivational: bool = True) -> str:
    st = _State(token)
    s = token
    if st.syll > 2:
        s = _remove_particle(s, st)
    if st.syll > 2:
        s = _remove_possessive(s, st)
    if stem_derivational:
        old = len(s)
        if st.syll > 2:
            s = _first_order_prefix(s, st)
        if len(s) != old:               # a rule fired
            old = len(s)
            if st.syll > 2:
                s = _suffix(s, st)
            if len(s) != old:           # another rule fired
                if st.syll > 2:
                    s = _second_order_prefix(s, st)
        else:
            if st.syll > 2:
                s = _second_order_prefix(s, st)
            if st.syll > 2:
                s = _suffix(s, st)
    return s


def indonesian_analyzer(stop_words=(), stem_exclusions=(),
                        stem_derivational: bool = True):
    """IndonesianAnalyzer-shaped chain (`id/IndonesianAnalyzer.java:
    100`: LowerCase → Stop → (exclusions) → Stemmer)."""
    from .custom import CustomAnalyzer, map_filter, stop_filter
    stops = frozenset(w.lower() for w in stop_words)
    excl = frozenset(w.lower() for w in stem_exclusions)

    def stem(t):
        return t if t in excl else indonesian_stem(t, stem_derivational)
    return CustomAnalyzer(token_filters=(
        map_filter(str.lower), stop_filter(stops), map_filter(stem)))
