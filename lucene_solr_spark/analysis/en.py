"""English token filters: possessive strip, minimal (S-) stemmer, Porter.

Reference semantics:
  - `analysis/en/EnglishPossessiveFilter.java:47-55` — strip a trailing
    ``'s`` / ``’s`` / ``＇s`` (ASCII, right-single-quote, fullwidth
    apostrophe; final ``s`` or ``S``).
  - `analysis/en/EnglishMinimalStemmer.java:29-48` — Harman's S-stemmer
    with Lucene's exact branch structure (see :func:`minimal_stem`).
  - `analysis/en/PorterStemmer.java` — Porter 1980 release 3 with
    Lucene's two bug-fix guards and updated step3 rules (``bli``→``ble``,
    ``logi``→``log``).  Implemented from that specification; words of
    length ≤ 2 are returned unchanged (`PorterStemmer.java:479`).

These run over the FACTORIZED vocabulary of an Arrow batch in the
builder (once per distinct term, not once per token), and per token in
the reference per-doc path — both through the same functions below, so
the two index paths stay byte-identical.
"""

from __future__ import annotations

_APOSTROPHES = ("'", "’", "＇")

_VOWELS = frozenset("aeiou")


def possessive_strip(token: str) -> str:
    """EnglishPossessiveFilter.java:47-55 (post-lowercase: final s only,
    since LowerCaseFilter runs after the possessive filter in
    EnglishAnalyzer and our chain lowercases first — 'S lowers to 's)."""
    if len(token) >= 2 and token[-1] == "s" and token[-2] in _APOSTROPHES:
        return token[:-2]
    return token


def minimal_stem(token: str) -> str:
    """EnglishMinimalStemmer.java:29-48, branch for branch:

    - len < 3 or no trailing ``s`` → unchanged
    - ``us`` / ``ss`` endings → unchanged
    - ``ies`` with antepenultimate not ``a``/``e`` and len > 3 → ``y``
      (ponies → pony) — Lucene rewrites in place: drop 3, append y
    - ``es`` after i/a/o/e (goes, dies kept by the prior rule ordering)
      → unchanged
    - otherwise drop the final ``s``
    """
    n = len(token)
    if n < 3 or token[-1] != "s":
        return token
    c = token[-2]
    if c in ("u", "s"):
        return token
    if c == "e":
        if n > 3 and token[-3] == "i" and token[-4] not in ("a", "e"):
            return token[:-3] + "y"
        if token[-3] in ("i", "a", "o", "e"):
            return token
    return token[:-1]


def porter_stem(word: str) -> str:
    """Porter stemmer, exactly the Lucene/Porter release-3 semantics
    (`analysis/en/PorterStemmer.java:476-489` driver: words with fewer
    than 3 letters are returned unchanged; steps 1-6 otherwise).

    Operates on a mutable char list ``b[0..k]``; ``j`` is the
    rule-condition boundary set by suffix tests, as in the reference.
    """
    if len(word) <= 2:
        return word
    b = list(word)
    k = len(b) - 1
    j = 0

    def cons(i: int) -> bool:
        ch = b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not cons(i - 1)
        return True

    def m() -> int:
        # measure of b[0..j]: <c>(vc)^m<v>
        n = 0
        i = 0
        while True:
            if i > j:
                return n
            if not cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem() -> bool:
        return any(not cons(i) for i in range(j + 1))

    def doublec(jj: int) -> bool:
        if jj < 1:
            return False
        if b[jj] != b[jj - 1]:
            return False
        return cons(jj)

    def cvc(i: int) -> bool:
        if i < 2 or not cons(i) or cons(i - 1) or not cons(i - 2):
            return False
        return b[i] not in ("w", "x", "y")

    def ends(s: str) -> bool:
        nonlocal j
        o = k - len(s) + 1
        if o < 0:
            return False
        if "".join(b[o:k + 1]) != s:
            return False
        j = k - len(s)
        return True

    def setto(s: str) -> None:
        nonlocal k
        del b[j + 1:]
        b.extend(s)
        k = j + len(s)

    def r(s: str) -> None:
        if m() > 0:
            setto(s)

    # step1: plurals, -ed, -ing
    if b[k] == "s":
        if ends("sses"):
            k -= 2
        elif ends("ies"):
            setto("i")
        elif b[k - 1] != "s":
            k -= 1
    if ends("eed"):
        if m() > 0:
            k -= 1
    elif (ends("ed") or ends("ing")) and vowel_in_stem():
        k = j
        if ends("at"):
            setto("ate")
        elif ends("bl"):
            setto("ble")
        elif ends("iz"):
            setto("ize")
        elif doublec(k):
            ch = b[k]
            k -= 1
            if ch in ("l", "s", "z"):
                k += 1
        elif m() == 1 and cvc(k):
            setto("e")

    # step2: y → i when the stem has a vowel
    if ends("y") and vowel_in_stem():
        b[k] = "i"

    # step3: double suffices → single (m > 0 on the stem)
    if k != 0:                        # Bug-1 guard
        c1 = b[k - 1]
        if c1 == "a":
            if ends("ational"):
                r("ate")
            elif ends("tional"):
                r("tion")
        elif c1 == "c":
            if ends("enci"):
                r("ence")
            elif ends("anci"):
                r("ance")
        elif c1 == "e":
            if ends("izer"):
                r("ize")
        elif c1 == "l":
            if ends("bli"):
                r("ble")
            elif ends("alli"):
                r("al")
            elif ends("entli"):
                r("ent")
            elif ends("eli"):
                r("e")
            elif ends("ousli"):
                r("ous")
        elif c1 == "o":
            if ends("ization"):
                r("ize")
            elif ends("ation"):
                r("ate")
            elif ends("ator"):
                r("ate")
        elif c1 == "s":
            if ends("alism"):
                r("al")
            elif ends("iveness"):
                r("ive")
            elif ends("fulness"):
                r("ful")
            elif ends("ousness"):
                r("ous")
        elif c1 == "t":
            if ends("aliti"):
                r("al")
            elif ends("iviti"):
                r("ive")
            elif ends("biliti"):
                r("ble")
        elif c1 == "g":
            if ends("logi"):
                r("log")

    # step4: -ic-, -ful, -ness
    c0 = b[k]
    if c0 == "e":
        if ends("icate"):
            r("ic")
        elif ends("ative"):
            r("")
        elif ends("alize"):
            r("al")
    elif c0 == "i":
        if ends("iciti"):
            r("ic")
    elif c0 == "l":
        if ends("ical"):
            r("ic")
        elif ends("ful"):
            r("")
    elif c0 == "s":
        if ends("ness"):
            r("")

    # step5: -ant, -ence, … in context m > 1
    if k != 0:                        # Bug-1 guard
        c1 = b[k - 1]
        matched = False
        if c1 == "a":
            matched = ends("al")
        elif c1 == "c":
            matched = ends("ance") or ends("ence")
        elif c1 == "e":
            matched = ends("er")
        elif c1 == "i":
            matched = ends("ic")
        elif c1 == "l":
            matched = ends("able") or ends("ible")
        elif c1 == "n":
            matched = (ends("ant") or ends("ement") or ends("ment")
                       or ends("ent"))
        elif c1 == "o":
            # Bug-2 guard: j >= 0 for the bare word "ion"
            matched = ((ends("ion") and j >= 0 and b[j] in ("s", "t"))
                       or ends("ou"))
        elif c1 == "s":
            matched = ends("ism")
        elif c1 == "t":
            matched = ends("ate") or ends("iti")
        elif c1 == "u":
            matched = ends("ous")
        elif c1 == "v":
            matched = ends("ive")
        elif c1 == "z":
            matched = ends("ize")
        if matched and m() > 1:
            k = j

    # step6: final -e, final -ll
    j = k
    if b[k] == "e":
        a = m()
        if a > 1 or (a == 1 and not cvc(k - 1)):
            k -= 1
    if b[k] == "l" and doublec(k) and m() > 1:
        k -= 1

    return "".join(b[:k + 1])


STEMMERS = {"minimal": minimal_stem, "porter": porter_stem}


def get_stemmer(name):
    """stemmer name → callable; None/'' → None (no stemming)."""
    if not name:
        return None
    try:
        return STEMMERS[name]
    except KeyError:
        raise ValueError(f"unknown stemmer {name!r}; "
                         f"one of {sorted(STEMMERS)}") from None
