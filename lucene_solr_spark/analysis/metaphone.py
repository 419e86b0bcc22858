"""DoubleMetaphoneFilter analog — Lawrence Philips' Double Metaphone.

Mirrors Solr's PhoneticFilterFactory with the DoubleMetaphone encoder
(`lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/DoubleMetaphoneFilter.java:31`; the filter emits the primary
code and, when ``inject``, the secondary alongside the surface token —
two tokens at one position, so a query matches when the code SETS
intersect). The encoder semantics are the published algorithm
(L. Philips, "The Double Metaphone Search Algorithm", C/C++ Users
Journal, June 2000 — public domain reference implementations in
commons-codec, which is exactly the jar Solr loads): every word maps
to a primary and an alternate 4-char code over the alphabet
{A F H J K L M N P R S T X 0}, with the alternate capturing the
non-Anglo-Saxon pronunciation (Smith→SM0/XMT vs Schmidt→XMT/SMT).

Spark shape: encoding is rule-table branching — the honest home is an
Arrow-batched pandas UDF applied to the TERM DICTIONARY (bounded by
vocabulary, never the corpus), the same top-terms-capped expansion
surface every MultiTermQuery uses. The corpus-side query stays a
kernel term scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

_VOWELS = frozenset("AEIOUY")


def _at(s: str, start: int, length: int, *matches: str) -> bool:
    if start < 0:
        return False
    return s[start:start + length] in matches


def _slavo_germanic(s: str) -> bool:
    return ("W" in s) or ("K" in s) or ("CZ" in s) or ("WITZ" in s)


def double_metaphone(word: str, max_len: int = 4) -> tuple[str, str]:
    """→ (primary, secondary) codes, each ≤ ``max_len`` chars.

    The full published rule set: initial silent GN/KN/PN/WR/PS, the
    C/CH Greek-vs-Romance-vs-Germanic splits, SC(H), TH→0/T, the
    Spanish LL / J(OSE) alternates, Polish -WICZ/-WITZ, silent GH,
    terminal -IER R drop, X→KS, Z(H). Secondary == primary whenever no
    rule forks."""
    w = "".join(c for c in word.upper() if c.isalpha() or c in "ÇÑ ")
    length = len(w)
    if length == 0:
        return "", ""
    last = length - 1
    s = w + "     "
    pri: list[str] = []
    sec: list[str] = []
    sg = _slavo_germanic(w)

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        sec.append(p if a is None else a)

    cur = 0
    if _at(s, 0, 2, "GN", "KN", "PN", "WR", "PS"):
        cur = 1                               # silent initial cluster
    if s[0] == "X":
        add("S")                              # 'Xavier' pronounced Z→S
        cur = 1

    while cur < length and (len("".join(pri)) < max_len
                            or len("".join(sec)) < max_len):
        ch = s[cur]

        if ch in _VOWELS:
            if cur == 0:
                add("A")                      # all initial vowels → A
            cur += 1

        elif ch == "B":
            add("P")                          # 'dumb' final B handled by
            cur += 2 if s[cur + 1] == "B" else 1   # the M(B) rule side

        elif ch == "Ç":
            add("S")
            cur += 1

        elif ch == "C":
            # germanic 'ACH' (bacher/macher keep K even before E)
            if (cur > 1 and s[cur - 2] not in _VOWELS
                    and _at(s, cur - 1, 3, "ACH")
                    and s[cur + 2] != "I"
                    and (s[cur + 2] != "E"
                         or _at(s, cur - 2, 6, "BACHER", "MACHER"))):
                add("K"); cur += 2
            elif cur == 0 and _at(s, cur, 6, "CAESAR"):
                add("S"); cur += 2
            elif _at(s, cur, 4, "CHIA"):      # italian 'chianti'
                add("K"); cur += 2
            elif _at(s, cur, 2, "CH"):
                if cur > 0 and _at(s, cur, 4, "CHAE"):    # 'michael'
                    add("K", "X"); cur += 2
                elif (cur == 0
                      and (_at(s, cur + 1, 5, "HARAC", "HARIS")
                           or _at(s, cur + 1, 3, "HOR", "HYM", "HIA",
                                  "HEM"))
                      and not _at(s, 0, 5, "CHORE")):
                    add("K"); cur += 2        # greek roots 'chorus' etc.
                elif (_at(s, 0, 4, "VAN ", "VON ") or _at(s, 0, 3, "SCH")
                      or _at(s, cur - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                      or _at(s, cur + 2, 1, "T", "S")
                      or ((_at(s, cur - 1, 1, "A", "O", "U", "E")
                           or cur == 0)
                          and _at(s, cur + 2, 1, "L", "R", "N", "M", "B",
                                  "H", "F", "V", "W", " "))):
                    add("K"); cur += 2        # germanic CH → K
                else:
                    if cur > 0:
                        if _at(s, 0, 2, "MC"):
                            add("K")          # 'McHugh'
                        else:
                            add("X", "K")
                    else:
                        add("X")
                    cur += 2
            elif _at(s, cur, 2, "CZ") and not _at(s, cur - 2, 4, "WICZ"):
                add("S", "X"); cur += 2       # 'czerny'
            elif _at(s, cur + 1, 3, "CIA"):
                add("X"); cur += 3            # 'focaccia'
            elif _at(s, cur, 2, "CC") and not (cur == 1 and s[0] == "M"):
                # double C as KS ('accident') / X ('bellocchio')
                if (_at(s, cur + 2, 1, "I", "E", "H")
                        and not _at(s, cur + 2, 2, "HU")):
                    if ((cur == 1 and s[cur - 1] == "A")
                            or _at(s, cur - 1, 5, "UCCEE", "UCCES")):
                        add("KS")
                    else:
                        add("X")
                    cur += 3
                else:
                    add("K"); cur += 2
            elif _at(s, cur, 2, "CK", "CG", "CQ"):
                add("K"); cur += 2
            elif _at(s, cur, 2, "CI", "CE", "CY"):
                if _at(s, cur, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                cur += 2
            else:
                add("K")
                if _at(s, cur + 1, 2, " C", " Q", " G"):
                    cur += 3                  # 'mac caffrey'
                elif (_at(s, cur + 1, 1, "C", "K", "Q")
                      and not _at(s, cur + 1, 2, "CE", "CI")):
                    cur += 2
                else:
                    cur += 1

        elif ch == "D":
            if _at(s, cur, 2, "DG"):
                if _at(s, cur + 2, 1, "I", "E", "Y"):
                    add("J"); cur += 3        # 'edge'
                else:
                    add("TK"); cur += 2       # 'edgar'
            elif _at(s, cur, 2, "DT", "DD"):
                add("T"); cur += 2
            else:
                add("T"); cur += 1

        elif ch == "F":
            add("F")
            cur += 2 if s[cur + 1] == "F" else 1

        elif ch == "G":
            if s[cur + 1] == "H":
                if cur > 0 and s[cur - 1] not in _VOWELS:
                    add("K"); cur += 2
                elif cur == 0:
                    if s[cur + 2] == "I":
                        add("J")              # 'ghislane'
                    else:
                        add("K")              # 'ghost'
                    cur += 2
                elif ((cur > 1 and _at(s, cur - 2, 1, "B", "H", "D"))
                      or (cur > 2 and _at(s, cur - 3, 1, "B", "H", "D"))
                      or (cur > 3 and _at(s, cur - 4, 1, "B", "H"))):
                    cur += 2                  # 'hugh'/'bough' silent GH
                else:
                    if (cur > 2 and s[cur - 1] == "U"
                            and _at(s, cur - 3, 1, "C", "G", "L", "R",
                                    "T")):
                        add("F")              # 'laugh', 'cough'
                    elif cur > 0 and s[cur - 1] != "I":
                        add("K")
                    cur += 2
            elif s[cur + 1] == "N":
                if cur == 1 and s[0] in _VOWELS and not sg:
                    add("KN", "N")
                elif (not _at(s, cur + 2, 2, "EY") and s[cur + 1] != "Y"
                      and not sg):
                    add("N", "KN")
                else:
                    add("KN")
                cur += 2
            elif _at(s, cur + 1, 2, "LI") and not sg:
                add("KL", "L"); cur += 2      # 'tagliaro'
            elif (cur == 0
                  and (s[cur + 1] == "Y"
                       or _at(s, cur + 1, 2, "ES", "EP", "EB", "EL", "EY",
                              "IB", "IL", "IN", "IE", "EI", "ER"))):
                add("K", "J"); cur += 2       # initial 'ges-'/'gy-'
            elif ((_at(s, cur + 1, 2, "ER") or s[cur + 1] == "Y")
                  and not _at(s, 0, 6, "DANGER", "RANGER", "MANGER")
                  and not _at(s, cur - 1, 1, "E", "I")
                  and not _at(s, cur - 1, 3, "RGY", "OGY")):
                add("K", "J"); cur += 2       # 'bergen' vs 'berger'
            elif (_at(s, cur + 1, 1, "E", "I", "Y")
                  or _at(s, cur - 1, 4, "AGGI", "OGGI")):
                if (_at(s, 0, 4, "VAN ", "VON ") or _at(s, 0, 3, "SCH")
                        or _at(s, cur + 1, 2, "ET")):
                    add("K")                  # germanic stays hard
                elif _at(s, cur + 1, 4, "IER "):
                    add("J")
                else:
                    add("J", "K")
                cur += 2
            else:
                add("K")
                cur += 2 if s[cur + 1] == "G" else 1

        elif ch == "H":
            # only keep between vowels or word-initial before a vowel
            if ((cur == 0 or s[cur - 1] in _VOWELS)
                    and s[cur + 1] in _VOWELS):
                add("H"); cur += 2
            else:
                cur += 1

        elif ch == "J":
            if _at(s, cur, 4, "JOSE") or _at(s, 0, 4, "SAN "):
                if ((cur == 0 and s[cur + 4] == " ")
                        or _at(s, 0, 4, "SAN ")):
                    add("H")                  # 'jose' / 'san jacinto'
                else:
                    add("J", "H")
                cur += 1
            else:
                if cur == 0:
                    add("J", "A")             # 'yankelovich'/'jankelowicz'
                elif (s[cur - 1] in _VOWELS and not sg
                      and s[cur + 1] in ("A", "O")):
                    add("J", "H")             # spanish 'bajador'
                elif cur == last:
                    add("J", "")
                elif (not _at(s, cur + 1, 1, "L", "T", "K", "S", "N", "M",
                              "B", "Z")
                      and not _at(s, cur - 1, 1, "S", "K", "L")):
                    add("J")
                cur += 2 if s[cur + 1] == "J" else 1

        elif ch == "K":
            add("K")
            cur += 2 if s[cur + 1] == "K" else 1

        elif ch == "L":
            if s[cur + 1] == "L":
                # spanish 'cabrillo'/'gallegos': LL silent in primary's
                # alternate reading
                if ((cur == length - 3
                     and _at(s, cur - 1, 4, "ILLO", "ILLA", "ALLE"))
                        or ((_at(s, last - 1, 2, "AS", "OS")
                             or _at(s, last, 1, "A", "O"))
                            and _at(s, cur - 1, 4, "ALLE"))):
                    add("L", "")
                else:
                    add("L")
                cur += 2
            else:
                add("L"); cur += 1

        elif ch == "M":
            add("M")
            if ((_at(s, cur - 1, 3, "UMB")
                 and (cur + 1 == last or _at(s, cur + 2, 2, "ER")))
                    or s[cur + 1] == "M"):
                cur += 2                      # 'dumb', 'thumb'
            else:
                cur += 1

        elif ch == "N":
            add("N")
            cur += 2 if s[cur + 1] == "N" else 1

        elif ch == "Ñ":
            add("N"); cur += 1

        elif ch == "P":
            if s[cur + 1] == "H":
                add("F"); cur += 2            # 'phone'
            else:
                add("P")
                cur += 2 if s[cur + 1] in ("P", "B") else 1

        elif ch == "Q":
            add("K")
            cur += 2 if s[cur + 1] == "Q" else 1

        elif ch == "R":
            if (cur == last and not sg and _at(s, cur - 2, 2, "IE")
                    and not _at(s, cur - 4, 2, "ME", "MA")):
                add("", "R")                  # french terminal -IER
            else:
                add("R")
            cur += 2 if s[cur + 1] == "R" else 1

        elif ch == "S":
            if _at(s, cur - 1, 3, "ISL", "YSL"):
                cur += 1                      # silent: 'island', 'carlysle'
            elif cur == 0 and _at(s, cur, 5, "SUGAR"):
                add("X", "S"); cur += 1
            elif _at(s, cur, 2, "SH"):
                if _at(s, cur + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")                  # germanic SH stays S
                else:
                    add("X")
                cur += 2
            elif (_at(s, cur, 3, "SIO", "SIA")
                  or _at(s, cur, 4, "SIAN")):
                add("S", "S" if sg else "X")
                cur += 3
            elif ((cur == 0
                   and _at(s, cur + 1, 1, "M", "N", "L", "W"))
                  or _at(s, cur + 1, 1, "Z")):
                add("S", "X")                 # 'smith' → SM0/XMT fork
                cur += 2 if _at(s, cur + 1, 1, "Z") else 1
            elif _at(s, cur, 2, "SC"):
                if s[cur + 2] == "H":
                    if _at(s, cur + 3, 2, "OO", "ER", "EN", "UY", "ED",
                           "EM"):
                        if _at(s, cur + 3, 2, "ER", "EN"):
                            add("X", "SK")    # 'schermerhorn'
                        else:
                            add("SK")         # 'school', 'schedule'
                    elif (cur == 0 and s[3] not in _VOWELS
                          and s[3] != "W"):
                        add("X", "S")
                    else:
                        add("X")
                    cur += 3
                elif _at(s, cur + 2, 1, "I", "E", "Y"):
                    add("S"); cur += 3
                else:
                    add("SK"); cur += 3
            else:
                if cur == last and _at(s, cur - 2, 2, "AI", "OI"):
                    add("", "S")              # french 'resnais'/'artois'
                else:
                    add("S")
                cur += 2 if s[cur + 1] in ("S", "Z") else 1

        elif ch == "T":
            if _at(s, cur, 4, "TION"):
                add("X"); cur += 3
            elif _at(s, cur, 3, "TIA", "TCH"):
                add("X"); cur += 3
            elif _at(s, cur, 2, "TH") or _at(s, cur, 3, "TTH"):
                if (_at(s, cur + 2, 2, "OM", "AM")       # 'thomas'
                        or _at(s, 0, 4, "VAN ", "VON ")
                        or _at(s, 0, 3, "SCH")):
                    add("T")
                else:
                    add("0", "T")
                cur += 2
            else:
                add("T")
                cur += 2 if s[cur + 1] in ("T", "D") else 1

        elif ch == "V":
            add("F")
            cur += 2 if s[cur + 1] == "V" else 1

        elif ch == "W":
            if _at(s, cur, 2, "WR"):
                add("R"); cur += 2            # 'wright'
            elif cur == 0 and (s[cur + 1] in _VOWELS
                               or _at(s, cur, 2, "WH")):
                if s[cur + 1] in _VOWELS:
                    add("A", "F")             # 'wasserman'/'vasserman'
                else:
                    add("A")                  # 'wh-' → A
                cur += 1
            elif ((cur == last and s[cur - 1] in _VOWELS)
                  or _at(s, cur - 1, 5, "EWSKI", "EWSKY", "OWSKI",
                         "OWSKY")
                  or _at(s, 0, 3, "SCH")):
                add("", "F")                  # polish -owski alternate
                cur += 1
            elif _at(s, cur, 4, "WICZ", "WITZ"):
                add("TS", "FX"); cur += 4
            else:
                cur += 1

        elif ch == "X":
            if not (cur == last
                    and (_at(s, cur - 3, 3, "IAU", "EAU")
                         or _at(s, cur - 2, 2, "AU", "OU"))):
                add("KS")                     # french 'breaux' silent
            cur += 2 if s[cur + 1] in ("C", "X") else 1

        elif ch == "Z":
            if s[cur + 1] == "H":
                add("J"); cur += 2            # 'zhao'
            else:
                if (_at(s, cur + 1, 2, "ZO", "ZI", "ZA")
                        or (sg and cur > 0 and s[cur - 1] != "T")):
                    add("S", "TS")
                else:
                    add("S")
                cur += 2 if s[cur + 1] == "Z" else 1

        else:
            cur += 1

    return "".join(pri)[:max_len], "".join(sec)[:max_len]


def dm_codes(word: str, max_len: int = 4) -> set[str]:
    """The non-empty code set {primary, secondary} — what
    DoubleMetaphoneFilter(inject=true) emits at the token's position."""
    p, a = double_metaphone(word, max_len)
    return {c for c in (p, a) if c}


def double_metaphone_udf(max_len: int = 4):
    """Arrow-batched encoder: string column → array<string> of distinct
    non-empty codes (primary first). Applied to the bounded dictionary,
    never the corpus."""
    from pyspark.sql.functions import pandas_udf

    def _enc(col: pd.Series) -> pd.Series:
        out = []
        for v in col:
            if v is None:
                out.append([])
                continue
            p, a = double_metaphone(str(v), max_len)
            out.append([p] if (a == p or not a) else ([p, a] if p
                                                      else [a]))
        return pd.Series(out)

    return pandas_udf(_enc, "array<string>")


def double_metaphone_terms(terms_df, word: str, field: str = "text",
                           size: int = 64) -> list[str]:
    """Dictionary terms whose Double Metaphone code set intersects
    ``word``'s (DoubleMetaphoneFilter inject=true matching) — the
    query-side expansion, top-terms-capped like every MultiTermQuery
    rewrite. One pushed field filter + one Arrow-batched projection
    over the dictionary."""
    codes = dm_codes(word)
    if not codes:
        return []
    enc = double_metaphone_udf()
    rows = (terms_df.filter(F.col("field") == field)
            .withColumn("_dm", enc(F.col("term")))
            .filter(F.arrays_overlap(
                "_dm", F.array(*[F.lit(c) for c in sorted(codes)])))
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term")).limit(size).collect())
    return sorted(r["term"] for r in rows)
