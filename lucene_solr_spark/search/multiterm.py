"""MultiTermQuery family — prefix / wildcard / regexp / fuzzy / range.

The reference expands these against the term dictionary via an automaton
(`search/MultiTermQuery.java`, `PrefixQuery.java:31`, `WildcardQuery.java:42`,
`RegexpQuery.java:48`, `FuzzyQuery.java:55`, `TermRangeQuery.java:41`) and
rewrites to a constant-score OR (CONSTANT_SCORE rewrite). Here the term
dictionary is the `terms` table: expansion is a pushed-down predicate scan
over its sorted `term` column (row-group pruning for prefix/range), and the
expanded term set comes back to the driver (bounded by MAX_CLAUSE_COUNT,
as in the reference's 1024-clause guard).
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import functions as F

from .ast import MAX_CLAUSE_COUNT, BooleanQuery, Clause, Occur, TermQuery


def _collect_terms(terms_df, cond, limit=MAX_CLAUSE_COUNT + 1) -> list[str]:
    rows = terms_df.filter(cond).select("term").orderBy("term").limit(limit).collect()
    out = [r["term"] for r in rows]
    if len(out) > MAX_CLAUSE_COUNT:
        raise ValueError(f"expansion exceeds maxClauseCount={MAX_CLAUSE_COUNT}")
    return out


def prefix_terms(terms_df, prefix: str) -> list[str]:
    return _collect_terms(terms_df, F.col("term").startswith(prefix))


def wildcard_terms(terms_df, pattern: str) -> list[str]:
    """Lucene wildcard: * any run, ? one char (translated to a regex)."""
    rx = fnmatch.translate(pattern)
    return _collect_terms(terms_df, F.col("term").rlike(rx.replace(r"(?s:", "(?:")))


def regexp_terms(terms_df, pattern: str) -> list[str]:
    return _collect_terms(terms_df, F.col("term").rlike(f"^(?:{pattern})$"))


def range_terms(terms_df, lower: str | None, upper: str | None,
                include_lower=True, include_upper=False) -> list[str]:
    cond = F.lit(True)
    if lower is not None:
        cond = cond & (F.col("term") >= lower if include_lower
                       else F.col("term") > lower)
    if upper is not None:
        cond = cond & (F.col("term") <= upper if include_upper
                       else F.col("term") < upper)
    return _collect_terms(terms_df, cond)


def fuzzy_terms(terms_df, term: str, max_edits: int = 2) -> list[str]:
    """FuzzyQuery: terms within Damerau-ish edit distance (we use plain
    Levenshtein like the reference's LevenshteinAutomata, transpositions
    counted as 2 — adequate for the v0 surface)."""
    cand = _collect_terms(
        terms_df,
        (F.length("term") >= len(term) - max_edits)
        & (F.length("term") <= len(term) + max_edits))
    return [t for t in cand if _levenshtein_capped(t, term, max_edits) <= max_edits]


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
        if min(prev) > cap:
            return cap + 1
    return prev[-1]


def expanded_or(terms: list[str]) -> BooleanQuery:
    """CONSTANT_SCORE-ish rewrite target: OR of the expanded set."""
    return BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(t)) for t in terms))
