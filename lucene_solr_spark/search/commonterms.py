"""CommonTermsQuery: df-split boolean rewrite.

Reference `queries/CommonTermsQuery.java:119-221`: at rewrite time each
query term's docFreq decides its group — df above ``max_term_frequency``
(an absolute count when ≥ 1, else a ratio of maxDoc, compared against
``ceil(ratio × maxDoc)``) makes it a HIGH-frequency ("common") term,
otherwise LOW. Terms absent from the index (no TermStates) go to the
low group. The rewritten shape is::

    MUST( low-group boolean: each term with low_occur, low msm )
    SHOULD( high-group boolean: each term with high_occur, high msm )

so low-frequency (selective) terms gate matching while common terms
only contribute score — unless the low group is empty, in which case
the high group is hardened to a conjunction (every-term MUST) to avoid
a pure disjunction of stopword-like terms (`CommonTermsQuery.java:
190-198`). Single-term input short-circuits to a TermQuery; empty input
to MatchNoDocs.

Spark-first shape: df comes from the index's ``terms`` dictionary via a
pushed (field, term IN set) filter — a bounded executor-side lookup of
≤ |query terms| rows — and the rewritten query runs on the recursive
tree kernel like any nested boolean.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dfield

from pyspark.sql import functions as F

from .ast import (DEFAULT_FIELD, BooleanQuery, BoostQuery, Clause,
                  MatchNoQuery, Occur, TermQuery)

# fractional minimum-should-match: Math.round(ratio × numOptional)
# (CommonTermsQuery.java:151-156); values ≥ 1 or 0 are absolute
def _min_should_match(value: float, num_optional: int) -> int:
    if value >= 1.0 or value == 0.0:
        return int(value)
    return int(math.floor(value * num_optional + 0.5))


@dataclass(frozen=True)
class CommonTermsQuery:
    """Declarative form; :func:`rewrite_common_terms` resolves df."""
    terms: tuple
    field: str = DEFAULT_FIELD
    max_term_frequency: float = 0.01
    low_freq_occur: Occur = Occur.SHOULD
    high_freq_occur: Occur = Occur.SHOULD
    low_freq_boost: float = 1.0
    high_freq_boost: float = 1.0
    low_freq_min_should_match: float = 0.0
    high_freq_min_should_match: float = 0.0

    def __post_init__(self):
        if Occur.MUST_NOT in (self.low_freq_occur, self.high_freq_occur):
            raise ValueError("occur should be MUST or SHOULD, not MUST_NOT")


def doc_freqs(searcher, terms, field: str = DEFAULT_FIELD) -> dict[str, int]:
    """df per term from the terms dictionary — pushed (field, term IN …)
    predicate, ≤ len(terms) rows collected."""
    tdf = searcher.index.terms
    cond = F.col("term").isin(list(terms))
    if "field" in tdf.columns:
        cond = cond & (F.col("field") == field)
    return {r["term"]: int(r["df"])
            for r in tdf.filter(cond).select("term", "df").collect()}


def rewrite_common_terms(searcher, q: CommonTermsQuery):
    """CommonTermsQuery.rewrite + buildQuery (`CommonTermsQuery.java:
    119-221`) against this searcher's index stats."""
    if not q.terms:
        return MatchNoQuery()
    if len(q.terms) == 1:
        return TermQuery(q.terms[0], q.field)
    max_doc = int(searcher.index.stats["doc_count"])
    dfs = doc_freqs(searcher, q.terms, q.field)
    mtf = q.max_term_frequency
    cutoff = (mtf if mtf >= 1.0 else math.ceil(mtf * max_doc))
    low, high = [], []
    for t in q.terms:
        df = dfs.get(t, 0)
        # absent terms (df == 0) always land in the low group, like a
        # null TermStates in the reference
        (high if df > 0 and df > cutoff else low).append(
            TermQuery(t, q.field))
    low_occur, high_occur = q.low_freq_occur, q.high_freq_occur
    low_msm = (_min_should_match(q.low_freq_min_should_match, len(low))
               if low_occur == Occur.SHOULD and low else 0)
    high_msm = (_min_should_match(q.high_freq_min_should_match, len(high))
                if high_occur == Occur.SHOULD and high else 0)
    if not low and high_msm == 0 and high_occur != Occur.MUST:
        high_occur = Occur.MUST          # harden to a conjunction
    clauses = []
    if low:
        group = BooleanQuery(tuple(Clause(low_occur, t) for t in low),
                             min_should_match=low_msm)
        clauses.append(Clause(Occur.MUST,
                              BoostQuery(group, q.low_freq_boost)))
    if high:
        group = BooleanQuery(tuple(Clause(high_occur, t) for t in high),
                             min_should_match=high_msm)
        clauses.append(Clause(Occur.SHOULD,
                              BoostQuery(group, q.high_freq_boost)))
    return BooleanQuery(tuple(clauses))


def common_terms_score_all(searcher, q: CommonTermsQuery, mode="f32"):
    return searcher.score_all(rewrite_common_terms(searcher, q), mode=mode)
