"""Query AST + logical rewrite rules.

Mirrors the reference's immutable Query tree and the BooleanQuery rewrite
fixpoint (`search/BooleanQuery.java:235-340`, applied by
`IndexSearcher.rewrite`, `search/IndexSearcher.java:754-761`):

- empty boolean → MatchNo
- single-SHOULD/MUST unwrap
- a term both SHOULD/MUST and MUST_NOT → MatchNo / clause elimination
- duplicate FILTER/MUST_NOT dedup
- minimumShouldMatch > #SHOULD → MatchNo
- nested single-occur flattening
- BoostQuery(boost=1) unwrap; nested boosts multiply
  (`search/BoostQuery.java:34,66`)

Terms are (field, text) pairs exactly as in the reference
(`index/Term.java:69`); every leaf node carries a field, defaulting to
the engine's default field ("text"). Multi-term leaves (prefix /
wildcard / regexp / fuzzy / range — `search/MultiTermQuery.java`) are
carried symbolically and expanded against the term dictionary by the
Searcher (the MultiTermQuery.rewrite step), not here.

The executor consumes the *normalized* tree only.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

DEFAULT_FIELD = "text"


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"   # match-required, non-scoring


@dataclass(frozen=True)
class TermQuery:
    term: str
    field: str = DEFAULT_FIELD

    def __str__(self):
        return f"{self.field}:{self.term}"


@dataclass(frozen=True)
class PhraseQuery:
    terms: tuple
    field: str = DEFAULT_FIELD
    slop: int = 0           # PhraseQuery.java:70 — edit-distance budget

    def __str__(self):
        s = f'{self.field}:"' + " ".join(self.terms) + '"'
        return s + (f"~{self.slop}" if self.slop else "")


@dataclass(frozen=True)
class SpanNearQuery:
    """Ordered span-near (`search/spans/SpanNearQuery.java:63`,
    `NearSpansOrdered.java:36`): terms must appear IN ORDER with total
    gap ≤ slop. Engine spec (exactly shared with oracle + SQL gate):
    for every occurrence p0 of the first term, greedily chain each later
    term to its FIRST occurrence after the previous one; the anchor
    matches when matchLength = (p_last − p0) − (n−1) ≤ slop,
    contributing 1/(1+matchLength) to the span freq. (Lucene enumerates
    minimal spans rather than one candidate per first-term occurrence —
    same matches for 2-term spans, may differ in *freq* on overlapping
    3+-term repeats; divergence pinned in tests.)"""
    terms: tuple
    slop: int = 0
    field: str = DEFAULT_FIELD


@dataclass(frozen=True)
class BoostQuery:
    """BoostQuery.java:34 — multiplies the wrapped query's score."""
    query: object
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery:
    """DisjunctionMaxQuery.java:45,51 — score = max over disjuncts plus
    tie_breaker × (sum of the other matching disjuncts' scores)."""
    disjuncts: tuple
    tie_breaker: float = 0.0


# --- multi-term leaves (expanded by Searcher against the dictionary) ------

@dataclass(frozen=True)
class PrefixQuery:
    prefix: str
    field: str = DEFAULT_FIELD


@dataclass(frozen=True)
class WildcardQuery:
    pattern: str            # * = any run, ? = one char
    field: str = DEFAULT_FIELD


@dataclass(frozen=True)
class RegexpQuery:
    pattern: str
    field: str = DEFAULT_FIELD


@dataclass(frozen=True)
class FuzzyQuery:
    term: str
    max_edits: int = 2
    field: str = DEFAULT_FIELD


@dataclass(frozen=True)
class TermRangeQuery:
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = False
    field: str = DEFAULT_FIELD


MULTI_TERM_NODES = (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery,
                    TermRangeQuery)


@dataclass(frozen=True)
class MatchAllQuery:
    pass


@dataclass(frozen=True)
class MatchNoQuery:
    pass


@dataclass(frozen=True)
class Clause:
    occur: Occur
    query: object


@dataclass(frozen=True)
class BooleanQuery:
    clauses: tuple = field(default_factory=tuple)
    min_should_match: int = 0

    def grouped(self):
        g = {o: [] for o in Occur}
        for c in self.clauses:
            g[c.occur].append(c.query)
        return g


MAX_CLAUSE_COUNT = 1024  # IndexSearcher.java:768 guard


def rewrite(q):
    """Normalize to fixpoint."""
    prev = None
    while q != prev:
        prev, q = q, _rewrite_once(q)
    return q


def _rewrite_once(q):
    if isinstance(q, BoostQuery):
        sub = _rewrite_once(q.query)
        if q.boost == 1.0:
            return sub
        if isinstance(sub, BoostQuery):        # nested boosts multiply
            return BoostQuery(sub.query, q.boost * sub.boost)
        if isinstance(sub, (MatchNoQuery,)):
            return sub
        return BoostQuery(sub, q.boost)
    if isinstance(q, DisjunctionMaxQuery):
        subs = tuple(s for s in (_rewrite_once(d) for d in q.disjuncts)
                     if not isinstance(s, MatchNoQuery))
        if not subs:
            return MatchNoQuery()
        if len(subs) == 1:
            return subs[0]
        return DisjunctionMaxQuery(subs, q.tie_breaker)
    if not isinstance(q, BooleanQuery):
        return q
    if len(q.clauses) > MAX_CLAUSE_COUNT:
        raise ValueError(f"too many clauses: {len(q.clauses)} > {MAX_CLAUSE_COUNT}")
    clauses = []
    for c in q.clauses:
        sub = _rewrite_once(c.query)
        # flatten nested pure-SHOULD booleans under SHOULD, pure-MUST under MUST
        if isinstance(sub, BooleanQuery) and sub.min_should_match <= 1:
            occs = {cl.occur for cl in sub.clauses}
            if len(sub.clauses) == 1 and sub.min_should_match == 0:
                inner = sub.clauses[0]
                if inner.occur in (Occur.MUST, Occur.SHOULD):
                    clauses.append(Clause(c.occur, inner.query))
                    continue
            if c.occur == Occur.SHOULD and occs == {Occur.SHOULD} and sub.min_should_match == 0:
                clauses.extend(sub.clauses)
                continue
            if c.occur == Occur.MUST and occs == {Occur.MUST}:
                clauses.extend(sub.clauses)
                continue
        if isinstance(sub, MatchNoQuery):
            if c.occur in (Occur.MUST, Occur.FILTER):
                return MatchNoQuery()
            continue  # SHOULD/MUST_NOT MatchNo drops out
        if isinstance(sub, MatchAllQuery) and c.occur == Occur.FILTER:
            continue  # FILTER ∧ MatchAll elimination (when others exist)
        clauses.append(Clause(c.occur, sub))

    # dedup FILTER / MUST_NOT
    seen = set()
    dedup = []
    for c in clauses:
        key = (c.occur, c.query) if c.occur in (Occur.FILTER, Occur.MUST_NOT) else id(c)
        if key in seen:
            continue
        seen.add(key)
        dedup.append(c)
    clauses = dedup

    neg = {c.query for c in clauses if c.occur == Occur.MUST_NOT}
    req = {c.query for c in clauses if c.occur in (Occur.MUST, Occur.FILTER)}
    if req & neg:
        return MatchNoQuery()  # required and prohibited
    n_should = sum(1 for c in clauses if c.occur == Occur.SHOULD)
    n_must = sum(1 for c in clauses if c.occur in (Occur.MUST, Occur.FILTER))
    if q.min_should_match > n_should:
        return MatchNoQuery()
    if not clauses:
        return MatchNoQuery()
    if len(clauses) == 1 and q.min_should_match == 0:
        c = clauses[0]
        if c.occur in (Occur.MUST, Occur.SHOULD):
            return c.query
    if n_should == 0 and n_must == 0:
        return MatchNoQuery()  # only MUST_NOT clauses match nothing
    # NOTE: a term appearing both MUST and SHOULD keeps BOTH clauses — it
    # scores twice (BooleanWeight builds one scorer per clause); the
    # executor keys its kernel spec by CLAUSE, not by term.
    return BooleanQuery(tuple(clauses), q.min_should_match)


def collect_terms(q) -> list[tuple[str, str]]:
    """All distinct (field, term) pairs in the tree, in appearance order."""
    out, seen = [], set()

    def add(f, t):
        if (f, t) not in seen:
            seen.add((f, t))
            out.append((f, t))

    def walk(n):
        if isinstance(n, TermQuery):
            add(n.field, n.term)
        elif isinstance(n, (PhraseQuery, SpanNearQuery)):
            for t in n.terms:
                add(n.field, t)
        elif isinstance(n, BooleanQuery):
            for c in n.clauses:
                walk(c.query)
        elif isinstance(n, BoostQuery):
            walk(n.query)
        elif isinstance(n, DisjunctionMaxQuery):
            for d in n.disjuncts:
                walk(d)

    walk(q)
    return out
