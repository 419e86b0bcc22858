"""Query AST + logical rewrite rules.

Mirrors the reference's immutable Query tree and the BooleanQuery rewrite
fixpoint (`search/BooleanQuery.java:235-340`, applied by
`IndexSearcher.rewrite`, `search/IndexSearcher.java:754-761`):

- empty boolean → MatchNo
- single-SHOULD/MUST unwrap (keeping boost out of scope: boost=1 v0)
- a term both SHOULD/MUST and MUST_NOT → MatchNo / clause elimination
- duplicate FILTER/MUST_NOT dedup
- minimumShouldMatch > #SHOULD → MatchNo
- nested single-occur flattening

The executor consumes the *normalized* tree only.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"   # match-required, non-scoring


@dataclass(frozen=True)
class TermQuery:
    term: str

    def __str__(self):
        return self.term


@dataclass(frozen=True)
class PhraseQuery:
    terms: tuple

    def __str__(self):
        return '"' + " ".join(self.terms) + '"'


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

    pos = {c.query for c in clauses if c.occur in (Occur.MUST, Occur.SHOULD, Occur.FILTER)}
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
    # SHOULD term also MUST'd: drop the SHOULD-as-matcher (it still scores in
    # Lucene; we keep both clauses for scoring parity — no drop here). v0: keep.
    return BooleanQuery(tuple(clauses), q.min_should_match)


def collect_terms(q) -> list[str]:
    """All distinct terms in the tree, in first-appearance order."""
    out, seen = [], set()

    def walk(n):
        if isinstance(n, TermQuery):
            if n.term not in seen:
                seen.add(n.term)
                out.append(n.term)
        elif isinstance(n, PhraseQuery):
            for t in n.terms:
                if t not in seen:
                    seen.add(t)
                    out.append(t)
        elif isinstance(n, BooleanQuery):
            for c in n.clauses:
                walk(c.query)

    walk(q)
    return out
