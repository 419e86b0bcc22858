"""Surround query parser: span-distance operators over the span family.

Reference: `lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.java` (grammar + `getOpDistance`:98-103) and
`surround/query/DistanceQuery.java:97` — a distance operator compiles to
``SpanNearQuery(clauses, opDistance - 1, ordered)``; `W` is ordered,
`N` unordered; a bare operator means distance 1, `kW`/`kN` (2-99)
distance k; on an infix chain the generated parser keeps the LAST
operator token's distance (QueryParser.java:298,325 build one
DistanceQuery after the loop). Boolean operators AND/OR/NOT exist in
both infix and prefix form (`AND(a,b,c)`); inside a distance operator
only OR (→ SpanOr) and truncation (→ SpanOr of the expanded terms,
`SpanNearClauseFactory.java:33`) are allowed — AND/NOT raise, matching
`DistanceQuery.distanceSubQueryNotAllowed`. Truncated terms (`pre*`,
`te?t`) rewrite against the dictionary with the `TooManyBasicQueries`
cap (`BasicQueryFactory` default 1024). Like the reference, terms are
NOT analyzed — they are only case-folded to match the index.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .ast import (DEFAULT_FIELD, BooleanQuery, Clause, MatchNoQuery,
                  Occur, PrefixQuery, SpanNearQuery, SpanOrQuery,
                  SpanTermQuery, WildcardQuery, SPAN_NODES)

MAX_BASIC_QUERIES = 1024  # surround/query/BasicQueryFactory.java default

_TOKEN_RE = re.compile(r"\(|\)|,|:|[^\s(),:]+")
_DIST_RE = re.compile(r"^(\d{1,2})?([wn])$", re.IGNORECASE)


@dataclass(frozen=True)
class SrndTruncSpan:
    """Placeholder for a truncated term in span context; expanded
    against the dictionary by ``rewrite_surround``."""
    pattern: str
    field: str = DEFAULT_FIELD


def _is_kw(tok: str, *names: str) -> bool:
    return tok is not None and tok.upper() in names


class _Tokens:
    def __init__(self, text: str):
        self.toks = _TOKEN_RE.findall(text)
        self.i = 0

    def peek(self, ahead: int = 0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of surround query")
        self.i += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")


def parse_surround(text: str, field: str = DEFAULT_FIELD):
    """Parse a surround expression into the engine AST (boolean over
    span nodes). Truncations inside distance ops come back as
    ``SrndTruncSpan`` placeholders — pass the result through
    ``rewrite_surround(searcher, q)`` before executing."""
    ts = _Tokens(text)
    q = _or(ts, field)
    if ts.peek() is not None:
        raise ValueError(f"trailing tokens at {ts.peek()!r}")
    return q


def _or(ts, field):
    out = [_and(ts, field)]
    while _is_kw(ts.peek(), "OR"):
        ts.next()
        out.append(_and(ts, field))
    if len(out) == 1:
        return out[0]
    return BooleanQuery(tuple(Clause(Occur.SHOULD, c) for c in out))


def _and(ts, field):
    out = [_not(ts, field)]
    while _is_kw(ts.peek(), "AND"):
        ts.next()
        out.append(_not(ts, field))
    if len(out) == 1:
        return out[0]
    return BooleanQuery(tuple(Clause(Occur.MUST, c) for c in out))


def _not(ts, field):
    inc = _dist(ts, field, ordered=False)
    excl = []
    while _is_kw(ts.peek(), "NOT"):
        ts.next()
        excl.append(_dist(ts, field, ordered=False))
    if not excl:
        return inc
    return BooleanQuery((Clause(Occur.MUST, inc),)
                        + tuple(Clause(Occur.MUST_NOT, e) for e in excl))


def _dist_op(tok, want: str):
    if tok is None:
        return None
    m = _DIST_RE.match(tok)
    if m and m.group(2).upper() == want:
        return int(m.group(1) or 1)
    return None


def _dist(ts, field, ordered: bool):
    """N level wraps the W level (QueryParser.jj: NQuery := WQuery
    (N WQuery)*; WQuery := Primary (W Primary)*)."""
    if not ordered:  # N level
        out = [_dist(ts, field, ordered=True)]
        d = None
        while (nd := _dist_op(ts.peek(), "N")) is not None:
            ts.next()
            d = nd  # last operator's distance wins (generated parser)
            out.append(_dist(ts, field, ordered=True))
        if len(out) == 1:
            return out[0]
        return _span_near(out, d - 1, False, field)
    out = [_primary(ts, field)]
    d = None
    while (wd := _dist_op(ts.peek(), "W")) is not None:
        ts.next()
        d = wd
        out.append(_primary(ts, field))
    if len(out) == 1:
        return out[0]
    return _span_near(out, d - 1, True, field)


def _to_span(c, field):
    """A distance operand must be span-capable
    (DistanceQuery.distanceSubQueryNotAllowed)."""
    if isinstance(c, (SrndTruncSpan,) + SPAN_NODES):
        return c
    if isinstance(c, BooleanQuery):
        g = c.grouped()
        if g[Occur.MUST] or g[Occur.MUST_NOT]:
            raise ValueError(
                "AND/NOT not allowed inside a distance operator")
        return SpanOrQuery(tuple(_to_span(x, field)
                                 for x in g[Occur.SHOULD]), field=field)
    if isinstance(c, (PrefixQuery, WildcardQuery)):
        pat = c.prefix + "*" if isinstance(c, PrefixQuery) else c.pattern
        return SrndTruncSpan(pat, c.field)
    raise ValueError(f"not span-capable inside distance op: {c!r}")


def _span_near(clauses, slop, in_order, field):
    sp = tuple(_to_span(c, field) for c in clauses)
    if all(isinstance(c, SpanTermQuery) for c in sp):
        return SpanNearQuery(terms=tuple(c.term for c in sp), slop=slop,
                             in_order=in_order, field=field)
    return SpanNearQuery(clauses=sp, slop=slop, in_order=in_order,
                         field=field)


def _primary(ts, field):
    tok = ts.next()
    if tok == "(":
        q = _or(ts, field)
        ts.expect(")")
        return q
    # field:... — FieldsQuery: the prefix applies to the whole operand
    if ts.peek() == ":":
        ts.next()
        return _set_field(_primary(ts, field), tok)
    # prefix operator form: OR(...), AND(...), 3W(...), N(...)
    up = tok.upper()
    if ts.peek() == "(" and (up in ("OR", "AND")
                             or _DIST_RE.match(tok)):
        ts.next()
        args = [_or(ts, field)]
        while ts.peek() == ",":
            ts.next()
            args.append(_or(ts, field))
        ts.expect(")")
        if up == "OR":
            return BooleanQuery(tuple(Clause(Occur.SHOULD, a)
                                      for a in args))
        if up == "AND":
            return BooleanQuery(tuple(Clause(Occur.MUST, a)
                                      for a in args))
        m = _DIST_RE.match(tok)
        return _span_near(args, int(m.group(1) or 1) - 1,
                          m.group(2).upper() == "W", field)
    term = tok.lower()
    if "*" in term or "?" in term:
        return SrndTruncSpan(term, field)
    return SpanTermQuery(term, field=field)


def _set_field(q, field):
    if isinstance(q, BooleanQuery):
        return BooleanQuery(tuple(
            Clause(c.occur, _set_field(c.query, field))
            for c in q.clauses), q.min_should_match)
    kw = {f.name: getattr(q, f.name) for f in q.__dataclass_fields__.values()} \
        if hasattr(q, "__dataclass_fields__") else None
    if kw is None or "field" not in kw:
        raise ValueError(f"cannot set field on {q!r}")
    kw["field"] = field
    if isinstance(q, SpanNearQuery) and kw["clauses"]:
        kw["clauses"] = tuple(_set_field(c, field) for c in kw["clauses"])
    if isinstance(q, SpanOrQuery):
        kw["clauses"] = tuple(_set_field(c, field) for c in kw["clauses"])
    return type(q)(**kw)


def rewrite_surround(searcher, q):
    """Expand every ``SrndTruncSpan`` against the dictionary into a
    SpanOr of SpanTerm leaves (SimpleTermRewriteQuery over
    MatchingTerms), enforcing the `TooManyBasicQueries` cap. Boolean
    positions could also use the executor's SCORING_BOOLEAN rewrite —
    span positions must stay spans, so both go through the span path
    for identical scoring."""
    from . import multiterm as mt

    def walk(n):
        if isinstance(n, SrndTruncSpan):
            if n.pattern.endswith("*") and "?" not in n.pattern \
                    and "*" not in n.pattern[:-1]:
                terms = mt.prefix_terms(searcher.index.terms,
                                        n.pattern[:-1], field=n.field,
                                        size=MAX_BASIC_QUERIES + 1)
            else:
                terms = mt.wildcard_terms(searcher.index.terms,
                                          n.pattern, field=n.field,
                                          size=MAX_BASIC_QUERIES + 1)
            if len(terms) > MAX_BASIC_QUERIES:
                raise ValueError(
                    f"TooManyBasicQueries: {n.pattern!r} expands past "
                    f"{MAX_BASIC_QUERIES}")
            if not terms:
                return MatchNoQuery()
            if len(terms) == 1:
                return SpanTermQuery(terms[0], field=n.field)
            return SpanOrQuery(tuple(SpanTermQuery(t, field=n.field)
                                     for t in sorted(terms)),
                               field=n.field)
        if isinstance(n, BooleanQuery):
            return BooleanQuery(tuple(Clause(c.occur, walk(c.query))
                                      for c in n.clauses),
                                n.min_should_match)
        if isinstance(n, SpanNearQuery) and n.clauses:
            cs = tuple(walk(c) for c in n.clauses)
            if any(isinstance(c, MatchNoQuery) for c in cs):
                return MatchNoQuery()  # empty expansion kills the near
            return SpanNearQuery(clauses=cs, slop=n.slop,
                                 in_order=n.in_order, field=n.field)
        if isinstance(n, SpanOrQuery):
            cs = tuple(c for c in (walk(c) for c in n.clauses)
                       if not isinstance(c, MatchNoQuery))
            if not cs:
                return MatchNoQuery()
            return SpanOrQuery(cs, field=n.field)
        return n

    return walk(q)
