"""Flexible / StandardQueryParser analog — per-field configuration.

Reference surface (`queryparser/flexible/standard/
StandardQueryParser.java:103` + its processor pipeline): the same
query SYNTAX as the classic parser, run through per-field config
processors —

- ``set_multi_fields`` (`:255`, MultiFieldQueryNodeProcessor): a
  clause with no explicit field expands to an OR across the configured
  fields.
- ``set_points_config`` (`:295`, PointQueryNodeProcessor /
  PointRangeQueryNodeProcessor + config/PointsConfig.java): fields
  declared numeric parse ``f:42`` and ``f:[10 TO 20]`` into TYPED
  point predicates instead of term queries.
- ``set_fields_boost`` (`:429`, FieldBoostMapFCListener): every clause
  on a configured field is wrapped in that field's boost.
- ``set_default_operator`` (CommonQueryParserConfiguration): delegates
  to the classic addClause rule.
- ``/regexp/`` (RegexpQueryNodeProcessor): handled by the shared
  lexer.

Spark shape: the TEXT part of the parse stays a normal kernel AST;
numeric point predicates become Catalyst range conditions on the DOC
TABLE — the IndexOrDocValuesQuery posture (`document/
IndexOrDocValuesQuery` / `extras.numeric_range_filter`): the filter
pushes to the parquet scan while the text side runs the postings
kernel, and the two semi-join on doc_id. Documented envelope: numeric
predicates are FILTER-scored (contribute 0, Solr's fq posture — the
reference's constant 1.0 contribution under MUST is noted as a
divergence) and must sit in top-level conjunctive positions; anywhere
deeper raises rather than silently mis-scoring.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, functions as F

from .ast import (DEFAULT_FIELD, BooleanQuery, BoostQuery, Clause,
                  DisjunctionMaxQuery, FuzzyQuery, MatchAllQuery, Occur,
                  PhraseQuery, PrefixQuery, RegexpQuery, TermQuery,
                  TermRangeQuery, WildcardQuery)
from .parser import parse_query

_SENTINEL = "\x00unfielded"
_FIELDED_LEAVES = (TermQuery, PhraseQuery, PrefixQuery, WildcardQuery,
                   RegexpQuery, FuzzyQuery, TermRangeQuery)


@dataclass(frozen=True)
class NumericRange:
    """A typed point predicate destined for the doc table."""
    column: str
    lower: object = None
    upper: object = None
    include_lower: bool = True
    include_upper: bool = True

    def condition(self):
        cond = F.lit(True)
        c = F.col(self.column)
        if self.lower is not None:
            cond = cond & (c >= self.lower if self.include_lower
                           else c > self.lower)
        if self.upper is not None:
            cond = cond & (c <= self.upper if self.include_upper
                           else c < self.upper)
        return cond


@dataclass(frozen=True)
class ParsedStandardQuery:
    query: object                      # kernel AST (text part)
    numeric: tuple                     # NumericRange conjunction


class StandardQueryParser:
    def __init__(self, analyzer, default_field: str = DEFAULT_FIELD):
        self.analyzer = analyzer
        self.default_field = default_field
        self.multi_fields: tuple | None = None
        self.points_config: dict[str, type] = {}
        self.fields_boost: dict[str, float] = {}
        self.default_operator = "OR"

    # --- CommonQueryParserConfiguration setters -----------------------
    def set_multi_fields(self, fields) -> "StandardQueryParser":
        self.multi_fields = tuple(fields)
        return self

    def set_points_config(self, field: str,
                          numtype: type = float) -> "StandardQueryParser":
        self.points_config[field] = numtype
        return self

    def set_fields_boost(self, boosts: dict) -> "StandardQueryParser":
        self.fields_boost = dict(boosts)
        return self

    def set_default_operator(self, op: str) -> "StandardQueryParser":
        self.default_operator = op
        return self

    # --- parse ---------------------------------------------------------
    def parse(self, text: str) -> ParsedStandardQuery:
        raw = parse_query(text, self.analyzer, default_field=_SENTINEL,
                          default_operator=self.default_operator)
        numeric: list[NumericRange] = []
        q = self._extract_numeric(raw, numeric, top=True)
        q = self._process(q if q is not None else MatchAllQuery())
        return ParsedStandardQuery(q, tuple(numeric))

    def _extract_numeric(self, q, out: list, top: bool):
        """Pull point predicates out of top-level conjunctive positions;
        reject them anywhere deeper (documented envelope)."""
        if isinstance(q, BooleanQuery) and top:
            kept = []
            for cl in q.clauses:
                nr = self._as_numeric(cl.query)
                if nr is not None:
                    if cl.occur in (Occur.MUST, Occur.FILTER):
                        out.append(nr)
                        continue
                    raise ValueError(
                        "points-config field under a non-required "
                        "clause is outside the supported envelope "
                        f"(field {nr.column!r}, occur {cl.occur})")
                self._reject_nested_numeric(cl.query)
                kept.append(cl)
            if not kept:
                return None
            return BooleanQuery(tuple(kept), q.min_should_match)
        nr = self._as_numeric(q)
        if nr is not None:
            out.append(nr)
            return None
        self._reject_nested_numeric(q)
        return q

    def _as_numeric(self, q):
        base = q.query if isinstance(q, BoostQuery) else q
        if isinstance(base, TermRangeQuery) \
                and base.field in self.points_config:
            t = self.points_config[base.field]
            return NumericRange(
                base.field,
                None if base.lower is None else t(base.lower),
                None if base.upper is None else t(base.upper),
                base.include_lower, base.include_upper)
        if isinstance(base, TermQuery) and base.field in self.points_config:
            t = self.points_config[base.field]
            v = t(base.term)
            return NumericRange(base.field, v, v, True, True)
        return None

    def _reject_nested_numeric(self, q) -> None:
        for ch in _children(q):
            if self._as_numeric(ch) is not None:
                raise ValueError(
                    "points-config field nested below the top-level "
                    "conjunction is outside the supported envelope")
            self._reject_nested_numeric(ch)

    def _process(self, q):
        """MultiField expansion + field boosts, bottom-up."""
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                tuple(Clause(c.occur, self._process(c.query))
                      for c in q.clauses), q.min_should_match)
        if isinstance(q, BoostQuery):
            return BoostQuery(self._process(q.query), q.boost)
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                tuple(self._process(d) for d in q.disjuncts),
                q.tie_breaker)
        if isinstance(q, _FIELDED_LEAVES):
            if getattr(q, "field", None) == _SENTINEL:
                fields = self.multi_fields or (self.default_field,)
                copies = [self._boosted(replace(q, field=f), f)
                          for f in fields]
                if len(copies) == 1:
                    return copies[0]
                return BooleanQuery(tuple(Clause(Occur.SHOULD, c)
                                          for c in copies))
            return self._boosted(q, q.field)
        return q

    def _boosted(self, q, field: str):
        b = self.fields_boost.get(field)
        return BoostQuery(q, float(b)) if b is not None else q


def _children(q):
    if isinstance(q, BooleanQuery):
        return [c.query for c in q.clauses]
    if isinstance(q, BoostQuery):
        return [q.query]
    if isinstance(q, DisjunctionMaxQuery):
        return list(q.disjuncts)
    return []


def standard_search(searcher, docs: DataFrame,
                    parsed: ParsedStandardQuery) -> DataFrame:
    """Run a ParsedStandardQuery: kernel for the text AST, pushed
    Catalyst predicates for the point conjunction, one semi-join.
    → (doc_id, score)."""
    scored = searcher.score_all(parsed.query, mode="f64")
    if not parsed.numeric:
        return scored
    cond = parsed.numeric[0].condition()
    for nr in parsed.numeric[1:]:
        cond = cond & nr.condition()
    return scored.join(docs.filter(cond).select("doc_id"), "doc_id")
