"""Classic-syntax query parser.

A from-scratch recursive-descent parser for the classic Lucene syntax
subset the reference query set uses (`queryparser/.../classic/
QueryParserBase.java:107`, default operator OR per `:63`; clause
assembly per `QueryParserBase.java:387`):

    term              → analyzed; 1 token → TermQuery, n tokens → OR
    field:term        → field-scoped (Term = (field, text), Term.java:69)
    "quoted phrase"   → PhraseQuery over analyzed tokens
    "quoted"~N        → sloppy phrase, slop N (PhraseQuery.java:70)
    term~ / term~N    → FuzzyQuery (default maxEdits 2, FuzzyQuery.java:55)
    wild*card / wi?d  → WildcardQuery; pure trailing-* → PrefixQuery
    /rege.p/          → RegexpQuery (REGEXPTERM, QueryParserBase:812)
    [a TO b] / {a TO b} → TermRangeQuery (inclusive / exclusive)
    atom^2.5          → BoostQuery (QueryParserBase.java:838 handleBoost)
    +term             → MUST        -term / NOT term → MUST_NOT
    a AND b           → both MUST   a OR b → both SHOULD
    (grouping)        → nested BooleanQuery

Query text runs through the SAME analyzer as indexing
(`util/QueryBuilder.java:97-162` behavior: stopwords vanish from the
query; an all-stopword clause contributes nothing). Wildcard / fuzzy /
range patterns are lowercased but NOT analyzed, matching the classic
parser's lowercase_expanded_terms behavior.
"""

from __future__ import annotations

import re

from ..analysis.analyzer import StandardAnalyzer
from ..analysis.lowercase import simple_lowercase
from ..analysis.perfield import resolve_for_field as _an
from .ast import (DEFAULT_FIELD, BooleanQuery, BoostQuery, Clause,
                  FieldExistsQuery, FuzzyQuery, MatchAllQuery, MatchNoQuery,
                  Occur, PhraseQuery, PrefixQuery, RegexpQuery, TermQuery,
                  TermRangeQuery, WildcardQuery, rewrite)

_LEX = re.compile(
    r'(?:[A-Za-z0-9_.]+:)?"[^"]*"(?:~\d+)?(?:\^[\d.]+)?'   # [f:]"…"[~n][^b]
    r'|(?:[A-Za-z0-9_.]+:)?\[[^\]]*\](?:\^[\d.]+)?'        # [f:][a TO b][^b]
    r'|(?:[A-Za-z0-9_.]+:)?\{[^}]*\}(?:\^[\d.]+)?'         # [f:]{a TO b}[^b]
    r'|(?:[A-Za-z0-9_.]+:)?/[^/]*/(?:\^[\d.]+)?'           # [f:]/regex/[^b]
    r'|\(|\)'
    r'|\^[\d.]+'                                           # group boost
    r'|[^\s()]+'
)

_FIELD_RE = re.compile(r'^([A-Za-z0-9_.]+):(.+)$', re.DOTALL)
_BOOST_RE = re.compile(r'^(.*?)\^(\d+(?:\.\d+)?)$', re.DOTALL)
_FUZZY_RE = re.compile(r'^(.+?)~(\d?)$')
_RANGE_RE = re.compile(r'^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$')
_PHRASE_RE = re.compile(r'^"([^"]*)"(?:~(\d+))?$', re.DOTALL)


def parse_query(text: str, analyzer: StandardAnalyzer,
                default_field: str = DEFAULT_FIELD,
                default_operator: str = "OR"):
    """Parse classic-subset syntax → normalized query AST.

    ``default_operator`` is QueryParserBase's setDefaultOperator
    (`classic/QueryParserBase.java:63`, addClause `:387`): with "AND",
    a clause with no explicit operator is required, and a clause
    introduced by OR demotes the preceding clause to optional unless
    it is prohibited — the exact addClause rule."""
    and_default = str(default_operator).upper() == "AND"
    tokens = _LEX.findall(text or "")
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def advance():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def parse_boolean():
        clauses = []
        pending_op = None       # 'AND' | 'OR' | None
        while True:
            t = peek()
            if t is None or t == ")":
                break
            if t in ("AND", "&&"):
                pending_op = "AND"
                advance()
                continue
            if t in ("OR", "||"):
                pending_op = "OR"
                advance()
                continue
            occur = Occur.MUST if and_default else Occur.SHOULD
            explicit_mod = False
            if t in ("NOT", "!"):
                advance()
                t = peek()
                if t is None or t == ")":
                    break
                occur = Occur.MUST_NOT
                explicit_mod = True
            elif t.startswith("+") and len(t) > 1:
                occur = Occur.MUST
                explicit_mod = True
                tokens[pos[0]] = t[1:]
            elif t.startswith("-") and len(t) > 1:
                occur = Occur.MUST_NOT
                explicit_mod = True
                tokens[pos[0]] = t[1:]

            sub = parse_atom()
            # group boost: (a b)^2
            nxt = peek()
            if (sub is not None and nxt is not None and nxt.startswith("^")
                    and _BOOST_RE.match("x" + nxt)):
                advance()
                sub = BoostQuery(sub, float(nxt[1:]))
            if pending_op == "AND" and occur != Occur.MUST_NOT:
                occur = Occur.MUST
                # retroactively promote the left neighbor, classic-parser style
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = Clause(Occur.MUST, clauses[-1].query)
            elif pending_op == "OR":
                if occur == Occur.MUST and not explicit_mod:
                    occur = Occur.SHOULD  # AND-default yields to OR; an
                                          # explicit + keeps MUST (mods win)
                # addClause: OR demotes the preceding clause to optional
                # unless prohibited — only under the AND default
                if (and_default and clauses
                        and clauses[-1].occur == Occur.MUST):
                    clauses[-1] = Clause(Occur.SHOULD, clauses[-1].query)
            pending_op = None
            if sub is not None:
                clauses.append(Clause(occur, sub))
        return BooleanQuery(tuple(clauses))

    def parse_atom():
        t = advance()
        if t == "(":
            sub = parse_boolean()
            if peek() == ")":
                advance()
            return sub
        return parse_leaf(t, default_field)

    def parse_leaf(t: str, fld: str):
        # field prefix (not inside quotes/brackets)
        m = _FIELD_RE.match(t)
        if m and not t.startswith(('"', "[", "{")):
            fld, t = m.group(1), m.group(2)
        # boost suffix (phrases handle their own to keep ~slop ordering)
        boost = None
        if not t.startswith('"'):
            mb = _BOOST_RE.match(t)
            if mb and mb.group(1):
                t, boost = mb.group(1), float(mb.group(2))
        q = parse_bare(t, fld)
        if q is None:
            return None
        if boost is not None:
            q = BoostQuery(q, boost)
        return q

    def parse_bare(t: str, fld: str):
        # *:* → MatchAllDocsQuery (QueryParserBase.getWildcardQuery:
        # `if "*".equals(field) && "*".equals(termStr)` special case);
        # field:* → FieldExistsQuery (Solr SolrQueryParserBase
        # getWildcardQuery rewrite, FieldType.java:863-878)
        if t == "*:*":
            return MatchAllQuery()
        if t == "*":
            return FieldExistsQuery(fld)
        if t.startswith('"'):
            body, boost = _strip_phrase_boost(t)
            m = _PHRASE_RE.match(body)
            if not m:
                return None
            toks = _an(analyzer, fld).tokens(m.group(1))
            if not toks:
                return None
            slop = int(m.group(2)) if m.group(2) else 0
            if len(toks) == 1 and slop == 0:
                q = TermQuery(toks[0], fld)
            else:
                q = PhraseQuery(tuple(toks), fld, slop)
            return BoostQuery(q, boost) if boost is not None else q
        if len(t) >= 2 and t.startswith("/") and t.endswith("/"):
            # /regex/ → RegexpQuery (QueryParserBase REGEXPTERM handling;
            # pattern kept verbatim apart from lowercasing, like the
            # other expanded terms)
            return RegexpQuery(simple_lowercase(t[1:-1]), fld)
        mr = _RANGE_RE.match(t)
        if mr:
            lo = None if mr.group(2) == "*" else simple_lowercase(mr.group(2))
            hi = None if mr.group(3) == "*" else simple_lowercase(mr.group(3))
            if lo is None and hi is None:
                # [* TO *] — open both ends ≡ field exists; Solr's
                # FieldType.getRangeQuery emits the exists query here
                return FieldExistsQuery(fld)
            return TermRangeQuery(lo, hi,
                                  include_lower=mr.group(1) == "[",
                                  include_upper=mr.group(4) == "]",
                                  field=fld)
        mf = _FUZZY_RE.match(t)
        if mf and "*" not in t and "?" not in t:
            edits = int(mf.group(2)) if mf.group(2) else 2
            return FuzzyQuery(simple_lowercase(mf.group(1)), edits, fld)
        if "*" in t or "?" in t:
            low = simple_lowercase(t)
            if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
                return PrefixQuery(low[:-1], fld)
            return WildcardQuery(low, fld)
        toks = _an(analyzer, fld).tokens(t)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0], fld)
        # one input word analyzed to several tokens → OR of terms
        return BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(x, fld))
                                  for x in toks))

    q = parse_boolean()
    if not q.clauses:
        return MatchNoQuery()
    return rewrite(q)


def _strip_phrase_boost(t: str) -> tuple[str, float | None]:
    m = re.match(r'^("(?:[^"]*)"(?:~\d+)?)\^(\d+(?:\.\d+)?)$', t)
    if m:
        return m.group(1), float(m.group(2))
    return t, None
