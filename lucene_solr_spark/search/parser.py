"""Classic-syntax query parser (minimal subset).

A from-scratch recursive-descent parser for the subset of the classic
Lucene syntax the reference query set uses
(`queryparser/.../classic/QueryParserBase.java:107`, default operator OR
per `:63`; clause assembly per `QueryParserBase.java:387`):

    term            → analyzed; 1 token → TermQuery, n tokens → OR of terms
    "quoted phrase" → PhraseQuery over analyzed tokens
    +term           → MUST        -term / NOT term → MUST_NOT
    a AND b         → both MUST   a OR b → both SHOULD
    (grouping)      → nested BooleanQuery

Query text runs through the SAME analyzer as indexing
(`util/QueryBuilder.java:97-162` behavior: stopwords vanish from the
query; an all-stopword clause contributes nothing).
"""

from __future__ import annotations

import re

from ..analysis.analyzer import StandardAnalyzer
from .ast import (BooleanQuery, Clause, MatchNoQuery, Occur, PhraseQuery,
                  TermQuery, rewrite)

_TOKEN_SPLIT = re.compile(r'\s+')
_LEX = re.compile(r'"[^"]*"|\(|\)|[^\s()]+')


def parse_query(text: str, analyzer: StandardAnalyzer):
    """Parse classic-subset syntax → normalized query AST."""
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
            occur = Occur.SHOULD
            if t in ("NOT", "!"):
                advance()
                t = peek()
                if t is None or t == ")":
                    break
                occur = Occur.MUST_NOT
            elif t.startswith("+") and len(t) > 1:
                occur = Occur.MUST
                tokens[pos[0]] = t[1:]
                t = tokens[pos[0]]
            elif t.startswith("-") and len(t) > 1:
                occur = Occur.MUST_NOT
                tokens[pos[0]] = t[1:]
                t = tokens[pos[0]]

            sub = parse_atom()
            if pending_op == "AND" and occur == Occur.SHOULD:
                occur = Occur.MUST
                # retroactively promote the left neighbor, classic-parser style
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = Clause(Occur.MUST, clauses[-1].query)
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
        if t.startswith('"'):
            toks = analyzer.tokens(t.strip('"'))
            if not toks:
                return None
            if len(toks) == 1:
                return TermQuery(toks[0])
            return PhraseQuery(tuple(toks))
        toks = analyzer.tokens(t)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        # one input word analyzed to several tokens → OR of terms
        return BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(x)) for x in toks))

    q = parse_boolean()
    if not q.clauses:
        return MatchNoQuery()
    return rewrite(q)
