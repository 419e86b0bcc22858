"""Query AST, parser, rewrite, and the distributed scoring executor."""

from .ast import (  # noqa: F401
    BooleanQuery, BoostQuery, Clause, DisjunctionMaxQuery, FuzzyQuery,
    MatchAllQuery, MatchNoQuery, Occur, PhraseQuery, PrefixQuery,
    RegexpQuery, SpanFirstQuery, SpanNearQuery, SpanNotQuery, SpanOrQuery,
    SpanTermQuery, TermQuery, TermRangeQuery, WildcardQuery, rewrite,
)
from .cache import QueryCache  # noqa: F401
from .executor import Searcher  # noqa: F401
from .explain import explain  # noqa: F401
from .localparams import solr_query  # noqa: F401  (Solr {!type} syntax; r5)
from .mlt import more_like_this  # noqa: F401  (reference-exact; r5 unification)
from .parser import parse_query  # noqa: F401
from .sql_interface import solr_sql  # noqa: F401  (Parallel SQL; r5)
from .suggest import highlight, suggest_terms  # noqa: F401
