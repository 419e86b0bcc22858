"""Query AST, parser, rewrite, and the distributed scoring executor."""

from .ast import (  # noqa: F401
    BooleanQuery, Clause, MatchAllQuery, MatchNoQuery, Occur, PhraseQuery,
    TermQuery, rewrite,
)
from .executor import Searcher  # noqa: F401
from .parser import parse_query  # noqa: F401
