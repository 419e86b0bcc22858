"""Pure-negation routing guard (VERDICT r4 #9): grounded query trees
must NEVER take the `_score_unbounded` live-docs composition — that
path inherently streams ALL live docs (as Lucene's MatchAllDocsQuery
rewrite of a pure-negation BooleanQuery must), so reaching it for a
kernel-servable shape would silently trade a postings-bounded scan for
a corpus scan. Cost envelope documented in docs/PLANS.md
("Pure-negation composition")."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search.ast import (BooleanQuery, Clause,
                                          DisjunctionMaxQuery, MatchAllQuery,
                                          Occur, PhraseQuery, TermQuery)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    return Searcher(spark, idx)


def _is_unbounded(plan) -> bool:
    return isinstance(plan, dict) and "unbounded" in plan


GROUNDED = [
    TermQuery("merge"),
    PhraseQuery(("merge", "plan")),
    BooleanQuery((Clause(Occur.MUST, TermQuery("merge")),
                  Clause(Occur.MUST, TermQuery("plan")))),
    BooleanQuery((Clause(Occur.SHOULD, TermQuery("merge")),
                  Clause(Occur.SHOULD, TermQuery("plan")))),
    # MUST_NOT bounded by a positive sibling — the Lucene-normal shape
    BooleanQuery((Clause(Occur.MUST, TermQuery("merge")),
                  Clause(Occur.MUST_NOT, TermQuery("plan")))),
    # nested: (a AND b) OR (c AND NOT d) — every branch anchored
    BooleanQuery((
        Clause(Occur.SHOULD, BooleanQuery((
            Clause(Occur.MUST, TermQuery("merge")),
            Clause(Occur.MUST, TermQuery("plan"))))),
        Clause(Occur.SHOULD, BooleanQuery((
            Clause(Occur.MUST, TermQuery("scan")),
            Clause(Occur.MUST_NOT, TermQuery("slow"))))))),
    DisjunctionMaxQuery((TermQuery("merge"), TermQuery("plan")), 0.1),
    # FILTER ∧ MatchAll folds away, leaving the grounded term
    BooleanQuery((Clause(Occur.MUST, TermQuery("merge")),
                  Clause(Occur.FILTER, MatchAllQuery()))),
]


@pytest.mark.parametrize("q", GROUNDED, ids=lambda q: type(q).__name__)
def test_grounded_trees_never_take_unbounded_path(searcher, q):
    assert not _is_unbounded(searcher._plan(q))


def test_parsed_grounded_queries_stay_in_kernel(searcher):
    for s in ("merge AND plan", "merge -plan", '"merge plan"~2',
              "(merge OR plan) AND scan", "merge plan scan"):
        assert not _is_unbounded(searcher._plan(
            parse_query(s, ENGLISH_ANALYZER))), s


def test_pure_must_not_rewrites_to_match_no(searcher):
    """Lucene: a BooleanQuery of only prohibited clauses matches
    NOTHING (it never reaches the live-docs path — there is no
    MatchAll to ground it)."""
    q = BooleanQuery((Clause(Occur.MUST_NOT, TermQuery("merge")),))
    assert searcher._plan(q) is None
    assert searcher.count(q) == 0


def test_negation_wrapper_takes_unbounded_and_matches_complement(searcher):
    """The shape that must route to the live-docs composition — a
    MatchAll grounded only by excludes (SimpleQueryParser '-term') —
    and its result set must equal live_docs minus the negated
    matches."""
    q = BooleanQuery((Clause(Occur.MUST, MatchAllQuery()),
                      Clause(Occur.MUST_NOT, TermQuery("merge"))))
    assert _is_unbounded(searcher._plan(q))
    got = {r["doc_id"] for r in searcher.match_docs(q).collect()}
    live = {r["doc_id"] for r in searcher._all_live_docs().collect()}
    pos = {r["doc_id"]
           for r in searcher.match_docs(TermQuery("merge")).collect()}
    assert got == live - pos and pos  # non-trivial complement
