"""PhraseWildcardQuery (`sandbox/.../PhraseWildcardQuery.java:64`):
expansion semantics (dictionary-driven, capped, empty-slot
short-circuit) and execution equivalence to the explicit
MultiPhraseQuery the rewrite produces."""

import warnings

import pytest

from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import MatchNoQuery, MultiPhraseQuery
from lucene_solr_spark.search.phrase_wildcard import phrase_wildcard_query

ROWS = [
    "merge sort fast",       # 0: merge->sort
    "merge scan table",      # 1: merge->scan
    "sort merge join",       # 2: merge->join (no s-term follows)
    "merge merge stream",    # 3: merge->merge, merge->stream
    "big scan merge",        # 4: merge at end
    "merge slow slow scan",  # 5: merge->slow
]


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ROWS)], "doc_id long, text string")
    idx = IndexBuilder(grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return Searcher(spark, idx)


def test_expansion_matches_dictionary(searcher):
    q = phrase_wildcard_query(searcher.index.terms, ("merge", "s*"))
    assert isinstance(q, MultiPhraseQuery)
    assert q.slots[0] == ("merge",)
    assert set(q.slots[1]) == {"sort", "scan", "stream", "slow"}


def test_equivalent_to_explicit_multiphrase(searcher):
    wq = phrase_wildcard_query(searcher.index.terms, ("merge", "s*"))
    eq = MultiPhraseQuery((("merge",),
                           ("scan", "slow", "sort", "stream")))
    got = sorted(map(tuple, searcher.score_all(wq, mode="f64")
                     .select("doc_id", "score").collect()))
    want = sorted(map(tuple, searcher.score_all(eq, mode="f64")
                      .select("doc_id", "score").collect()))
    assert got == want
    assert sorted(d for d, _ in got) == [0, 1, 3, 5]


def test_empty_expansion_short_circuits(searcher):
    q = phrase_wildcard_query(searcher.index.terms, ("merge", "zz*"))
    assert isinstance(q, MatchNoQuery)


def test_max_expansions_cap_warns_and_keeps_top_df(searcher):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        q = phrase_wildcard_query(searcher.index.terms, ("merge", "s*"),
                                  max_expansions=2)
    assert any(issubclass(x.category, RuntimeWarning) for x in w)
    assert len(q.slots[1]) == 2
    # top-terms rewrite order: df desc, term asc — scan(2)=slow(2)? df:
    # scan appears in docs 1,4,5 (df 3); slow in doc 5 only (df 1);
    # sort in 0,2 (df 2); stream in 3 (df 1) -> top2 = scan, sort
    assert set(q.slots[1]) == {"scan", "sort"}


def test_plain_slots_pass_through(searcher):
    q = phrase_wildcard_query(searcher.index.terms, ("merge", "join"))
    assert isinstance(q, MultiPhraseQuery)
    assert q.slots == (("merge",), ("join",))
