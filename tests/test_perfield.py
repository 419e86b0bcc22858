"""PerFieldAnalyzerWrapper — per-field chains at index AND query time.

Reference: `analysis/miscellaneous/PerFieldAnalyzerWrapper.java:33`.
Headline contract: with a no-stopwords title chain over a stopworded
text chain, ``title:the`` matches while ``text:the`` analyzes to
nothing — both sides resolved through the same wrapper.
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.analysis.analyzer import (ENGLISH_ANALYZER,
                                                 ENGLISH_STOP_WORDS,
                                                 StandardAnalyzer)
from lucene_solr_spark.analysis.perfield import PerFieldAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search.ast import MatchNoQuery, TermQuery

TITLE_AN = StandardAnalyzer()                       # no stops
WRAPPED = PerFieldAnalyzer(default=ENGLISH_ANALYZER,
                           overrides=(("title", TITLE_AN),))

ROWS = [
    (0, "the merge runs fast", "The Fast Merge"),
    (1, "a slow scan of the table", "The Table Scan"),
    (2, "merge table data", "Data Merge"),
]


def test_query_analysis_routes_per_field():
    q = parse_query("title:the", WRAPPED)
    assert isinstance(q, TermQuery) and q.term == "the" and q.field == "title"
    assert isinstance(parse_query("text:the", WRAPPED), MatchNoQuery)
    # phrase analysis routes too: stopword survives in the title phrase
    qp = parse_query('title:"the fast"', WRAPPED)
    assert getattr(qp, "terms", None) == ("the", "fast")


def test_field_blind_delegation():
    assert WRAPPED.tokens("the fast merge") == \
        ENGLISH_ANALYZER.tokens("the fast merge")
    assert WRAPPED.for_field("title").tokens("the fast merge") == \
        ["the", "fast", "merge"]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, "
                                       "title string")
    b = IndexBuilder(WRAPPED, grid=4, with_positions=True,
                     fields=("text", "title"))
    return docs, b.build(spark, docs)


def test_index_per_field_chains(spark, idx):
    docs, index = idx
    terms = {(r["field"], r["term"]) for r in index.terms.collect()}
    assert ("title", "the") in terms      # title chain keeps stops
    assert ("text", "the") not in terms   # text chain drops them
    assert ("text", "merge") in terms and ("title", "merge") in terms


def test_search_per_field(spark, idx):
    docs, index = idx
    s = Searcher(spark, index)
    hits = s.top_k(parse_query("title:the", WRAPPED), k=5)
    assert sorted(int(d) for d in hits["doc_id"]) == [0, 1]
    hits2 = s.top_k(parse_query('title:"the table scan"', WRAPPED), k=5)
    assert [int(d) for d in hits2["doc_id"]] == [1]


def test_mixed_paths_one_build(spark):
    """A custom (per-doc-path) title chain beside the batch-path text
    chain in the SAME build."""
    from lucene_solr_spark.analysis.custom import (CustomAnalyzer,
                                                   lowercase_filter)
    custom_title = CustomAnalyzer(token_filters=(lowercase_filter(),))
    wrapped = PerFieldAnalyzer(default=ENGLISH_ANALYZER,
                               overrides=(("title", custom_title),))
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, "
                                       "title string")
    index = IndexBuilder(wrapped, grid=4, with_positions=True,
                         fields=("text", "title")).build(spark, docs)
    terms = {(r["field"], r["term"]) for r in index.terms.collect()}
    assert ("title", "the") in terms and ("text", "the") not in terms
