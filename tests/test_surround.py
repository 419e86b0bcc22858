"""Surround query parser: grammar pins (AST equality) + execution
equivalence to hand-built span/boolean queries, mirroring the
reference's Test02Boolean/Test03Distance coverage shapes."""

import pytest

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (
    BooleanQuery, Clause, Occur, SpanNearQuery, SpanOrQuery,
    SpanTermQuery,
)
from lucene_solr_spark.search.surround import (
    MAX_BASIC_QUERIES, SrndTruncSpan, parse_surround, rewrite_surround,
)

ANN = StandardAnalyzer(stop_words=frozenset())


def test_parse_distance_ops():
    # bare W = distance 1 -> slop 0, ordered (DistanceQuery.java:97)
    assert parse_surround("aa w bb") == SpanNearQuery(
        terms=("aa", "bb"), slop=0, in_order=True)
    assert parse_surround("aa 3w bb") == SpanNearQuery(
        terms=("aa", "bb"), slop=2, in_order=True)
    assert parse_surround("aa 4N bb") == SpanNearQuery(
        terms=("aa", "bb"), slop=3, in_order=False)
    # infix chain folds into ONE near; last operator's distance wins
    assert parse_surround("aa w bb 5w cc") == SpanNearQuery(
        terms=("aa", "bb", "cc"), slop=4, in_order=True)
    # prefix form
    assert parse_surround("3w(aa, bb, cc)") == SpanNearQuery(
        terms=("aa", "bb", "cc"), slop=2, in_order=True)
    # N binds looser than W
    assert parse_surround("aa w bb n cc") == SpanNearQuery(
        clauses=(SpanNearQuery(terms=("aa", "bb"), slop=0),
                 SpanTermQuery("cc")), slop=0, in_order=False)


def test_parse_boolean_and_field():
    q = parse_surround("aa AND bb OR cc")
    assert isinstance(q, BooleanQuery)
    g = q.grouped()
    assert len(g[Occur.SHOULD]) == 2
    # OR inside a distance op -> SpanOr operand
    q = parse_surround("(aa or bb) w cc")
    assert q == SpanNearQuery(clauses=(
        SpanOrQuery((SpanTermQuery("aa"), SpanTermQuery("bb"))),
        SpanTermQuery("cc")), slop=0, in_order=True)
    # NOT infix
    q = parse_surround("aa NOT bb")
    assert q.grouped()[Occur.MUST_NOT] == [SpanTermQuery("bb")]
    # AND/NOT are not span-capable inside a distance op
    with pytest.raises(ValueError, match="distance"):
        parse_surround("(aa and bb) w cc")
    # field prefix applies to the whole operand
    q = parse_surround("title:(aa w bb)")
    assert q == SpanNearQuery(terms=("aa", "bb"), slop=0, field="title")
    # truncation becomes a placeholder
    assert parse_surround("ab* w cc").clauses[0] == SrndTruncSpan("ab*")


def _mk(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return Searcher(spark, idx)


def test_execute_equivalence(spark):
    s = _mk(spark, ["aa bb cc", "aa xx bb", "bb aa", "aa zz zz bb",
                    "abc aa", "abd cc aa"])
    for text, built in [
        ("aa w bb", SpanNearQuery(terms=("aa", "bb"), slop=0)),
        ("aa 3n bb", SpanNearQuery(terms=("aa", "bb"), slop=2,
                                   in_order=False)),
    ]:
        got = s.top_k(rewrite_surround(s, parse_surround(text)), k=10)
        exp = s.top_k(built, k=10)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        assert got["score"].tolist() == exp["score"].tolist()
    # truncation in span position expands to SpanOr of matching terms
    q = rewrite_surround(s, parse_surround("ab* w aa"))
    assert q == SpanNearQuery(clauses=(
        SpanOrQuery((SpanTermQuery("abc"), SpanTermQuery("abd"))),
        SpanTermQuery("aa")), slop=0, in_order=True)
    got = s.top_k(q, k=10)
    assert sorted(got["doc_id"].astype(int).tolist()) == [4]
    # unmatched truncation -> MatchNo -> empty result
    q = rewrite_surround(s, parse_surround("zz9* w aa"))
    assert s.top_k(q, k=10).empty


def test_too_many_basic_queries(spark):
    rows = [" ".join(f"t{i:04d}" for i in range(j, j + 40))
            for j in range(0, 2000, 40)]
    s = _mk(spark, rows)
    with pytest.raises(ValueError, match="TooManyBasicQueries"):
        rewrite_surround(s, parse_surround("t* w t0001"))
