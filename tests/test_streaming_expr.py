"""Solr streaming expressions (`solrj/io/stream`) — parser pins +
decorator semantics vs hand-computed expectations
(StreamExpressionTest.java coverage shape)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.streaming_expr import (Expr, StreamFactory,
                                                     parse_stream_expr)


def test_parser():
    e = parse_stream_expr(
        'rollup(search(col1, q="a:b \\"x\\"", fl="a,b", sort="a asc"), '
        'over="a", sum(b), count(*))')
    assert e.name == "rollup"
    assert isinstance(e.args[0], Expr) and e.args[0].name == "search"
    assert e.args[0].args[0] == "col1"
    assert e.args[0].params["q"] == 'a:b "x"'
    assert e.args[0].params["sort"] == "a asc"
    assert [a.name for a in e.args[1:]] == ["sum", "count"]
    assert e.args[1].args == ["b"] and e.args[2].args == ["*"]
    assert e.params["over"] == "a"
    with pytest.raises(ValueError, match="trailing"):
        parse_stream_expr("search(a, fl=\"x\") junk")
    with pytest.raises(ValueError):
        parse_stream_expr("search(a, fl=")


ROWS = [
    (0, "merge fast table", "en", 10),
    (1, "merge slow scan", "en", 30),
    (2, "merge table", "fr", 20),
    (3, "other words", "fr", 40),
    (4, "merge merge fast", "de", 50),
    (5, "fast scan", "de", 60),
]


@pytest.fixture(scope="module")
def factory(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, n long")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=4).build(spark, docs)
    idx.postings = idx.postings.cache()
    return StreamFactory({"docs": (docs, Searcher(spark, idx))})


def test_search_export_and_rows(factory):
    got = factory.dataframe(
        'search(docs, q="merge", fl="doc_id,lang", sort="doc_id asc", '
        'qt="/export")').collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2, 4]
    # /select caps at rows
    got = factory.dataframe(
        'search(docs, q="merge", fl="doc_id", sort="doc_id desc", '
        'rows="2")').collect()
    assert [r["doc_id"] for r in got] == [4, 2]
    # match-all without index query
    got = factory.dataframe(
        'search(docs, q="*:*", fl="doc_id", sort="doc_id asc", '
        'qt="/export")').collect()
    assert len(got) == 6


def test_rollup_and_having(factory):
    df = factory.dataframe(
        'rollup(search(docs, q="merge", fl="doc_id,lang,n", '
        'sort="lang asc", qt="/export"), over="lang", sum(n), count(*))')
    got = {r["lang"]: (r["sum(n)"], r["count(*)"]) for r in df.collect()}
    assert got == {"en": (40, 2), "fr": (20, 1), "de": (50, 1)}
    had = factory.dataframe(
        'having(rollup(search(docs, q="merge", fl="doc_id,lang,n", '
        'sort="lang asc", qt="/export"), over="lang", sum(n), count(*)), '
        'and(gt(sum(n), 30), eq(count(*), 1)))').collect()
    assert [r["lang"] for r in had] == ["de"]


def test_select_unique_top(factory):
    df = factory.dataframe(
        'select(search(docs, q="*:*", fl="doc_id,n", sort="doc_id asc", '
        'qt="/export"), doc_id, "n as weight")')
    assert df.columns == ["doc_id", "weight"]
    # unique over lang keeps the first tuple in doc_id order
    uq = factory.dataframe(
        'unique(search(docs, q="*:*", fl="doc_id,lang", '
        'sort="doc_id asc", qt="/export"), over="lang")').collect()
    assert sorted((r["lang"], r["doc_id"]) for r in uq) == [
        ("de", 4), ("en", 0), ("fr", 2)]
    top = factory.dataframe(
        'top(search(docs, q="*:*", fl="doc_id,n", sort="doc_id asc", '
        'qt="/export"), n="2", sort="n desc")').collect()
    assert [r["doc_id"] for r in top] == [5, 4]


def test_joins_merge_setops(factory):
    jn = factory.dataframe(
        'innerJoin(search(docs, q="merge", fl="doc_id,lang", '
        'sort="doc_id asc", qt="/export"), search(docs, q="fast", '
        'fl="doc_id,n", sort="doc_id asc", qt="/export"), '
        'on="doc_id")').collect()
    assert sorted(r["doc_id"] for r in jn) == [0, 4]
    assert {c for c in jn[0].asDict()} == {"doc_id", "lang", "n"}
    lo = factory.dataframe(
        'leftOuterJoin(search(docs, q="merge", fl="doc_id,lang", '
        'sort="doc_id asc", qt="/export"), search(docs, q="fast", '
        'fl="doc_id,n", sort="doc_id asc", qt="/export"), '
        'on="doc_id")').collect()
    got = {r["doc_id"]: r["n"] for r in lo}
    assert got == {0: 10, 1: None, 2: None, 4: 50}
    mg = factory.dataframe(
        'merge(search(docs, q="table", fl="doc_id", sort="doc_id asc", '
        'qt="/export"), search(docs, q="scan", fl="doc_id", '
        'sort="doc_id asc", qt="/export"), on="doc_id asc")').collect()
    assert [r["doc_id"] for r in mg] == [0, 1, 2, 5]
    ix = factory.dataframe(
        'intersect(search(docs, q="merge", fl="doc_id", sort="doc_id asc", '
        'qt="/export"), search(docs, q="fast", fl="doc_id", '
        'sort="doc_id asc", qt="/export"), on="doc_id")').collect()
    assert sorted(r["doc_id"] for r in ix) == [0, 4]
    cp = factory.dataframe(
        'complement(search(docs, q="merge", fl="doc_id", '
        'sort="doc_id asc", qt="/export"), search(docs, q="fast", '
        'fl="doc_id", sort="doc_id asc", qt="/export"), '
        'on="doc_id")').collect()
    assert sorted(r["doc_id"] for r in cp) == [1, 2]


def test_search_errors(factory):
    with pytest.raises(KeyError, match="unknown collection"):
        factory.dataframe('search(nope, q="x", fl="doc_id", '
                          'sort="doc_id asc")')
    with pytest.raises(ValueError, match="fl="):
        factory.dataframe('search(docs, q="x", sort="doc_id asc")')
    with pytest.raises(ValueError, match="unknown stream function"):
        factory.dataframe('frobnicate(search(docs, q="x", fl="a", '
                          'sort="a asc"))')


def test_facet_and_stats(factory):
    fc = factory.dataframe(
        'facet(docs, q="merge", buckets="lang", '
        'bucketSorts="count(*) desc, lang asc", bucketSizeLimit="2", '
        'count(*), sum(n))').collect()
    assert [(r["lang"], r["count(*)"], r["sum(n)"]) for r in fc] == [
        ("en", 2, 40), ("de", 1, 50)]
    st = factory.dataframe(
        'stats(docs, q="merge", sum(n), avg(n), count(*))').collect()
    assert len(st) == 1
    assert (st[0]["sum(n)"], st[0]["count(*)"]) == (110, 4)
    assert st[0]["avg(n)"] == pytest.approx(110 / 4)


def test_fetch(factory):
    got = factory.dataframe(
        'fetch(docs, search(docs, q="merge", fl="doc_id", '
        'sort="doc_id asc", qt="/export"), on="doc_id=doc_id", '
        'fl="lang,n")').collect()
    assert [(r["doc_id"], r["lang"], r["n"]) for r in got] == [
        (0, "en", 10), (1, "en", 30), (2, "fr", 20), (4, "de", 50)]
    with pytest.raises(ValueError, match="fl="):
        factory.dataframe('fetch(docs, search(docs, q="merge", '
                          'fl="doc_id", sort="doc_id asc", '
                          'qt="/export"), on="doc_id=doc_id")')


def test_shortest_path_stream(spark, factory):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "src string, dst string")
    sf = StreamFactory({"edges": (edges, None)})
    got = sf.dataframe('shortestPath(edges, from="a", to="d", '
                       'edge="src=dst", maxDepth=4)').collect()
    assert sorted(r["path"] for r in got) == ["a->b->d", "a->c->d"]


def test_knn_stream(factory):
    # seed doc 0 "merge fast table": nearest by MLT must share terms
    got = factory.dataframe(
        'knn(docs, id="0", qf="text", k="3", mintf="1", mindf="1")'
    ).collect()
    assert len(got) == 3
    ids = [r["doc_id"] for r in got]
    assert 0 not in ids
    # every hit shares a seed term (merge/fast/table)
    assert set(ids) <= {1, 2, 4, 5}
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
