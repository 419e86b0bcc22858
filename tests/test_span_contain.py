"""SpanContainingQuery / SpanWithinQuery / SpanPositionRangeQuery
(`search/spans/SpanContainingQuery.java:36`, `SpanWithinQuery.java:36`,
`SpanPositionRangeQuery.java:33`, `ContainSpans.java`) — behavioral
pins on hand-built corpora plus engine vs pure-Python-oracle
differentials (the TestSpanContainQuery.java coverage shape)."""

import random

import numpy as np

from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (
    SpanContainingQuery, SpanNearQuery, SpanOrQuery,
    SpanPositionRangeQuery, SpanTermQuery, SpanWithinQuery,
)
from test_span_composite import ANN, _check


def _mk(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")
    oracle = OracleIndex(ANN)
    for r in docs.collect():
        oracle.add(r["doc_id"], r["text"])
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return oracle, Searcher(spark, idx)


def test_span_containing_basic(spark):
    """TestSpanContainQuery shape: big = near(aa, bb) slop 3, little =
    'xx'. Containing keeps big spans that hold an xx; within keeps the
    xx occurrences inside a big span."""
    rows = [
        "aa xx bb",          # 0: big [0,3) holds xx@1
        "aa bb xx",          # 1: big [0,2); xx@2 outside
        "xx aa bb",          # 2: big [1,3); xx@0 outside
        "aa yy yy bb",       # 3: big [0,4), no xx
        "aa yy xx bb zz",    # 4: big [0,4) holds xx@2
    ]
    oracle, s = _mk(spark, rows)
    big = SpanNearQuery(("aa", "bb"), slop=3, in_order=True)
    little = SpanTermQuery("xx")
    _check(oracle, s, SpanContainingQuery(big, little),
           "span-containing", expect_ids=[0, 4])
    _check(oracle, s, SpanWithinQuery(big, little),
           "span-within", expect_ids=[0, 4])


def test_span_position_range(spark):
    """Spans with start ≥ 1 and end ≤ 3 only."""
    rows = ["kk aa bb", "aa bb kk", "bb kk aa kk"]
    oracle, s = _mk(spark, rows)
    q = SpanPositionRangeQuery(SpanTermQuery("kk"), start=1, end=3)
    # doc0 kk@0 (start<1), doc1 kk@2 ([2,3) ok), doc2 kk@1 ok + kk@3 not
    _check(oracle, s, q, "span-posrange", expect_ids=[1, 2])


def test_span_contain_composite_little(spark):
    """Little can itself be composite (an or over terms)."""
    rows = ["aa xx bb cc", "aa yy bb", "aa zz bb", "cc aa bb"]
    oracle, s = _mk(spark, rows)
    big = SpanNearQuery(("aa", "bb"), slop=2, in_order=True)
    little = SpanOrQuery((SpanTermQuery("xx"), SpanTermQuery("yy")))
    _check(oracle, s, SpanContainingQuery(big, little),
           "containing-or", expect_ids=[0, 1])


def test_span_contain_randomized(spark):
    rng = random.Random(31)
    vocab = ["aa", "bb", "cc", "xx"]
    rows = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
            for _ in range(40)]
    oracle, s = _mk(spark, rows)
    big = SpanNearQuery(("aa", "bb"), slop=4, in_order=True)
    un = SpanNearQuery(("aa", "cc"), slop=3, in_order=False)
    xx = SpanTermQuery("xx")
    shapes = [
        SpanContainingQuery(big, xx), SpanWithinQuery(big, xx),
        SpanContainingQuery(un, xx), SpanWithinQuery(un, xx),
        SpanContainingQuery(big, SpanNearQuery(("cc", "xx"), slop=1,
                                               in_order=True)),
        SpanPositionRangeQuery(big, start=1, end=8),
        SpanPositionRangeQuery(xx, start=2, end=6),
        SpanWithinQuery(SpanPositionRangeQuery(big, start=0, end=12), xx),
    ]
    for i, q in enumerate(shapes):
        _check(oracle, s, q, f"rand-contain-{i}")


def test_span_contain_dead_side(spark):
    """A df==0 side kills the whole filter (required-key analysis)."""
    oracle, s = _mk(spark, ["aa xx bb", "aa bb"])
    big = SpanNearQuery(("aa", "bb"), slop=2, in_order=True)
    dead = SpanTermQuery("zz_missing")
    assert len(s.top_k(SpanContainingQuery(big, dead), k=5)) == 0
    assert len(s.top_k(SpanWithinQuery(dead, big), k=5)) == 0
    np.testing.assert_array_equal(
        s.top_k(SpanContainingQuery(big, SpanTermQuery("xx")),
                k=5)["doc_id"].astype(int).to_numpy(), [0])
