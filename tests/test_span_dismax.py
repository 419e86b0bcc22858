"""Ordered span-near + DisMax handler differentials (engine vs
pure-Python oracle; CheckHits pattern), including the documented
span-near divergence from Lucene's minimal-span enumeration."""

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER, StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import SpanNearQuery
from lucene_solr_spark.search.dismax import dismax_query

from conftest import SF_DIR

K = 10
ANN = StandardAnalyzer(stop_words=frozenset())


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pdf = docs.select("doc_id", "text").toPandas()
    oracle = OracleIndex(ENGLISH_ANALYZER)
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        oracle.add(int(d), t)
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=64, with_positions=True
                       ).build(spark, docs).cache()
    return oracle, Searcher(spark, idx)


def _assert_equal(got, exp, label):
    assert got["doc_id"].astype(int).tolist() == [d for d, _ in exp], label
    np.testing.assert_array_equal(
        got["score"].to_numpy().astype(np.float32),
        np.array([s for _, s in exp], dtype=np.float32), err_msg=label)


def _bigram(oracle):
    pos = oracle.positions["text"]
    for t1, docs in pos.items():
        for d, ps in docs.items():
            nxt = {p + 1 for p in ps}
            for t2, docs2 in pos.items():
                if d in docs2 and nxt & set(docs2[d]):
                    return t1, t2
    raise AssertionError("no bigram")


def test_span_near_matches_oracle(corpus):
    oracle, searcher = corpus
    t1, t2 = _bigram(oracle)
    for slop in (0, 2, 5):
        q = SpanNearQuery((t1, t2), slop=slop)
        got = searcher.top_k(q, k=K)
        exp = oracle.search_ast(q, k=K)
        _assert_equal(got, exp, f"span {t1}..{t2}~{slop}")


def test_span_order_matters(spark):
    """'aa ... bb' ordered: 'bb aa' must NOT match (the unordered /
    sloppy-phrase surface covers transpositions)."""
    docs = spark.createDataFrame(
        [(0, "aa xx bb"), (1, "bb xx aa"), (2, "aa bb")],
        "doc_id long, text string")
    oracle = OracleIndex(ANN)
    for r in docs.collect():
        oracle.add(r["doc_id"], r["text"])
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    s = Searcher(spark, idx)
    got = s.top_k(SpanNearQuery(("aa", "bb"), slop=3), k=K)
    ids = got["doc_id"].astype(int).tolist()
    assert 0 in ids and 2 in ids and 1 not in ids
    exp = oracle.search_ast(SpanNearQuery(("aa", "bb"), slop=3), k=K)
    _assert_equal(got, exp, "ordered span")


def test_span_divergence_pinned(spark):
    """Documented spec divergence (SpanNearQuery docstring): one
    candidate span per FIRST-term occurrence, chained greedily — on
    'aa aa bb' with slop 1 BOTH 'aa' anchors chain to the same 'bb'
    (gaps 1 and 0), span freq 1/2 + 1 = 1.5; Lucene's minimal-span
    enumeration would emit the two overlapping spans as well here, but
    on deeper overlapping repeats the freqs can differ. Engine and
    oracle must agree with each other regardless."""
    docs = spark.createDataFrame(
        [(0, "aa aa bb"), (1, "aa bb aa bb")], "doc_id long, text string")
    oracle = OracleIndex(ANN)
    for r in docs.collect():
        oracle.add(r["doc_id"], r["text"])
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    s = Searcher(spark, idx)
    q = SpanNearQuery(("aa", "bb"), slop=1)
    got = s.top_k(q, k=K)
    exp = oracle.search_ast(q, k=K)
    _assert_equal(got, exp, "repeated-anchor span")


def test_dismax_handler_matches_oracle(corpus):
    oracle, searcher = corpus
    # single-field qf: plain OR of terms with dismax degenerating away
    q = dismax_query("spark merge", ENGLISH_ANALYZER,
                     qf={"text": 1.0}, tie=0.3)
    got = searcher.top_k(q, k=K)
    exp = oracle.search_ast(q, k=K)
    _assert_equal(got, exp, "dismax single-field")
    # mm applies to the term clauses
    q2 = dismax_query("spark merge fast", ENGLISH_ANALYZER,
                      qf={"text": 1.0}, tie=0.0, mm=2)
    got2 = searcher.top_k(q2, k=K)
    exp2 = oracle.search_ast(q2, k=K)
    _assert_equal(got2, exp2, "dismax mm=2")


def test_dismax_pf_phrase_boost(corpus):
    """pf adds a REQUIRED-main + optional-phrase shape (tree path):
    docs matching the full query as a phrase rank above equal-term
    docs."""
    oracle, searcher = corpus
    t1, t2 = _bigram(oracle)
    q = dismax_query(f"{t1} {t2}", ENGLISH_ANALYZER,
                     qf={"text": 1.0}, tie=0.0, pf={"text": 2.0})
    got = searcher.top_k(q, k=K)
    exp = oracle.search_ast(q, k=K)
    _assert_equal(got, exp, "dismax pf")
