"""MultiPhraseQuery semantics beyond the oracle gate.

Reference: `search/MultiPhraseQuery.java:58` — each phrase position
admits several terms; matching unions the slot's postings
(UnionPostingsEnum) and one SimScorer is built over all terms' stats
(MultiPhraseWeight ctor). Engine spec divergence pinned here: df == 0
terms are dropped from matching AND the weight sum (Lucene keeps their
zero-df stats in the SimScorer); an empty slot kills the clause.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (BooleanQuery, Clause,
                                          DisjunctionMaxQuery,
                                          MultiPhraseQuery, Occur,
                                          PhraseQuery, TermQuery)
from lucene_solr_spark.oracle.pyoracle import OracleIndex
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def searcher(spark, docs):
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    return Searcher(spark, idx)


@pytest.fixture(scope="module")
def oracle(docs):
    ora = OracleIndex(ENGLISH_ANALYZER)
    for r in docs.collect():
        ora.add(r["doc_id"], r["text"])
    return ora


MP = MultiPhraseQuery((("merge",), ("group", "order")))


def _cmp(searcher, oracle, q, k=10):
    pdf = searcher.top_k(q, k=k)
    eng = [(int(d), float(s)) for d, s in zip(pdf["doc_id"], pdf["score"])]
    orc = [(int(d), float(s)) for d, s in oracle.search_ast(q, k=k)]
    assert len(eng) == len(orc)
    for a, b in zip(eng, orc):
        assert a[0] == b[0]
        assert math.isclose(a[1], b[1], rel_tol=1e-6)
    return eng


def test_exact_multiphrase_matches_oracle(searcher, oracle):
    assert _cmp(searcher, oracle, MP)


def test_sloppy_multiphrase_matches_oracle(searcher, oracle):
    q = MultiPhraseQuery((("merge",), ("group", "order")), slop=2)
    assert _cmp(searcher, oracle, q)


def test_union_is_superset_of_each_alternative(searcher):
    """A multiphrase hit set contains every single-alternative phrase's
    hit set (UnionPostingsEnum: any alternative matches the slot)."""
    mp = searcher.score_all(MP, mode="f64").toPandas()
    got = set(mp["doc_id"])
    for alt in ("group", "order"):
        ph = searcher.score_all(PhraseQuery(("merge", alt)),
                                mode="f64").toPandas()
        assert set(ph["doc_id"]) <= got


def test_dead_term_dropped_empty_slot_kills(searcher, oracle):
    # dead alternative alongside a live one: matches as if absent
    q = MultiPhraseQuery((("merge",), ("group", "order", "zzznope")))
    assert _cmp(searcher, oracle, q)
    # every slot alternative dead -> no hits
    q = MultiPhraseQuery((("merge",), ("zzznope",)))
    assert searcher.score_all(q, mode="f64").count() == 0
    assert oracle.search_ast(q) == []


def test_weight_is_sum_of_all_live_idfs(searcher, oracle):
    """BM25 score uses weight = Σ idf over every live term in every
    slot (MultiPhraseWeight builds ONE SimScorer over all term stats),
    so adding an alternative raises matching docs' scores even when
    the match count is unchanged for them."""
    base = searcher.score_all(PhraseQuery(("merge", "group")),
                              mode="f64").toPandas().set_index("doc_id")
    mp = searcher.score_all(MultiPhraseQuery((("merge",), ("group",))),
                            mode="f64").toPandas().set_index("doc_id")
    # single-alternative multiphrase == plain phrase, bit-for-bit
    assert set(base.index) == set(mp.index)
    for d in base.index:
        assert math.isclose(base.loc[d, "score"], mp.loc[d, "score"],
                            rel_tol=1e-12)
    wide = searcher.score_all(MP, mode="f64").toPandas().set_index("doc_id")
    for d in base.index:
        assert wide.loc[d, "score"] > base.loc[d, "score"]


def test_in_boolean_and_dismax_and_must_not(searcher, oracle):
    q = BooleanQuery((Clause(Occur.MUST, MP),
                      Clause(Occur.SHOULD, TermQuery("spark"))))
    assert _cmp(searcher, oracle, q)
    q = DisjunctionMaxQuery((MP, TermQuery("spark")), tie_breaker=0.3)
    assert _cmp(searcher, oracle, q)
    q = BooleanQuery((Clause(Occur.MUST, TermQuery("spark")),
                      Clause(Occur.MUST_NOT, MP)))
    hits = _cmp(searcher, oracle, q, k=50)
    excluded = set(searcher.score_all(MP, mode="f64")
                   .toPandas()["doc_id"])
    assert not excluded & {d for d, _ in hits}


def test_nested_tree_plan(searcher, oracle):
    """(multiphrase AND term) OR (term AND term) exercises the
    recursive tree kernel path."""
    q = BooleanQuery((
        Clause(Occur.SHOULD, BooleanQuery((
            Clause(Occur.MUST, MP),
            Clause(Occur.MUST, TermQuery("spark"))))),
        Clause(Occur.SHOULD, BooleanQuery((
            Clause(Occur.MUST, TermQuery("fast")),
            Clause(Occur.MUST, TermQuery("table")))))))
    assert _cmp(searcher, oracle, q)


def test_prune_equals_exhaustive(searcher):
    q = MultiPhraseQuery((("merge",), ("group", "order")), slop=1)
    a = searcher.top_k(q, k=10, prune=True)
    b = searcher.top_k(q, k=10, prune=False)
    assert a.equals(b)
