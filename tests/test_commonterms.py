"""CommonTermsQuery df-split rewrite (`queries/CommonTermsQuery.java`).

Pins the group split (ratio and absolute cutoffs, absent terms), the
low-empty conjunction hardening, msm resolution, and engine≡pyoracle
score identity for the rewritten boolean.
"""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.oracle.pyoracle import OracleIndex
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (BooleanQuery, BoostQuery, Clause,
                                          MatchNoQuery, Occur, TermQuery)
from lucene_solr_spark.search.commonterms import (CommonTermsQuery,
                                                  doc_freqs,
                                                  rewrite_common_terms)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    ora = OracleIndex(ENGLISH_ANALYZER)
    for r in docs.collect():
        ora.add(r["doc_id"], r["text"])
    return Searcher(spark, idx), ora


def _groups(q):
    """(low_terms, low_occur, high_terms, high_occur) of a rewrite."""
    low = high = None
    low_occur = high_occur = None
    for cl in q.clauses:
        inner = cl.query.query if isinstance(cl.query, BoostQuery) else cl.query
        terms = tuple(c.query.term for c in inner.clauses)
        occur = inner.clauses[0].occur
        if cl.occur == Occur.MUST:
            low, low_occur = terms, occur
        else:
            high, high_occur = terms, occur
    return low, low_occur, high, high_occur


def test_split_by_ratio_and_absent_terms(env):
    searcher, _ = env
    n = int(searcher.index.stats["doc_count"])
    dfs = doc_freqs(searcher, ["dup", "merge", "table", "zzznope"])
    assert dfs["dup"] < math.ceil(0.5 * n) < dfs["merge"]
    assert "zzznope" not in dfs
    q = rewrite_common_terms(searcher, CommonTermsQuery(
        ("dup", "merge", "table", "zzznope"), max_term_frequency=0.5))
    low, low_occur, high, high_occur = _groups(q)
    assert set(low) == {"dup", "zzznope"} and low_occur == Occur.SHOULD
    assert set(high) == {"merge", "table"} and high_occur == Occur.SHOULD


def test_absolute_cutoff(env):
    searcher, _ = env
    dfs = doc_freqs(searcher, ["dup", "merge"])
    cut = float(dfs["dup"])          # df > cut → high
    q = rewrite_common_terms(searcher, CommonTermsQuery(
        ("dup", "merge"), max_term_frequency=cut))
    low, _, high, _ = _groups(q)
    assert low == ("dup",) and high == ("merge",)


def test_low_empty_hardens_to_conjunction(env):
    searcher, ora = env
    q = rewrite_common_terms(searcher, CommonTermsQuery(
        ("merge", "table"), max_term_frequency=0.5))
    _, _, high, high_occur = _groups(q)
    assert high == ("merge", "table") and high_occur == Occur.MUST
    # conjunction semantics: every hit contains both terms
    eng = searcher.score_all(q, mode="f64").toPandas()
    both = (set(searcher.score_all(TermQuery("merge"), mode="f64")
                .toPandas()["doc_id"])
            & set(searcher.score_all(TermQuery("table"), mode="f64")
                  .toPandas()["doc_id"]))
    assert set(eng["doc_id"]) == both


def test_degenerate_shapes(env):
    searcher, _ = env
    assert isinstance(rewrite_common_terms(
        searcher, CommonTermsQuery(())), MatchNoQuery)
    assert rewrite_common_terms(
        searcher, CommonTermsQuery(("merge",))) == TermQuery("merge")
    with pytest.raises(ValueError):
        CommonTermsQuery(("a",), low_freq_occur=Occur.MUST_NOT)


def test_msm_and_oracle_identity(env):
    searcher, ora = env
    for ctq in (
        CommonTermsQuery(("dup", "merge", "table"), max_term_frequency=0.5),
        CommonTermsQuery(("dup", "merge", "table", "spark"),
                         max_term_frequency=0.5,
                         high_freq_min_should_match=2.0),
        CommonTermsQuery(("dup", "merge", "table", "spark"),
                         max_term_frequency=0.5,
                         high_freq_min_should_match=0.67),
        CommonTermsQuery(("dup", "key"), max_term_frequency=0.5,
                         low_freq_occur=Occur.MUST),
    ):
        q = rewrite_common_terms(searcher, ctq)
        pdf = searcher.top_k(q, k=10)
        eng = [(int(d), float(s))
               for d, s in zip(pdf["doc_id"], pdf["score"])]
        orc = [(int(d), float(s)) for d, s in ora.search_ast(q, k=10)]
        assert len(eng) == len(orc) and eng, ctq
        for a, b in zip(eng, orc):
            assert a[0] == b[0]
            assert math.isclose(a[1], b[1], rel_tol=1e-6)


def test_fractional_msm_rounding():
    from lucene_solr_spark.search.commonterms import _min_should_match
    assert _min_should_match(0.0, 5) == 0
    assert _min_should_match(2.0, 5) == 2
    assert _min_should_match(0.5, 5) == 3      # Math.round(2.5) = 3
    assert _min_should_match(0.5, 4) == 2
    assert _min_should_match(0.67, 3) == 2
