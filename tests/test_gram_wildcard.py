"""Q-gram-accelerated wildcard expansion ≡ full-dictionary scan
(`search/WildcardQuery.java:42` automaton intersection analog)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search import multiterm as mt
from tests.conftest import SF_DIR

PATTERNS = [
    "sp*",        # anchored prefix literal (^sp + spa? no: 'sp' -> '^sp')
    "*ble",       # anchored suffix
    "s*k",        # two short literals, ^s? too short → 'k$'? '^s' len2 no
    "me?ge",      # ? gap
    "*erg*",      # infix literal
    "table*",     # long anchored literal
    "*a*",        # no usable literal → fallback path
    "??",         # pure wildcards → fallback
    "b*tch",      # mixed
    "*zzz*",      # no match
]


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    return Searcher(spark, idx)


def test_pattern_grams():
    assert mt._pattern_grams("spar*") == {"^sp", "spa", "par"}
    assert mt._pattern_grams("*ble") == {"ble", "le$"}
    assert mt._pattern_grams("me?ge") == {"^me", "ge$"}
    assert mt._pattern_grams("*a*") == set()
    assert mt._pattern_grams("ab") == {"^ab", "ab$"}   # fully literal


def test_ngram_equals_full_scan(searcher):
    for pat in PATTERNS:
        full = mt.wildcard_terms(searcher.index.terms, pat)
        fast = mt.wildcard_terms_ngram(searcher.index.terms,
                                       searcher.gram_index, pat)
        assert full == fast, pat


def test_short_terms_not_lost(spark):
    """2-char terms carry padded 3-grams (^ab, ab$) and stay findable;
    1-char terms match only literal-free patterns via the fallback."""
    docs = spark.createDataFrame(
        [(0, "ab xyz q hello merge xmeage")], "doc_id long, text string")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=8).build(spark, docs).cache()
    s = Searcher(spark, idx)
    assert mt.wildcard_terms_ngram(idx.terms, s.gram_index, "a*") == ["ab"]
    assert mt.wildcard_terms_ngram(idx.terms, s.gram_index, "?") == ["q"]
    # full-match anchoring: a pattern with a literal head must not match
    # a term SUFFIX (rlike is substring-matching; regression guard)
    assert mt.wildcard_terms(idx.terms, "me?ge") == ["merge"]
    assert mt.wildcard_terms_ngram(idx.terms, s.gram_index,
                                   "me?ge") == ["merge"]


def test_query_path_uses_gram_index(searcher):
    # a NON-prefix wildcard (prefix queries stay on the sargable
    # startswith path and never need grams — this test must not depend
    # on an earlier test having touched .gram_index)
    hits = searcher.top_k(parse_query("sp?rk", ENGLISH_ANALYZER), k=5)
    assert len(hits) > 0
    assert searcher._gram_index is not None   # lazily built and kept
