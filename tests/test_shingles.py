"""Shingle field (`analysis/shingle/ShingleFilter.java:34-70`):
phrase-as-term equivalence and stopword-phrase serving."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import (ENGLISH_ANALYZER,
                                                 ENGLISH_STOP_WORDS)
from lucene_solr_spark.analysis.shingles import shingle_text, with_shingles
from lucene_solr_spark.analysis.tokenizer import tokenize_raw
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import PhraseQuery, TermQuery
from tests.conftest import SF_DIR


def test_shingle_text():
    assert shingle_text("Merge the Table fast") == \
        "merge_the the_table table_fast"
    assert shingle_text("one") == ""
    assert shingle_text("") == ""
    assert shingle_text("a b c", size=3) == "a_b_c"
    assert shingle_text("a b c d", size=3) == "a_b_c b_c_d"


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    sh = with_shingles(docs.select("doc_id", "text"))
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True,
                        fields=("text", "shingles"))
           .build(spark, sh).cache())
    return Searcher(spark, idx), docs


def _raw_adjacent(docs, a, b):
    """Doc ids whose raw token stream has a immediately before b."""
    out = set()
    for r in docs.collect():
        toks = [t.lower() for t in tokenize_raw(r["text"] or "")]
        if any(x == a and y == b for x, y in zip(toks, toks[1:])):
            out.add(int(r["doc_id"]))
    return out


def test_phrase_as_term_equivalence(env):
    """For non-stop terms, PhraseQuery on text ≡ TermQuery on shingles
    (text positions count stopped slots, so adjacency coincides)."""
    searcher, docs = env
    for a, b in (("key", "agg"), ("merge", "batch"), ("fast", "table")):
        ph = set(searcher.score_all(PhraseQuery((a, b)), mode="f64")
                 .toPandas()["doc_id"])
        sg = set(searcher.score_all(TermQuery(f"{a}_{b}", field="shingles"),
                                    mode="f64").toPandas()["doc_id"])
        assert ph == sg == _raw_adjacent(docs, a, b), (a, b)


def test_stopword_phrase_served_by_shingles(env):
    """The classic shingle payoff: a phrase containing a stopword is
    unanswerable from the stopped text field but exact from bigrams."""
    searcher, docs = env
    assert "the" in ENGLISH_STOP_WORDS
    exp = _raw_adjacent(docs, "merge", "the")
    got = set(searcher.score_all(TermQuery("merge_the", field="shingles"),
                                 mode="f64").toPandas()["doc_id"])
    assert got == exp and exp
