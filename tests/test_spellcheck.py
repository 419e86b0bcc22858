"""Candidate-pruned spellcheck (DirectSpellChecker.java:49 posture):
the SpellChecker's length-partitioned dictionary + bigram candidate
join must return EXACTLY what the exhaustive scan returns (the q-gram
count filter is lossless), and its physical plan must show partition
pruning rather than a full dictionary scan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search.suggest import SpellChecker, spellcheck

from conftest import SF_DIR


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return IndexBuilder(ENGLISH_ANALYZER, grid=128).build(spark, docs)


@pytest.fixture(scope="module")
def checker(spark, idx, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spell"))
    return SpellChecker(spark, idx.terms, path, fields=("text",))


CASES = [
    ("spak", 2), ("spak", 1), ("merg", 1),
    ("documnt", 1),      # length 7, e=1 → q-gram bound 4 > 0: gram join
    ("partition", 2),    # length 9, e=2 → bound 4 > 0: gram join
    ("zzzzzzz", 2),      # no matches
]


def test_pruned_matches_exhaustive(idx, checker):
    for word, e in CASES:
        got = checker.suggest(word, max_edits=e, k=10).collect()
        exp = spellcheck(idx.terms, word, max_edits=e, k=10).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in exp], (word, e)


def test_gram_filter_lossless_on_repeats(spark, tmp_path_factory):
    """Occurrence-indexed grams make the set intersection equal the
    multiset intersection — 'aaaa' vs 'aaa' shares TWO 'aa' grams, not
    one, so the q-gram bound keeps it."""
    docs = spark.createDataFrame(
        [(0, "aaaa bbbb abab"), (1, "aaa bab cccc")],
        "doc_id long, text string")
    i = IndexBuilder(ENGLISH_ANALYZER, grid=64).build(spark, docs)
    path = str(tmp_path_factory.mktemp("spell2"))
    c = SpellChecker(spark, i.terms, path, fields=("text",))
    for word, e in [("aaaa", 1), ("abab", 1), ("cccc", 1), ("bbbb", 1)]:
        got = c.suggest(word, max_edits=e, k=10).collect()
        exp = spellcheck(i.terms, word, max_edits=e, k=10).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in exp], (word, e)
    i.release()


def test_plan_shows_partition_pruning(checker):
    """The dictionary scan must be pruned to the length band via
    Parquet PARTITION filters (tlen is a directory key), and the long-
    word path must include the gram candidate join."""
    plan = (checker.suggest("documnt", max_edits=1, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert "tlen" in plan
    # the gram semi-join appears (bound 7-1-2 = 4 > 0)
    assert "gramkey" in plan
    # short-word fallback: no gram join, still partition-pruned
    plan2 = (checker.suggest("spak", max_edits=2, k=5)
             ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan2 and "gramkey" not in plan2
