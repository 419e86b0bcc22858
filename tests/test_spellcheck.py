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


def _prefix_edit_distance(key: str, term: str) -> int:
    """Reference prefix edit distance: min lev(key, prefix of term)."""
    import numpy as np
    n, m = len(key), len(term)
    dp = np.arange(m + 1)
    best = dp[0] if n == 0 else 10**9
    for i in range(1, n + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, m + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (key[i - 1] != term[j - 1]))
        best = best if i < n else min(int(x) for x in dp)
    return best if n else 0


def test_fuzzy_suggest_matches_prefix_edit_distance(idx):
    """FuzzySuggester: hit set == {terms with prefix-edit-distance <= 1
    and exact first char}, for several keys and both edit radii."""
    from lucene_solr_spark.search.suggest import fuzzy_suggest
    terms = [r["term"] for r in
             idx.terms.select("term").distinct().collect()]
    for key in ("spak", "jon", "mirge", "sparkk", "tble"):
        for e in (1, 2):
            got = {r["term"] for r in
                   fuzzy_suggest(idx.terms, key, k=1000,
                                 max_edits=e).collect()}
            exp = {t for t in terms
                   if t.startswith(key[0])
                   and _prefix_edit_distance(key, t) <= e}
            assert got == exp, (key, e)


def test_fuzzy_suggest_short_key_exact(idx):
    """Keys below min_fuzzy_length complete EXACTLY (no edits)."""
    from lucene_solr_spark.search.suggest import fuzzy_suggest
    got = {r["term"] for r in
           fuzzy_suggest(idx.terms, "sp", k=1000).collect()}
    exp = {r["term"] for r in
           idx.terms.filter(F.col("term").startswith("sp"))
           .select("term").collect()}
    assert got == exp and got


def test_fuzzy_suggest_ranking_and_k(idx):
    from lucene_solr_spark.search.suggest import fuzzy_suggest
    rows = fuzzy_suggest(idx.terms, "spak", k=10).collect()
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert len(rows) <= 10
