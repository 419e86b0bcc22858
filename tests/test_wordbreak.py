"""WordBreakSpellChecker (suggest/spell/WordBreakSpellChecker.java) —
break/combine suggestions over the live dictionary."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.suggest import (suggest_word_breaks,
                                              suggest_word_combinations)


@pytest.fixture(scope="module")
def searcher(spark):
    rows = [
        (0, "data base systems run the data base"),
        (1, "data base tables"),
        (2, "big database cluster"),
        (3, "airport gates open"),
        (4, "airport lounge"),
        (5, "base camp"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=64).build(spark, docs).cache()
    yield Searcher(spark, idx)
    idx.release()


def test_word_breaks_basic(searcher):
    # 'database' IS indexed (df=1): not_in_index stays silent,
    # 'always' splits it — data df=2, base df=3
    assert suggest_word_breaks(searcher, "database") == []
    got = suggest_word_breaks(searcher, "database",
                              suggest_mode="always")
    assert got[0] == [("data", 2), ("base", 3)]
    # absent compound: suggestions fire in the default mode
    got = suggest_word_breaks(searcher, "basecamp")
    assert got == [[("base", 3), ("camp", 1)]]
    # nothing splittable → empty
    assert suggest_word_breaks(searcher, "qqqqq") == []


def test_word_breaks_recursion_and_floors(searcher):
    # one break already splits it (database|camp); the 2-break
    # decomposition needs max_changes=2 and ranks AFTER (more breaks)
    got = suggest_word_breaks(searcher, "databasecamp")
    assert got == [[("database", 1), ("camp", 1)]]
    got = suggest_word_breaks(searcher, "databasecamp", max_changes=2)
    assert got == [[("database", 1), ("camp", 1)],
                   [("data", 2), ("base", 3), ("camp", 1)]]
    # frequency floor prunes: camp has df=1 < 2
    assert suggest_word_breaks(searcher, "basecamp",
                               min_suggestion_frequency=2) == []
    # more_popular: parts must beat the original's df — 'database'
    # (df=1): data/base (df 2/3) qualify
    got = suggest_word_breaks(searcher, "database",
                              suggest_mode="more_popular")
    assert got == [[("data", 2), ("base", 3)]]
    # min_break_word_length blocks short parts
    assert suggest_word_breaks(searcher, "basecamp",
                               min_break_word_length=5) == []
    with pytest.raises(ValueError):
        suggest_word_breaks(searcher, "x", suggest_mode="bogus")


def test_word_combinations(searcher):
    # 'air' and 'port' are NOT in the dictionary; 'airport' is (df=2)
    got = suggest_word_combinations(searcher, ["air", "port", "gates"])
    assert got[0] == ("airport", 2, (0, 1))
    # default not_in_index refuses combining two present words
    assert suggest_word_combinations(searcher, ["data", "base"]) == []
    got = suggest_word_combinations(searcher, ["data", "base"],
                                    suggest_mode="always")
    assert got == [("database", 1, (0, 1))]
    # more_popular: combined df (1) < max part df (3) → rejected
    assert suggest_word_combinations(searcher, ["data", "base"],
                                     suggest_mode="more_popular") == []
    # separator forbids combining across it
    assert suggest_word_combinations(searcher, ["air", "", "port"]) == []
    # max_combine_word_length gate
    assert suggest_word_combinations(searcher, ["air", "port"],
                                     max_combine_word_length=5) == []
    # triple combine needs max_changes=2
    got = suggest_word_combinations(searcher, ["data", "base", "camp"],
                                    suggest_mode="always", max_changes=2)
    assert ("database", 1, (0, 1)) in got
    assert all(len(t[2]) <= 3 for t in got)
