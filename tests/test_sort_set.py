"""Multi-key Sort with missing-value policy + PointInSetQuery surface
(`search/Sort.java:44`, `search/SortField.java`,
`search/PointInSetQuery.java:59`)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from lucene_solr_spark.search.extras import (numeric_set_filter,
                                             sort_by_fields)

DOCS = [
    (0, "spark merge table", "en", 10),
    (1, "spark fast value", None, 30),       # null sort key
    (2, "spark slow query", "de", 30),
    (3, "spark big data", "en", 20),
    (4, "other words only", "fr", 99),       # no hit
    (5, "spark spark spark", None, 5),       # null sort key
]


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, n_chars long")
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=32, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    return Searcher(spark, idx), docs


def test_nulls_last_multi_key(env):
    searcher, docs = env
    res = sort_by_fields(searcher, TermQuery("spark"), docs,
                         [("lang", True, True), ("n_chars", False, False)],
                         k=10).collect()
    assert [r["doc_id"] for r in res] == [2, 3, 0, 1, 5]
    # de < en; within en: n_chars desc (20 then 10); nulls last, then
    # n_chars desc (30 before 5)


def test_nulls_first_flag(env):
    searcher, docs = env
    res = sort_by_fields(searcher, TermQuery("spark"), docs,
                         [("lang", True, False)], k=10).collect()
    assert [r["doc_id"] for r in res][:2] == [1, 5]   # nulls first, doc tie


def test_point_in_set(env):
    searcher, docs = env
    got = numeric_set_filter(searcher, TermQuery("spark"), docs,
                             "n_chars", [10, 30]).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2]
    # empty set → no hits
    assert not numeric_set_filter(searcher, TermQuery("spark"), docs,
                                  "n_chars", []).collect()


def test_multi_range(env):
    """MultiRangeQuery (`sandbox/.../MultiRangeQuery.java:47`): OR of
    closed ranges, overlaps coalesced, one pushed predicate."""
    from lucene_solr_spark.search.extras import multi_range_filter
    searcher, docs = env
    # [5,10] ∪ [25,35] → docs 0 (10), 5 (5), 1 and 2 (30); doc 3 (20) out
    got = multi_range_filter(searcher, TermQuery("spark"), docs,
                             "n_chars", [(5, 10), (25, 35)]).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 5]
    # overlapping clauses merge to one interval — same result either way
    got2 = multi_range_filter(searcher, TermQuery("spark"), docs,
                              "n_chars", [(5, 22), (18, 35)]).collect()
    assert sorted(r["doc_id"] for r in got2) == [0, 1, 2, 3, 5]
    # open-ended clause
    got3 = multi_range_filter(searcher, TermQuery("spark"), docs,
                              "n_chars", [(None, 6), (99, None)]).collect()
    assert sorted(r["doc_id"] for r in got3) == [5]
