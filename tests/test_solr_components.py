"""ExpandComponent / SignificantTerms / QueryElevation behavioral pins
(the SQL-side semantics are oracle-gated in __spark_entry__; these pin
the component-level contracts on a hand-built corpus)."""

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from lucene_solr_spark.search.grouping import (collapse, elevate,
                                               expand_groups,
                                               significant_terms)

ANN = StandardAnalyzer(stop_words=frozenset())
ROWS = [  # (doc_id, group, text)
    (0, "a", "zz zz zz"),       # group a leader for zz
    (1, "a", "zz zz"),
    (2, "a", "zz"),
    (3, "b", "zz yy"),          # group b leader
    (4, "b", "zz qq ww"),
    (5, "c", "yy"),             # no zz
]


def _mk(spark):
    docs = spark.createDataFrame(
        [(i, g, t) for i, g, t in ROWS], "doc_id long, grp string, text string")
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return docs, Searcher(spark, idx)


def test_expand_excludes_leader(spark):
    docs, s = _mk(spark)
    hits = s.score_all(TermQuery("zz"), mode="f64")
    leaders = {r["doc_id"] for r in collapse(hits, docs, "grp").collect()}
    exp = expand_groups(hits, docs, "grp", expand_rows=1).collect()
    assert leaders == {0, 3}
    got = {(r["grp"], r["doc_id"]) for r in exp}
    assert got == {("a", 1), ("b", 4)}    # next-best per group, 1 row each


def test_significant_terms_band_and_score(spark):
    import math
    docs, s = _mk(spark)
    matches = s.score_all(TermQuery("yy"), mode="f64")   # docs 3, 5
    # max_doc_freq=6 is ABSOLUTE (>= 1.0 — the Solr ratio/absolute split)
    res = significant_terms(s, matches, min_doc_freq=1, max_doc_freq=6,
                            min_term_length=2, k=10).collect()
    by_term = {r["term"]: r for r in res}
    # yy: tf=2 (both docset docs), df=2, N=6
    assert by_term["yy"]["tf"] == 2 and by_term["yy"]["df"] == 2
    assert abs(by_term["yy"]["score"]
               - math.log(2) * (math.log(7 / 3) + 1)) < 1e-9
    # qq appears in doc 4 only — not in the docset → absent (tf == 0)
    assert "qq" not in by_term
    # df band excludes zz at max_doc_freq=0.5 (df 5 > 3)
    res2 = significant_terms(s, matches, min_doc_freq=1, max_doc_freq=0.5,
                             min_term_length=2, k=10).collect()
    assert all(r["term"] != "zz" for r in res2)


def test_elevate_pins_and_forces(spark):
    docs, s = _mk(spark)
    hits = s.score_all(TermQuery("zz"), mode="f64")
    got = elevate(hits, [4, 5], k=4).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[:2] == [4, 5]              # configured order, not score
    assert got[0]["elevated"] and got[1]["elevated"]
    assert got[1]["score"] == 0.0         # doc 5 never matched — forced in
    assert not got[2]["elevated"]
    # exclusion removes an organic hit
    got2 = elevate(hits, [4], k=10, exclude_ids=[0]).collect()
    assert 0 not in {r["doc_id"] for r in got2}
