"""Grouping/collapse/stats, two-pass rescoring, and term-vector
semantics beyond the oracle gate: cut boundaries, tie handling, group
counts, and the no-raw failure mode.

Reference semantics: grouping/FirstPassGroupingCollector.java:44 (top
groups by leader), Solr CollapsingQParserPlugin (one survivor per key),
search/QueryRescorer.java:33-50 (ONLY the top-N first-pass hits are
rescored; others are absent from the result),
index/IndexReader.java:288-295 (term vectors are per-doc postings).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import (BooleanQuery, Clause, Occur,
                                          PhraseQuery, TermQuery)
from lucene_solr_spark.search.extras import term_vectors
from lucene_solr_spark.search.grouping import (collapse, field_stats,
                                               top_groups)
from lucene_solr_spark.search.rescorer import rescore
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def searcher(spark, docs):
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
           .build(spark, docs.select("doc_id", "text")).cache())
    return Searcher(spark, idx)


def _or(*terms):
    return BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(t))
                              for t in terms))


def test_collapse_one_survivor_per_key_and_best(docs, searcher):
    hits = searcher.score_all(_or("spark", "merge"), mode="f64")
    got = collapse(hits, docs, "source").toPandas()
    assert got["source"].is_unique
    joined = (hits.join(docs.select("doc_id", "source"), "doc_id")
              .toPandas())
    for src, grp in joined.groupby("source"):
        best = grp.sort_values(["score", "doc_id"],
                               ascending=[False, True]).iloc[0]
        row = got[got["source"] == src].iloc[0]
        assert row["doc_id"] == best["doc_id"]
        assert math.isclose(row["score"], best["score"], rel_tol=1e-12)


def test_top_groups_counts_and_membership(docs, searcher):
    hits = searcher.score_all(TermQuery("table"), mode="f64")
    got = top_groups(hits, docs, "lang", n_groups=3, group_size=2) \
        .toPandas()
    assert got["lang"].nunique() == 3
    assert (got.groupby("lang").size() <= 2).all()
    # selected groups are exactly the 3 whose leader scores best
    joined = (hits.join(docs.select("doc_id", "lang"), "doc_id")
              .toPandas())
    leaders = (joined.sort_values(["score", "doc_id"],
                                  ascending=[False, True])
               .groupby("lang", sort=False).head(1)
               .sort_values(["score", "doc_id"], ascending=[False, True]))
    assert set(got["lang"]) == set(leaders.head(3)["lang"])


def test_field_stats_all_docs_no_matches_filter(docs):
    got = field_stats(docs, None, "n_chars").toPandas().iloc[0]
    pdf = docs.select("n_chars").toPandas()["n_chars"]
    assert got["count"] == len(pdf)
    assert got["missing"] == 0
    assert got["min"] == pdf.min() and got["max"] == pdf.max()
    assert got["sum"] == pdf.sum()
    assert math.isclose(got["mean"], pdf.mean(), rel_tol=1e-12)
    assert math.isclose(got["stddev"], pdf.std(ddof=1), rel_tol=1e-12)


def test_rescore_only_topn_and_combine(searcher):
    first = searcher.score_all(_or("spark", "fast"), mode="f64")
    fp = first.toPandas().sort_values(["score", "doc_id"],
                                      ascending=[False, True])
    top_n = 5
    got = rescore(searcher, PhraseQuery(("key", "agg")), first,
                  top_n=top_n, weight=2.0).toPandas()
    assert len(got) == top_n
    assert set(got["doc_id"]) == set(fp.head(top_n)["doc_id"])
    ph = (searcher.score_all(PhraseQuery(("key", "agg")), mode="f64")
          .toPandas().set_index("doc_id")["score"])
    base = fp.head(top_n).set_index("doc_id")["score"]
    for d, s in got.set_index("doc_id")["score"].items():
        exp = base[d] + 2.0 * float(ph.get(d, 0.0))
        assert math.isclose(s, exp, rel_tol=1e-12)


def test_term_vectors_match_analyzer(spark, docs, searcher):
    got = (term_vectors(searcher, [0, 3]).toPandas()
           .sort_values(["doc_id", "term"]).reset_index(drop=True))
    texts = {r["doc_id"]: r["text"]
             for r in docs.filter("doc_id in (0, 3)").collect()}
    for d, text in texts.items():
        exp = {t: len(ps) for t, ps in
               ENGLISH_ANALYZER.term_positions(text).items()}
        sub = got[got["doc_id"] == d]
        assert dict(zip(sub["term"], sub["freq"])) == exp


def test_term_vectors_requires_raw(spark, searcher):
    class Shim:
        pass
    shim = Shim()
    shim.index = Shim()
    shim.index.raw = None
    with pytest.raises(ValueError, match="raw"):
        term_vectors(shim, [0])
