"""Parallel SQL subset (`solr/.../SQLHandler.java:54`): SQL compiled
to streaming expressions and executed by the same StreamFactory as
hand-written expressions — translation pins + result differentials."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.sql_interface import (SQLError, parse_sql,
                                                    solr_sql)
from lucene_solr_spark.search.streaming_expr import StreamFactory
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def factory(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "lang", "n_chars")
            .limit(400).cache())
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=32,
                       with_positions=True).build(spark, docs).cache()
    yield StreamFactory({"documents": (docs, Searcher(spark, idx))}), docs
    idx.release()


def test_parse_pins():
    q = parse_sql("SELECT lang, count(*) AS cnt FROM documents "
                  "WHERE text = 'spark' GROUP BY lang "
                  "HAVING count(*) > 2 ORDER BY cnt DESC LIMIT 5")
    assert [s.name for s in q.select] == ["lang", "count(*)"]
    assert q.select[1].alias == "cnt"
    assert q.where == [("text", "=", "spark", True)]
    assert q.group_by == ["lang"] and q.having == [("count(*)", ">", "2")]
    assert q.order_by == [("cnt", False)] and q.limit == 5
    with pytest.raises(SQLError):
        parse_sql("SELECT a FROM t WHERE a ~ 3")
    with pytest.raises(SQLError):
        parse_sql("SELECT sum(*) FROM t GROUP BY a")


def test_select_where_text_orderby_limit(factory):
    fac, docs = factory
    out = solr_sql(fac, "SELECT doc_id, n_chars FROM documents "
                   "WHERE text = 'spark' ORDER BY n_chars DESC LIMIT 5")
    assert 'q="text:spark"' in out["expr"] and out["residual"] is None
    got = [(r["doc_id"], r["n_chars"]) for r in out["df"].collect()]
    s = fac.collections["documents"][1]
    from lucene_solr_spark.search.ast import TermQuery
    want = (s.match_docs(TermQuery("spark")).join(docs, "doc_id")
            .orderBy(F.desc("n_chars")).limit(5)
            .select("doc_id", "n_chars").collect())
    assert got == [(r["doc_id"], r["n_chars"]) for r in want]


def test_phrase_and_prefix_predicates(factory):
    fac, docs = factory
    out = solr_sql(fac, "SELECT doc_id FROM documents "
                   "WHERE text = 'key agg' ORDER BY doc_id ASC LIMIT 100")
    assert 'text:\\"key agg\\"' in out["expr"]
    assert out["df"].count() > 0
    out2 = solr_sql(fac, "SELECT doc_id FROM documents "
                    "WHERE text LIKE 'spar%' ORDER BY doc_id ASC LIMIT 500")
    assert "text:spar*" in out2["expr"]
    from lucene_solr_spark.search.ast import PrefixQuery
    s = fac.collections["documents"][1]
    want = sorted(r["doc_id"] for r in
                  s.match_docs(PrefixQuery("spar")).collect())[:500]
    assert [r["doc_id"] for r in out2["df"].collect()] == want


def test_group_by_having_with_numeric_where(factory):
    fac, docs = factory
    out = solr_sql(fac, "SELECT lang, count(*) AS cnt, avg(n_chars) AS ac "
                   "FROM documents WHERE n_chars > 200 GROUP BY lang "
                   "HAVING count(*) > 1 ORDER BY cnt DESC, lang ASC LIMIT 3")
    assert out["expr"].startswith("top(")
    assert "rollup(" in out["expr"] and "having(" in out["expr"]
    got = [(r["lang"], r["cnt"], round(r["ac"], 6))
           for r in out["df"].collect()]
    want_df = (docs.filter(F.col("n_chars") > 200).groupBy("lang")
               .agg(F.count("*").alias("cnt"),
                    F.avg("n_chars").alias("ac"))
               .filter(F.col("cnt") > 1)
               .orderBy(F.desc("cnt"), F.asc("lang")).limit(3))
    want = [(r["lang"], r["cnt"], round(r["ac"], 6))
            for r in want_df.collect()]
    assert got == want


def test_distinct_and_residual_string_pred(factory):
    fac, docs = factory
    out = solr_sql(fac, "SELECT DISTINCT lang FROM documents "
                   "ORDER BY lang ASC LIMIT 50")
    assert "unique(" in out["expr"]
    got = [r["lang"] for r in out["df"].collect()]
    assert got == sorted(set(r["lang"] for r in
                             docs.select("lang").collect()))[:50]
    # lang is NOT an indexed field → residual pre-filter of the store
    out2 = solr_sql(fac, "SELECT doc_id FROM documents "
                    "WHERE lang = 'en' AND text = 'spark' "
                    "ORDER BY doc_id ASC LIMIT 1000")
    assert out2["residual"] is not None
    s = fac.collections["documents"][1]
    from lucene_solr_spark.search.ast import TermQuery
    want = sorted(r["doc_id"] for r in
                  s.match_docs(TermQuery("spark")).join(
                      docs.filter(F.col("lang") == "en"),
                      "doc_id").collect())
    assert [r["doc_id"] for r in out2["df"].collect()] == want


def test_errors(factory):
    fac, docs = factory
    with pytest.raises(SQLError):
        solr_sql(fac, "SELECT count(*) FROM documents")   # global agg
    with pytest.raises(SQLError):
        solr_sql(fac, "SELECT doc_id FROM nope")
    with pytest.raises(SQLError):
        solr_sql(fac, "SELECT doc_id FROM documents WHERE text LIKE '%x%'")


def test_having_not_equal(factory):
    fac, docs = factory
    out = solr_sql(fac, "SELECT lang, count(*) AS cnt FROM documents "
                   "GROUP BY lang HAVING count(*) != 1 "
                   "ORDER BY lang ASC LIMIT 50")
    assert "not(eq(count(*),1))" in out["expr"]
    want = (docs.groupBy("lang").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") != 1).orderBy("lang").limit(50))
    assert [(r["lang"], r["cnt"]) for r in out["df"].collect()] == \
        [(r["lang"], r["cnt"]) for r in want.collect()]
