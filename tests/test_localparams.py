"""Solr local-params syntax (`solr/.../QueryParsing.java`
parseLocalParams + QParser dispatch): {!type k=v}body parsing pins and
dispatch equivalence against the directly-constructed queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.search.ast import PrefixQuery, TermQuery
from lucene_solr_spark.search.localparams import (LocalParamsError,
                                                  parse_local_params,
                                                  solr_query)
from tests.conftest import SF_DIR


def test_parse_plain_passthrough():
    assert parse_local_params("spark AND merge") == \
        (None, {}, "spark AND merge")


def test_parse_type_and_params():
    t, lp, body = parse_local_params("{!dismax qf='title^2 text' mm=2}fast")
    assert t == "dismax" and lp == {"qf": "title^2 text", "mm": "2"} \
        and body == "fast"


def test_parse_quotes_escapes_and_v():
    t, lp, body = parse_local_params(
        '{!term f=text v="spark"}ignored-tail')
    assert t == "term" and body == "spark"
    t, lp, body = parse_local_params(r"{!term f=a v='it\'s'}")
    assert body == "it's"
    # explicit type= key form
    t, lp, body = parse_local_params("{!type=prefix f=text}spa")
    assert t == "prefix" and lp == {"f": "text"} and body == "spa"


def test_parse_dollar_refs():
    t, lp, body = parse_local_params("{!term f=$fld}$qq",
                                     params={"fld": "title", "qq": "spark"})
    assert lp == {"f": "title"} and body == "spark"
    with pytest.raises(LocalParamsError):
        parse_local_params("{!term f=$nope}x")


def test_parse_errors():
    with pytest.raises(LocalParamsError):
        parse_local_params("{!term f=text spark")     # missing }
    with pytest.raises(LocalParamsError):
        parse_local_params("{!term f='unterminated}x")


@pytest.fixture(scope="module")
def lp_env(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "n_chars").limit(300).cache())
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=32,
                       with_positions=True).build(spark, docs).cache()
    yield Searcher(spark, idx), docs
    idx.release()


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_dispatch_lucene_term_prefix(lp_env):
    s, docs = lp_env
    assert _ids(solr_query(s, "spark AND merge")) == \
        _ids(s.score_all(parse_query("spark AND merge", ENGLISH_ANALYZER),
                         mode="f64"))
    assert _ids(solr_query(s, "{!term f=text}spark")) == \
        _ids(s.score_all(TermQuery("spark"), mode="f64"))
    assert _ids(solr_query(s, "{!prefix f=text}spa")) == \
        _ids(s.score_all(PrefixQuery("spa"), mode="f64"))


def test_dispatch_dismax_and_simple(lp_env):
    s, docs = lp_env
    got = solr_query(s, "{!dismax qf='text'}spark merge")
    from lucene_solr_spark.search.dismax import dismax_query
    want = s.score_all(dismax_query("spark merge", ENGLISH_ANALYZER,
                                    qf={"text": 1.0}), mode="f64")
    assert _ids(got) == _ids(want)
    got = solr_query(s, "{!simple}spark + merge")
    from lucene_solr_spark.search.simpleparser import SimpleQueryParser
    want = s.score_all(SimpleQueryParser(ENGLISH_ANALYZER, "text")
                       .parse("spark + merge"), mode="f64")
    assert _ids(got) == _ids(want)


def test_dispatch_frange_and_boost(lp_env):
    s, docs = lp_env
    got = solr_query(s, "{!frange l=100 u=500}n_chars", docs=docs)
    want = docs.filter((F.col("n_chars") >= 100)
                       & (F.col("n_chars") <= 500))
    assert _ids(got) == _ids(want)
    # boost multiplies the relevance score by the function value
    plain = {r["doc_id"]: r["score"] for r in
             s.score_all(TermQuery("spark"), mode="f64").collect()}
    nchars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    got = {r["doc_id"]: r["score"] for r in
           solr_query(s, "{!boost b=n_chars}spark", docs=docs).collect()}
    assert got and all(abs(v - plain[d] * nchars[d]) < 1e-9
                       for d, v in got.items())


def test_dispatch_surround_and_unknown(lp_env):
    s, docs = lp_env
    got = solr_query(s, "{!surround}spark 3W merge")
    assert len(_ids(got)) >= 0          # parses + executes via span path
    with pytest.raises(LocalParamsError):
        solr_query(s, "{!mystery}x")
    with pytest.raises(LocalParamsError):
        solr_query(s, "{!frange l=0}n_chars")   # docs table required


def test_dispatch_collapse_and_join(lp_env):
    s, docs = lp_env
    docs2 = docs.withColumn("bucket3", F.col("doc_id") % 3)
    got = solr_query(s, "{!collapse field=bucket3}spark", docs=docs2)
    from lucene_solr_spark.search.grouping import collapse
    want = collapse(s.score_all(
        parse_query("spark", ENGLISH_ANALYZER), mode="f64"),
        docs2, "bucket3")
    assert _ids(got) == _ids(want) and got.count() <= 3
    # self-join: docs sharing bucket3 with a 'spark' hit
    got = solr_query(s, "{!join from=bucket3 to=bucket3}spark", docs=docs2)
    from lucene_solr_spark.search.join import join_query
    want = join_query(s, parse_query("spark", ENGLISH_ANALYZER),
                      docs2, "bucket3", docs2, "bucket3",
                      score_mode="none")
    assert _ids(got) == _ids(want)
    with pytest.raises(LocalParamsError):
        solr_query(s, "{!collapse}x", docs=docs2)
    with pytest.raises(LocalParamsError):
        solr_query(s, "{!join from=a}x", docs=docs2)


def test_dispatch_mlt(lp_env):
    s, docs = lp_env
    seed = docs.select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    got = solr_query(s, f"{{!mlt qf=text mintf=1 mindf=1}}{seed}",
                     docs=docs)
    from lucene_solr_spark.search.mlt import more_like_this
    want = more_like_this(s, docs, int(seed), "text", k=10,
                          min_term_freq=1, min_doc_freq=1)
    assert _ids(got) == _ids(want) and seed not in _ids(got)
