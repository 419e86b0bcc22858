"""Payload channel round-trip + PayloadScoreQuery semantics
(Lucene84PostingsWriter.addPosition payload stream;
queries/payloads/PayloadScoreQuery.java:46, PayloadFunction)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.index.compact import compact
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from lucene_solr_spark.search.payloads import payload_score_topk, payload_scores
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())


@pytest.fixture(scope="module")
def pidx(spark, docs):
    return (IndexBuilder(ENGLISH_ANALYZER, grid=128, payload="position")
            .build(spark, docs).cache())


@pytest.fixture(scope="module")
def psearcher(spark, pidx):
    return Searcher(spark, pidx)


def _expected(docs, term, func):
    """Pure-python oracle: per doc, func over 1-based raw-stream
    positions of `term` (positions count stopword slots — gaps)."""
    import re
    out = {}
    for r in docs.collect():
        toks = re.findall("[a-z0-9]+", (r["text"] or "").lower())
        ps = [i + 1 for i, t in enumerate(toks) if t == term]
        if not ps:
            continue
        out[int(r["doc_id"])] = {"sum": float(sum(ps)),
                                 "max": float(max(ps)),
                                 "min": float(min(ps)),
                                 "avg": sum(ps) / len(ps)}[func]
    return out


@pytest.mark.parametrize("func", ["sum", "max", "min", "avg"])
def test_payload_functions_vs_oracle(spark, docs, psearcher, func):
    got = {int(r["doc_id"]): r["payload_score"]
           for r in payload_scores(psearcher, "merge", func=func).collect()}
    exp = _expected(docs, "merge", func)
    assert got.keys() == exp.keys()
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12)


def test_payload_topk_and_span_score(spark, docs, psearcher):
    top = payload_score_topk(psearcher, "merge", k=10, func="sum").toPandas()
    exp = sorted(_expected(docs, "merge", "sum").items(),
                 key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(top["doc_id"].astype(int), top["score"])) == exp
    # includeSpanScore multiplies by the BM25 term score
    with_span = payload_score_topk(psearcher, "merge", k=10, func="sum",
                                   include_span_score=True).toPandas()
    bm = psearcher.score_all(TermQuery("merge"), mode="f64").toPandas()
    bm_map = dict(zip(bm["doc_id"].astype(int), bm["score"]))
    pay = _expected(docs, "merge", "sum")
    exp2 = sorted(((d, pay[d] * bm_map[d]) for d in pay),
                  key=lambda kv: (-kv[1], kv[0]))[:10]
    for (gd, gs), (ed, es) in zip(
            zip(with_span["doc_id"].astype(int), with_span["score"]), exp2):
        assert gd == ed and gs == pytest.approx(es, rel=1e-12)


def test_payload_roundtrip_compact_and_expunge(spark, docs, pidx, psearcher):
    """Layout rewrites must preserve the payload channel bit-for-bit."""
    from lucene_solr_spark.index.deletes import delete_docs, expunge_deletes
    base = payload_score_topk(psearcher, "merge", k=10).toPandas()

    cidx = compact(spark, pidx)
    c = payload_score_topk(Searcher(spark, cidx), "merge", k=10).toPandas()
    assert c["doc_id"].tolist() == base["doc_id"].tolist()
    assert c["score"].tolist() == base["score"].tolist()

    victims = base["doc_id"].astype(int).tolist()[:2]
    eidx = expunge_deletes(spark, delete_docs(spark, pidx, victims))
    e = payload_score_topk(Searcher(spark, eidx), "merge", k=10).toPandas()
    survivors = {int(d): s for d, s in zip(base["doc_id"], base["score"])
                 if int(d) not in set(victims)}
    for d, s in zip(e["doc_id"].astype(int), e["score"]):
        if d in survivors:
            assert s == survivors[d]
    assert not (set(e["doc_id"].astype(int)) & set(victims))


def test_payload_requires_channel(spark, docs):
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=128)
           .build(spark, docs).cache())
    with pytest.raises(ValueError, match="payload"):
        payload_scores(Searcher(spark, idx), "merge")
    idx.release()


def test_payload_term_len_and_callable(spark, docs):
    s = Searcher(spark, (IndexBuilder(ENGLISH_ANALYZER, grid=128,
                                      payload="term_len")
                         .build(spark, docs).cache()))
    got = payload_scores(s, "merge", func="max").limit(5).collect()
    assert got and all(r["payload_score"] == 5.0 for r in got)  # len('merge')
    s.index.release()
    s2 = Searcher(spark, (IndexBuilder(
        ENGLISH_ANALYZER, grid=128,
        payload=lambda t, p: 7).build(spark, docs).cache()))
    got2 = payload_scores(s2, "merge", func="avg").limit(5).collect()
    assert got2 and all(r["payload_score"] == 7.0 for r in got2)
    s2.index.release()


def test_span_payload_check_planted(spark):
    from lucene_solr_spark.search.payloads import span_payload_check
    rows = [(0, "key agg row key agg"), (1, "row key agg"), (2, "agg key")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=16, payload="position")
           .build(spark, df).cache())
    s = Searcher(spark, idx)
    # unchecked positions = plain exact phrase with span freq
    got = {r["doc_id"]: r["freq"] for r in
           span_payload_check(s, ["key", "agg"], [None, None]).collect()}
    assert got == {0: 2, 1: 1}
    # payload(position)=1 on the first slot: only the doc-initial span
    got = {r["doc_id"]: r["freq"] for r in
           span_payload_check(s, ["key", "agg"], [1, None]).collect()}
    assert got == {0: 1}
    # anchor mid-doc: key at raw position 4
    got = {r["doc_id"]: r["freq"] for r in
           span_payload_check(s, ["key", "agg"], [4, None]).collect()}
    assert got == {0: 1}
    # payload 2 = key as 2nd token: only doc 1 ("row key agg")
    got = {r["doc_id"]: r["freq"] for r in
           span_payload_check(s, ["key", "agg"], [2, None]).collect()}
    assert got == {1: 1}
    # payload with no matching occurrence kills every span
    assert span_payload_check(s, ["key", "agg"], [3, None]).count() == 0
    idx.release()


def test_span_payload_check_vs_python_oracle(spark, docs, psearcher):
    import re
    from lucene_solr_spark.search.payloads import span_payload_check
    got = {r["doc_id"]: r["freq"] for r in
           span_payload_check(psearcher, ["key", "agg"],
                              [None, None]).collect()}
    exp = {}
    for r in docs.collect():
        toks = re.findall("[a-z0-9]+", (r["text"] or "").lower())
        n = sum(1 for a, b in zip(toks, toks[1:])
                if (a, b) == ("key", "agg"))
        if n:
            exp[int(r["doc_id"])] = n
    assert got == exp and exp


# ---------------------------------------------------------------------------
# DelimitedPayloadTokenFilter ingestion (analysis/delimited.py)
# ---------------------------------------------------------------------------

def test_delimited_payload_int_roundtrip(spark):
    from lucene_solr_spark.analysis.delimited import DelimitedPayloadAnalyzer
    rows = [(0, "apple|5 banana|2 apple|3 plain"),
            (1, "banana|7 Apple|1"),
            (2, "cherry|0 apple")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    an = DelimitedPayloadAnalyzer()
    idx = (IndexBuilder(an, grid=16, payload="delimited")
           .build(spark, df).cache())
    s = Searcher(spark, idx)
    got = {r["doc_id"]: r["payload_score"] for r in
           payload_scores(s, "apple", func="sum").collect()}
    # doc 0: 5+3; doc 1: lowercased Apple|1; doc 2: undelimited -> 0
    assert got == {0: 8.0, 1: 1.0, 2: 0.0}
    got = {r["doc_id"]: r["payload_score"] for r in
           payload_scores(s, "apple", func="max").collect()}
    assert got == {0: 5.0, 1: 1.0, 2: 0.0}
    got = {r["doc_id"]: r["payload_score"] for r in
           payload_scores(s, "banana", func="avg").collect()}
    assert got == {0: 2.0, 1: 7.0}
    idx.release()


def test_delimited_payload_float_bits(spark):
    from lucene_solr_spark.analysis.delimited import (
        DelimitedPayloadAnalyzer, decode_float_bits, encode_float_bits)
    # scalar round trip first (PayloadHelper.encodeFloat contract)
    for v in (0.0, 1.5, 3.75, 1e-3, 12345.5):
        assert decode_float_bits(encode_float_bits(str(v))) == np.float32(v)
    rows = [(0, "model|0.5 model|1.25 other|2.0"), (1, "model|3.5")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    an = DelimitedPayloadAnalyzer(encoder="float_bits")
    idx = (IndexBuilder(an, grid=16, payload="delimited")
           .build(spark, df).cache())
    s = Searcher(spark, idx)
    got = {r["doc_id"]: r["payload_score"] for r in
           payload_scores(s, "model", func="sum",
                          decoder="float_bits").collect()}
    assert got == {0: 1.75, 1: 3.5}
    top = payload_score_topk(s, "model", k=2, func="max",
                             decoder="float_bits").collect()
    assert [(r["doc_id"], r["score"]) for r in top] == [(1, 3.5), (0, 1.25)]
    idx.release()


def test_delimited_payload_guards(spark):
    from lucene_solr_spark.analysis.delimited import DelimitedPayloadAnalyzer
    import pytest as _pt
    with _pt.raises(ValueError):
        DelimitedPayloadAnalyzer(delimiter="||")
    with _pt.raises(ValueError):
        DelimitedPayloadAnalyzer(encoder="hex")
    an = DelimitedPayloadAnalyzer()
    with _pt.raises(ValueError):
        an.term_positions_payloads("bad|-3")
    # delimited payloads demand the analyzer payload stream
    df = spark.createDataFrame([(0, "a|1")], "doc_id long, text string")
    with _pt.raises(Exception):
        (IndexBuilder(ENGLISH_ANALYZER, grid=16, payload="delimited")
         .build(spark, df).postings.count())


def test_delimited_stop_words_leave_position_gaps(spark):
    from lucene_solr_spark.analysis.delimited import DelimitedPayloadAnalyzer
    an = DelimitedPayloadAnalyzer(stop_words=frozenset({"the"}))
    tp, pay = an.term_positions_payloads("the|9 apple|5 the banana|2")
    assert tp == {"apple": [1], "banana": [3]}
    assert pay == {"apple": [5], "banana": [2]}
