"""CombinedFieldQuery / BM25F (sandbox BM25FQuery.java) — pseudo-stats
merge, weighted freq sum, re-quantized combined norm, single-field
degeneration to plain BM25."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.functions.smallfloat import byte4_to_int, int_to_byte4
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from lucene_solr_spark.search.combined import (combined_field_scores,
                                               combined_field_topk)
from tests.conftest import SF_DIR

STOP = ENGLISH_ANALYZER.stop_words
TITLE = ("concat_ws(' ', slice(regexp_extract_all(text, '[a-z0-9]+', 0),"
         " 1, 5))")


@pytest.fixture(scope="module")
def env(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text")
            .withColumn("title", F.expr(TITLE)).cache())
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128,
                       fields=("text", "title")).build(spark, docs).cache()
    yield docs, Searcher(spark, idx)
    idx.release()


def _toks(t):
    return [w for w in re.findall("[a-z0-9]+", (t or "").lower())
            if w not in STOP]


def _dlq(x):
    return byte4_to_int(int_to_byte4(int(x)))


def test_single_field_degenerates_to_bm25(env):
    """weights={text:1}, one term → exactly the ordinary BM25 TermQuery
    scores (pseudo stats collapse to the field's own)."""
    docs, s = env
    got = {r["doc_id"]: r["score"] for r in
           combined_field_scores(s, ["merge"], {"text": 1.0}).collect()}
    exp = {r["doc_id"]: r["score"] for r in
           s.score_all(TermQuery("merge"), mode="f64").collect()}
    assert set(got) == set(exp) and got
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-12)


def test_bm25f_vs_python_restatement(env):
    """Full two-field BM25F against an independent per-doc restatement
    of BM25FQuery.java's formula."""
    docs, s = env
    W = {"text": 1.0, "title": 2.0}
    terms = ["merge", "table"]
    got = {r["doc_id"]: r["score"] for r in
           combined_field_scores(s, terms, W).collect()}

    rows = [(r["doc_id"], r["text"], r["title"]) for r in docs.collect()]
    per_field = {"text": {}, "title": {}}
    for d, tx, ti in rows:
        per_field["text"][d] = _toks(tx)
        per_field["title"][d] = _toks(ti)
    stats = {}
    for f in W:
        lens = {d: len(t) for d, t in per_field[f].items() if t}
        stats[f] = (len(lens), sum(lens.values()))
    doc_count = max(v[0] for v in stats.values())
    avgdl = sum(W[f] * stats[f][1] for f in W) / doc_count
    dfs = {(f, t): sum(1 for toks in per_field[f].values() if t in toks)
           for f in W for t in terms}
    pseudo_df = max(dfs.values())
    idf = math.log(1 + (doc_count - pseudo_df + 0.5) / (pseudo_df + 0.5))
    k1, b = s.k1, s.b
    exp = {}
    for d, tx, ti in rows:
        freq = sum(W[f] * per_field[f][d].count(t)
                   for f in W for t in terms)
        if freq == 0:
            continue
        wlen = sum(W[f] * _dlq(len(per_field[f][d])) for f in W)
        clen = _dlq(math.floor(wlen + 0.5))
        exp[d] = idf * freq / (freq + k1 * (1 - b + b * clen / avgdl))
    assert set(got) == set(exp) and exp
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)
    # title weight matters: a title hit outranks an equal text-only hit
    top = combined_field_topk(s, terms, W, k=5).collect()
    assert [r["doc_id"] for r in top] == sorted(
        exp, key=lambda d: (-exp[d], d))[:5]


def test_combined_field_validation(env):
    _, s = env
    with pytest.raises(ValueError, match=">= 1"):
        combined_field_scores(s, ["merge"], {"text": 0.5})
    with pytest.raises(ValueError, match="non-empty"):
        combined_field_scores(s, [], {"text": 1.0})
    # unknown term in every field → empty, not an error
    assert combined_field_scores(s, ["zzzznope"], {"text": 1.0}).count() == 0
