"""Batch query API: top_k_many == per-query top_k (docIDs and float32
scores), including MatchAll/MatchNo/unknown-term members of the batch."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from tests.conftest import SF_DIR

QUERIES = ["merge", "spark merge fast", "spark AND table",
           '"key agg"', "(spark OR merge) AND fast", "spark NOT dup",
           "zzzqqq", "the and of",
           "batch part line column order small sort"]


@pytest.fixture(scope="module")
def searcher(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128,
                       with_positions=True).build(spark, docs).cache()
    return Searcher(spark, idx)


def test_batch_equals_individual(searcher):
    qs = [parse_query(s, ENGLISH_ANALYZER) for s in QUERIES]
    batch = searcher.top_k_many(qs, k=10, mode="f32", prune=True)
    assert len(batch) == len(qs)
    for s, q, got in zip(QUERIES, qs, batch):
        want = searcher.top_k(q, k=10, mode="f32", prune=True)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), s
        assert got["score"].tolist() == want["score"].tolist(), s


def test_batch_f64_mode(searcher):
    qs = [parse_query(s, ENGLISH_ANALYZER) for s in QUERIES[:4]]
    batch = searcher.top_k_many(qs, k=5, mode="f64")
    for s, q, got in zip(QUERIES, qs, batch):
        want = searcher.top_k(q, k=5, mode="f64")
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), s
