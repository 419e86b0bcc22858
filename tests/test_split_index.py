"""PKIndexSplitter analog (`misc/.../PKIndexSplitter.java:36`):
split by query / doc set, halves are real standalone indexes with
their own statistics, existing deletes drop from both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.index.deletes import delete_docs, live_doc_count
from lucene_solr_spark.index.split import split_index
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(200).cache())


@pytest.fixture(scope="module")
def idx(spark, docs):
    return IndexBuilder(ENGLISH_ANALYZER, grid=32,
                        with_positions=True).build(spark, docs).cache()


def _live_ids(spark, an_idx):
    s = Searcher(spark, an_idx)
    from lucene_solr_spark.search.ast import MatchAllQuery
    return sorted(r["doc_id"]
                  for r in s.match_docs(MatchAllQuery()).collect())


def test_split_by_query_partitions_universe(spark, idx):
    q = TermQuery("spark")
    first, second = split_index(spark, idx, q)
    s = Searcher(spark, idx)
    want_first = sorted(r["doc_id"] for r in s.match_docs(q).collect())
    a, b = _live_ids(spark, first), _live_ids(spark, second)
    assert a == want_first
    assert sorted(a + b) == _live_ids(spark, idx)
    assert not set(a) & set(b)
    # each half is a real index: its stats reflect only its own docs
    assert first.stats["doc_count"] == len(a)
    assert second.stats["doc_count"] == len(b)
    # and queries serve from each half independently
    s1 = Searcher(spark, first)
    assert sorted(r["doc_id"] for r in
                  s1.match_docs(TermQuery("spark")).collect()) == want_first


def test_split_by_doc_ids_and_deletes_drop_from_both(spark, idx):
    all_ids = _live_ids(spark, idx)
    first_ids = all_ids[:len(all_ids) // 3]
    dead = [all_ids[0], all_ids[-1]]       # one in each half
    masked = delete_docs(spark, idx, dead)
    first, second = split_index(spark, masked, first_ids)
    a, b = _live_ids(spark, first), _live_ids(spark, second)
    assert set(a) == set(first_ids) - set(dead)
    assert set(b) == set(all_ids) - set(first_ids) - set(dead)
    assert live_doc_count(first) == len(a)


def test_split_term_stats_rebuilt(spark, idx):
    first, second = split_index(spark, idx, TermQuery("spark"))
    # 'spark' df in the first half == its doc count there; 0 in second
    t1 = (first.terms.filter((F.col("field") == "text")
                             & (F.col("term") == "spark"))
          .select("df").collect())
    assert t1 and t1[0]["df"] == first.stats["doc_count"] > 0
    t2 = (second.terms.filter((F.col("field") == "text")
                              & (F.col("term") == "spark"))
          .select("df").collect())
    assert not t2


def test_split_shard_by_hash_midpoint(spark, idx, docs):
    from lucene_solr_spark.index.routing import murmur3_32
    from lucene_solr_spark.index.split import split_shard
    first, second = split_shard(spark, idx, docs)
    mid = ((-(1 << 31)) + ((1 << 31) - 1)) >> 1
    want_first = sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
        if murmur3_32(str(r["doc_id"]).encode()) <= mid)
    a = _live_ids(spark, first)
    assert a == want_first
    assert sorted(a + _live_ids(spark, second)) == _live_ids(spark, idx)
    # splitting the FIRST half again respects the narrowed range
    f2, s2 = split_shard(spark, first, docs, hash_range=(-(1 << 31), mid))
    q = (-(1 << 31) + mid) >> 1
    want_q = sorted(d for d in want_first
                    if murmur3_32(str(d).encode()) <= q)
    assert _live_ids(spark, f2) == want_q
