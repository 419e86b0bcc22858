"""Deterministic shuffle/sharding (`pipeline/sharding.py`): placement
determinism under resharding, balance, write round-trip in final
order. Plus property tests for session-2 ops: URL-canonicalization
idempotence and quality-metric bounds (hypothesis)."""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.sharding import (assign_shards,
                                                 shard_manifest,
                                                 write_shards)

N = 64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(500).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("d"), F.col("doc_id")))


def test_assignment_deterministic_and_reshard_invariant(docs):
    a1 = {r["doc_id"]: (r["shard"], r["shuffle_key"])
          for r in assign_shards(docs.repartition(1), 8).collect()}
    a7 = {r["doc_id"]: (r["shard"], r["shuffle_key"])
          for r in assign_shards(docs.repartition(7), 8).collect()}
    assert a1 == a7
    assert all(0 <= s < 8 for s, _ in a1.values())


def test_assignment_is_projection_only(docs):
    plan = (assign_shards(docs, 8)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_balance(docs):
    counts = [r["count"] for r in shard_manifest(docs, 8).collect()]
    assert len(counts) == 8 and sum(counts) == 500
    # md5 uniformity: no shard more than 2x the mean on 500 docs
    assert max(counts) < 2 * (500 / 8)


def test_write_round_trip_order(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, 4)
    back = spark.read.parquet(out)
    assert back.count() == 500
    # every row landed in its assigned shard
    want = {r["doc_id"]: r["shard"]
            for r in assign_shards(docs, 4).collect()}
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == want


def test_invalid_shards():
    with pytest.raises(ValueError):
        assign_shards(None, 0)


# ---- property tests (hypothesis) for the session-2 ops ----

URL_CHARS = st.text(
    alphabet="abcXYZ019.-_/?&=#:", min_size=0, max_size=30)


@settings(max_examples=25, deadline=None)
@given(host=st.from_regex(r"[a-zA-Z0-9.-]{1,20}", fullmatch=True),
       tail=URL_CHARS)
def test_canonicalize_idempotent(spark_global, host, tail):
    """canonicalize(canonicalize(u)) == canonicalize(u) — RFC 3986 §6
    normalization must be a projection onto its own image."""
    from lucene_solr_spark.pipeline.urldedup import canonicalize_url
    url = f"http://{host}/{tail}"
    df = spark_global.createDataFrame([(url,)], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    row1 = once.collect()[0]["c"]
    twice = (spark_global.createDataFrame([(row1,)], "url string")
             .select(canonicalize_url(F.col("url")).alias("c"))
             .collect()[0]["c"])
    assert twice == row1


def test_quality_metrics_bounded(spark):
    """0 <= each metric <= 1 on a randomized-but-fixed fixture."""
    from lucene_solr_spark.search.quality import quality_stats
    # a VALID run (unique 1-based ranks per query — the documented
    # contract); judged set overlaps partially and extends past k
    run = [(f"q{q}", q * 100 + j, j)
           for q in range(5) for j in range(1, 11)]
    qrels = [(f"q{q}", q * 100 + j, j % 3)
             for q in range(5) for j in range(1, 15)]
    rdf = spark.createDataFrame(run, "query_id string, doc_id long, rank int")
    qdf = spark.createDataFrame(qrels,
                                "query_id string, doc_id long, grade int")
    for row in quality_stats(rdf, qdf, k=10).collect():
        for m in ("p_at_k", "recall_at_k", "mrr", "ndcg_at_k"):
            assert 0.0 <= row[m] <= 1.0 + 1e-12, (row["query_id"], m)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
