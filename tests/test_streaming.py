"""NRT streaming ingestion: per-batch segments via Structured Streaming,
point-in-time reader equivalence vs a from-scratch batch build."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher, parse_query
from lucene_solr_spark.streaming import nrt
from tests.conftest import SF_DIR

QUERIES = ["merge", "spark merge fast", "spark AND table",
           '"key agg"', "spark NOT dup"]


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())


def _builder():
    return IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)


def test_stream_equals_batch_build(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("nrt")
    inp, idxp, ckpt = str(base / "in"), str(base / "idx"), str(base / "ckpt")
    # three input files = three micro-batches (maxFilesPerTrigger=1)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10_000)]):
        (docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(f"{inp}/part{i}"))
    # parquet streaming source wants a flat dir of files
    import glob
    import shutil
    import os
    os.makedirs(inp + "_flat", exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{inp}/part*/*.parquet"))):
        shutil.copy(f, f"{inp}_flat/{i:02d}.parquet")

    q = nrt.stream_index(spark, inp + "_flat", idxp, _builder(), ckpt)
    q.awaitTermination(300)

    seglist = json.load(open(f"{idxp}/{nrt.SEGMENTS}"))
    assert len(seglist["segments"]) == 3
    assert sum(s["n_docs"] for s in seglist["segments"]) == docs.count()

    streamed = nrt.load_segments(spark, idxp, ENGLISH_ANALYZER)
    full = _builder().build(spark, docs).cache()
    assert streamed.stats == full.stats

    s_a, s_b = Searcher(spark, full), Searcher(spark, streamed)
    for qs in QUERIES:
        qq = parse_query(qs, ENGLISH_ANALYZER)
        a, b = s_a.top_k(qq, k=10), s_b.top_k(qq, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), qs
        assert a["score"].tolist() == b["score"].tolist(), qs


def test_commit_segment_idempotent_and_overlap(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segs"))
    first = docs.filter(F.col("doc_id") < 100)
    e1 = nrt.commit_segment(spark, first, _builder(), path, batch_id=0)
    e2 = nrt.commit_segment(spark, first, _builder(), path, batch_id=0)
    seglist = json.load(open(f"{path}/{nrt.SEGMENTS}"))
    assert len(seglist["segments"]) == 1
    assert e1["n_docs"] == e2["n_docs"]
    with pytest.raises(ValueError, match="overlaps"):
        nrt.commit_segment(spark, docs.filter(F.col("doc_id") < 50),
                           _builder(), path, batch_id=1)
    # empty batch is a no-op
    assert nrt.commit_segment(spark, docs.filter(F.col("doc_id") < 0),
                              _builder(), path, batch_id=2) is None


def test_maintain_segments_auto_compaction(spark, docs, tmp_path_factory):
    """TieredMergePolicy-role trigger: after enough fragmented
    micro-batch segments, maintain_segments consolidates the list into
    ONE merged segment with identical query results; a second call is a
    no-op (the merged layout passes needs_compaction)."""
    path = str(tmp_path_factory.mktemp("nrt_maint"))
    b = IndexBuilder(ENGLISH_ANALYZER, grid=128, with_positions=True)
    sub = docs.limit(300).collect()
    # 6 tiny segments over the same vocabulary → fragmented runs
    for i in range(6):
        batch = spark.createDataFrame(sub[i * 50:(i + 1) * 50],
                                      docs.schema)
        nrt.commit_segment(spark, batch, b, path, i)
    before = nrt.load_segments(spark, path, ENGLISH_ANALYZER)
    s0 = Searcher(spark, before)
    q = parse_query("spark merge", ENGLISH_ANALYZER)
    want = s0.top_k(q, k=10)

    # 6×50-doc segments over grid=128 → ~3 blocks per common-term run in
    # bucket 0; trigger at >2 blocks/run for the test corpus size
    assert nrt.maintain_segments(spark, path, ENGLISH_ANALYZER,
                                 max_blocks_per_run=2) is True
    seglist = nrt._read_segments(path)
    assert len(seglist["segments"]) == 1
    assert seglist["segments"][0]["name"].startswith("merged-")
    assert seglist["segments"][0]["n_docs"] == 300
    after = nrt.load_segments(spark, path, ENGLISH_ANALYZER)
    got = Searcher(spark, after).top_k(q, k=10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
    # idempotent: a packed single segment needs no further merging
    assert nrt.maintain_segments(spark, path, ENGLISH_ANALYZER,
                                 max_blocks_per_run=2) is False


def test_realtime_get(spark, tmp_path):
    """RealTimeGetComponent: a doc is fetchable by id the moment its
    micro-batch segment commits; only range-covering segments open."""
    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
    from lucene_solr_spark.index.builder import IndexBuilder
    from lucene_solr_spark.streaming.nrt import (_read_segments,
                                                 _segments_for_ids,
                                                 commit_segment,
                                                 realtime_get)
    path = str(tmp_path / "rtg")
    b = IndexBuilder(StandardAnalyzer(stop_words=frozenset()), grid=4,
                     with_positions=True)
    d1 = spark.createDataFrame([(0, "aa bb"), (1, "cc dd")],
                               "doc_id long, text string")
    d2 = spark.createDataFrame([(10, "ee ff"), (11, "gg hh")],
                               "doc_id long, text string")
    commit_segment(spark, d1, b, path, batch_id=0)
    commit_segment(spark, d2, b, path, batch_id=1)
    got = {r["doc_id"]: r["text"]
           for r in realtime_get(spark, path, [1, 10, 99]).collect()}
    assert got == {1: "cc dd", 10: "ee ff"}     # 99 simply absent
    # segment pruning: ids 10,11 only touch seg-000001
    segs = _segments_for_ids(_read_segments(path), [10, 11])
    assert [s["name"] for s in segs] == ["seg-000001"]
    segs_all = _segments_for_ids(_read_segments(path), [0, 11])
    assert len(segs_all) == 2
