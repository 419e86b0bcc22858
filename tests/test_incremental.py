"""Incremental append + persistence: differential vs a from-scratch
build, and checkpoint/resume semantics (north-rule resumability)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.index import catalog
from lucene_solr_spark.index.merge import append
from lucene_solr_spark.search import Searcher, parse_query
from tests.conftest import SF_DIR

QUERIES = ["merge", "spark merge fast", "spark AND table",
           '"key agg"', "(spark OR merge) AND fast", "spark NOT dup"]


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())


def _builder():
    return IndexBuilder(ENGLISH_ANALYZER, grid=128, head_df=64,
                        salt_target=128, with_positions=True)


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_append_equals_full_build(spark, docs):
    cut = 250
    full = _builder().build(spark, docs).cache()
    base = _builder().build(spark, docs.filter(F.col("doc_id") < cut))
    inc = append(spark, base, docs.filter(F.col("doc_id") >= cut),
                 _builder())
    inc.postings = inc.postings.cache()
    inc.terms = inc.terms.cache()

    assert inc.stats == full.stats
    assert _sorted_rows(inc.terms, "term") == _sorted_rows(full.terms, "term")
    assert _sorted_rows(inc.norms, "doc_id") == _sorted_rows(full.norms, "doc_id")

    s_full = Searcher(spark, full)
    s_inc = Searcher(spark, inc)
    for qs in QUERIES:
        q = parse_query(qs, ENGLISH_ANALYZER)
        a = s_full.top_k(q, k=10, mode="f32")
        b = s_inc.top_k(q, k=10, mode="f32")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), qs
        assert a["score"].tolist() == b["score"].tolist(), qs


def test_append_rejects_overlapping_ids(spark, docs):
    base = _builder().build(spark, docs.filter(F.col("doc_id") < 250))
    with pytest.raises(ValueError, match="doc_ids above"):
        append(spark, base, docs.filter(F.col("doc_id") >= 200), _builder())


def test_checkpoint_resume(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxgen"))
    shutil.rmtree(path, ignore_errors=True)
    b = _builder()
    idx1, m1 = catalog.build_or_resume(spark, docs, b, path)
    assert m1["stages"]["postings"]["rows"] > 0
    assert m1["timings"]["docs_per_sec"] > 0
    assert len(m1["partitions"]) >= 1

    assert catalog.latest_generation(path) == m1["key"]

    # second call resumes: same generation id, no rebuild
    idx2, m2 = catalog.build_or_resume(spark, docs, b, path)
    assert m2["generation"] == m1["generation"]

    # changed params -> new generation in its own directory; the old
    # generation's files stay intact for existing readers
    b2 = IndexBuilder(ENGLISH_ANALYZER, grid=256, head_df=64,
                      salt_target=128, with_positions=True)
    idx3, m3 = catalog.build_or_resume(spark, docs, b2, path)
    assert m3["generation"] != m1["generation"]
    assert m3["key"] != m1["key"]
    assert catalog.latest_generation(path) == m3["key"]

    # loaded index answers queries identically to a fresh build
    fresh = _builder().build(spark, docs).cache()
    s_a, s_b = Searcher(spark, fresh), Searcher(spark, idx1)
    for qs in QUERIES[:3]:
        q = parse_query(qs, ENGLISH_ANALYZER)
        assert (s_a.top_k(q, k=10)["doc_id"].tolist()
                == s_b.top_k(q, k=10)["doc_id"].tolist()), qs


def test_manifest_is_atomic_commit_point(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxgen2"))
    b = _builder()
    idx, manifest = catalog.build_or_resume(spark, docs, b, path)
    gen_dir = f"{path}/gen-{manifest['key']}"
    with open(f"{gen_dir}/{catalog.MANIFEST}") as f:
        on_disk = json.load(f)
    assert on_disk["key"] == manifest["key"]
    assert on_disk["format_version"] == 1
    # lineage fields present
    assert on_disk["input"]["n_rows"] == docs.count()
    assert set(on_disk["stages"]) == {"postings", "terms", "norms"}


def test_checkpoint_on_hadoop_scheme(spark, docs, tmp_path_factory):
    """save/load/build_or_resume on a NON-file:// scheme: the manifest
    and LATEST pointer must route through the Hadoop FileSystem API
    (`store/Directory.java:50` seam), not local open()/os.replace —
    exercised by registering a custom scheme backed by the local Hadoop
    FS implementation (VERDICT r2 #7)."""
    local = str(tmp_path_factory.mktemp("idxhdfs"))
    spark._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.lsstest.link./idx", f"file:{local}")
    path = "viewfs://lsstest/idx"
    small = docs.filter(F.col("doc_id") < 100)
    b = _builder()
    idx1, m1 = catalog.build_or_resume(spark, small, b, path)
    assert catalog.latest_generation(path, spark) == m1["key"]
    # the manifest physically landed via the Hadoop FS (local backing)
    assert os.path.exists(f"{local}/gen-{m1['key']}/{catalog.MANIFEST}")
    assert not os.path.exists(f"{local}/gen-{m1['key']}/{catalog.MANIFEST}.tmp")
    # resume path reads the manifest back through the same seam
    idx2, m2 = catalog.build_or_resume(spark, small, b, path)
    assert m2["generation"] == m1["generation"]
    s = Searcher(spark, idx2.cache())
    assert len(s.top_k(parse_query(QUERIES[0], ENGLISH_ANALYZER), k=5)) > 0
    idx2.release()
