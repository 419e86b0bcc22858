"""Numeric doc-values updates (IndexWriter.updateNumericDocValue /
DocValuesFieldUpdates): overlay correctness, generation ordering,
term-addressed write path, and composition with the sorted-index and
search surfaces."""

import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.index.dv_updates import (
    read_numeric_docvalues, update_by_term, update_numeric_docvalues,
)
from lucene_solr_spark.search import Searcher

ANN = StandardAnalyzer(stop_words=frozenset())


@pytest.fixture()
def setup(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb", 10), (1, "aa cc", 20), (2, "bb cc", 30),
         (3, "dd", 40)],
        "doc_id long, text string, views long")
    idx = IndexBuilder(ANN, grid=4).build(spark, docs)
    idx.postings = idx.postings.cache()
    return docs, Searcher(spark, idx), tempfile.mkdtemp(prefix="lss_dv_")


def _values(spark, docs, path):
    out = read_numeric_docvalues(spark, docs, path, "views")
    return {r["doc_id"]: r["views"] for r in out.collect()}


def test_overlay_and_generation_order(spark, setup):
    docs, s, path = setup
    # no updates yet -> base passes through untouched
    assert _values(spark, docs, path) == {0: 10, 1: 20, 2: 30, 3: 40}
    g1 = update_numeric_docvalues(
        spark, path, "views",
        spark.createDataFrame([(0, 100), (2, 300)],
                              "doc_id long, value long"))
    assert g1 == 1
    assert _values(spark, docs, path) == {0: 100, 1: 20, 2: 300, 3: 40}
    # a later generation wins doc-by-doc (dvGen ordering)
    g2 = update_numeric_docvalues(
        spark, path, "views",
        spark.createDataFrame([(2, 999)], "doc_id long, value long"))
    assert g2 == 2
    assert _values(spark, docs, path) == {0: 100, 1: 20, 2: 999, 3: 40}
    # updates to another field don't leak into this one
    update_numeric_docvalues(
        spark, path, "other",
        spark.createDataFrame([(0, 7)], "doc_id long, value long"))
    assert _values(spark, docs, path) == {0: 100, 1: 20, 2: 999, 3: 40}


def test_update_by_term(spark, setup):
    docs, s, path = setup
    # every doc containing 'aa' gets views=5; doc resolution is the
    # kernel match, nothing collected
    update_by_term(s, path, "aa", "views", 5)
    assert _values(spark, docs, path) == {0: 5, 1: 5, 2: 30, 3: 40}


def test_updates_feed_search_sort(spark, setup):
    """Overlaid values drive a sort the way Lucene's updated docvalues
    feed TopFieldCollector."""
    docs, s, path = setup
    update_by_term(s, path, "bb", "views", 1)          # docs 0,2 -> 1
    served = read_numeric_docvalues(spark, docs, path, "views")
    got = (served.orderBy(F.asc("views"), F.asc("doc_id"))
           .select("doc_id").limit(2).collect())
    assert [r["doc_id"] for r in got] == [0, 2]


def test_bad_updates_schema(spark, setup):
    _, _, path = setup
    with pytest.raises(ValueError, match="doc_id"):
        update_numeric_docvalues(
            spark, path, "views",
            spark.createDataFrame([(1,)], "doc_id long"))


def test_binary_and_sortedset_overlays(spark, setup):
    """VERDICT r4 #6: string + set fields take overlay updates through
    the same newest-gen-wins broadcast join."""
    from lucene_solr_spark.index.dv_updates import (
        read_docvalues, update_binary_docvalues,
        update_sortedset_docvalues)
    docs, _, path = setup
    base = docs.select("doc_id", F.lit("raw").alias("label"),
                       F.array(F.lit("a"), F.lit("b")).alias("tags"))
    update_binary_docvalues(spark, path, "label", spark.createDataFrame(
        [(0, "gold"), (2, "gold")], "doc_id long, value string"))
    update_binary_docvalues(spark, path, "label", spark.createDataFrame(
        [(2, "silver")], "doc_id long, value string"))
    got = {r["doc_id"]: r["label"] for r in
           read_docvalues(spark, base, path, "label").collect()}
    assert got == {0: "gold", 1: "raw", 2: "silver", 3: "raw"}

    # sorted-set: write-side dedupe + sort (SORTED_SET ordinal order)
    update_sortedset_docvalues(spark, path, "tags", spark.createDataFrame(
        [(1, ["z", "m", "z", "c"])], "doc_id long, value array<string>"))
    tags = {r["doc_id"]: r["tags"] for r in
            read_docvalues(spark, base, path, "tags").collect()}
    assert tags[1] == ["c", "m", "z"]
    assert tags[0] == ["a", "b"]


def test_kind_mixing_raises(spark, setup):
    from lucene_solr_spark.index.dv_updates import (
        update_binary_docvalues, update_numeric_docvalues)
    docs, _, path = setup
    update_numeric_docvalues(spark, path, "views", spark.createDataFrame(
        [(0, 1)], "doc_id long, value long"))
    with pytest.raises(ValueError, match="cannot mix"):
        update_binary_docvalues(spark, path, "views",
                                spark.createDataFrame(
                                    [(0, "x")],
                                    "doc_id long, value string"))
