"""CheckIndex-analog tests: a healthy index passes every invariant; a
corrupted one is caught."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.index.check import check_index
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def idx(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    return IndexBuilder(ENGLISH_ANALYZER, grid=128,
                        with_positions=True).build(spark, docs).cache()


def test_healthy_index_passes(idx):
    rep = check_index(idx)
    assert rep["ok"], rep["errors"][:5]
    assert rep["counts"]["docs"] == idx.stats["doc_count"]
    assert rep["counts"]["terms"] > 0 and rep["counts"]["blocks"] > 0


def test_corrupt_dictionary_detected(spark, idx):
    import copy
    broken = copy.copy(idx)
    broken.terms = idx.terms.withColumn(
        "df", F.when(F.col("term") == "spark", F.col("df") + 1)
        .otherwise(F.col("df")))
    rep = check_index(broken)
    assert not rep["ok"]
    assert any("spark" in e for e in rep["errors"])


def test_corrupt_stats_detected(spark, idx):
    import copy
    broken = copy.copy(idx)
    broken.stats = dict(idx.stats, sum_ttf=idx.stats["sum_ttf"] + 7)
    rep = check_index(broken)
    assert not rep["ok"]
    assert any("sum_ttf" in e for e in rep["errors"])
