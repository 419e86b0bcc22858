"""End-to-end curation manifest (quality → dedup → decontamination)."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.pipeline.curate import curate_manifest

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away to have found that other foxes with better plans will go "
        "beyond the first hill before dark settles on the quiet valley")


@pytest.fixture(scope="module")
def manifest(spark):
    rows = [
        (0, GOOD),                           # keeper
        (1, GOOD),                           # exact dup of 0 → duplicate
        (2, "short junk ###"),               # fails gopher → quality
        (3, GOOD + " benchmark marker one two three four five six"),
        (4, GOOD.replace("quick", "slow")),  # near-dup but NOT exact → kept
        (5, "short junk ###"),               # dup TEXT but quality loser:
                                             # never reaches dedup
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(99, "benchmark marker one two three four five six seven")],
        "doc_id long, text string")
    out = curate_manifest(docs, bench, min_words=20, gram_n=8)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_keeper(manifest):
    assert manifest[0] == {"doc_id": 0, "quality": 1, "duplicate": 0,
                           "contaminated": 0, "keep": 1, "reason": ""}
    assert manifest[4]["keep"] == 1


def test_exact_duplicate_dropped_keep_first(manifest):
    assert manifest[1]["duplicate"] == 1
    assert manifest[1]["keep"] == 0
    assert manifest[1]["reason"] == "duplicate"


def test_quality_loser_never_reaches_dedup(manifest):
    for d in (2, 5):
        assert manifest[d]["quality"] == 0
        assert manifest[d]["duplicate"] == 0    # not even the canon race
        assert manifest[d]["reason"] == "quality"


def test_contaminated(manifest):
    assert manifest[3]["contaminated"] == 1
    assert manifest[3]["keep"] == 0
    assert manifest[3]["reason"] == "contaminated"


def test_plan_shape(spark):
    """One corpus-side broadcast join for decontamination (the corpus
    must not shuffle for it) and no Python anywhere."""
    docs = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, GOOD)], "doc_id long, text string")
    plan = curate_manifest(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "Python" not in plan and "mapInPandas" not in plan
