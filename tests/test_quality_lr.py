"""GPT-3 appendix-A quality classifier (`pipeline/quality_lr.py`):
separability on a planted corpus, score sanity, and the deterministic
Pareto filter's keep semantics."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.pipeline.quality_lr import (pareto_filter,
                                                   score_quality,
                                                   train_quality_classifier)

GOOD = ["thorough careful analysis with citations and methods",
        "detailed study results discussion careful methods",
        "analysis citations methods thorough discussion study",
        "careful results citations methods detailed analysis"]
BAD = ["click here buy now cheap deals deals",
       "cheap cheap buy click now here deals",
       "buy deals click cheap now now here",
       "deals now buy here click cheap cheap"]


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame([(t,) for t in GOOD], "text string")
    neg = spark.createDataFrame([(t,) for t in BAD], "text string")
    return train_quality_classifier(pos, neg, num_features=1 << 12)


def test_separates_planted_classes(spark, model):
    probe = spark.createDataFrame(
        [(0, "careful analysis citations study"),
         (1, "buy cheap deals click now")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["quality_score"]
           for r in score_quality(model, probe).collect()}
    assert got[0] > 0.9
    assert got[1] < 0.1


def test_score_in_unit_interval(spark, model):
    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + BAD + ["unrelated words"])],
        "doc_id long, text string")
    for r in score_quality(model, probe).collect():
        assert 0.0 <= r["quality_score"] <= 1.0


def test_pareto_filter_semantics(spark):
    # score 1.0 always kept (threshold 1 - pareto < 1); score <= 0 can
    # only be kept when the doc's Pareto draw exceeds 1
    rows = [(i, 1.0) for i in range(50)] + [(1000 + i, 0.0)
                                            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    kept = pareto_filter(df, alpha=9.0)
    ones = kept.filter("quality_score = 1.0").count()
    zeros = kept.filter("quality_score = 0.0").count()
    assert ones == 50
    # P(pareto > 1) = 2^-9 ~ 0.2% -> a trickle, far below half
    assert zeros < 20
    # deterministic and reshard-invariant
    k1 = sorted(r["doc_id"] for r in
                pareto_filter(df.repartition(1)).collect())
    k7 = sorted(r["doc_id"] for r in
                pareto_filter(df.repartition(7)).collect())
    assert k1 == k7


def test_pareto_filter_monotone_in_score(spark):
    """For a FIXED doc id the rule is monotone: if a lower score is
    kept, any higher score with the same id is kept too."""
    df = spark.createDataFrame(
        [(7, s / 20.0) for s in range(21)],
        "doc_id long, quality_score double")
    kept = sorted(r["quality_score"]
                  for r in pareto_filter(df).collect())
    if kept:
        lo = min(kept)
        assert all(s >= lo for s in kept)
        assert len(kept) == len([s for s in range(21) if s / 20.0 >= lo])