"""Retrieval-quality eval (`benchmark/quality/QualityStats.java:30`):
hand-computed metric pins on a tiny run + judgments fixture, plus the
no-relevant-docs zero case and the broadcast/shuffle-path equivalence."""

import math

from lucene_solr_spark.search.quality import average_precision, quality_stats

LOG2 = math.log2

RUN = [("a", d, r) for r, d in enumerate([1, 2, 3, 4, 5], start=1)]
RUN += [("b", d, r) for r, d in enumerate([6, 7, 8], start=1)]
QRELS = [("a", 2, 1), ("a", 4, 2), ("a", 9, 1)]


def _frames(spark):
    run = spark.createDataFrame(RUN, "query_id string, doc_id long, rank int")
    qrels = spark.createDataFrame(
        QRELS, "query_id string, doc_id long, grade int")
    return run, qrels


def test_quality_stats_hand_computed(spark):
    run, qrels = _frames(spark)
    rows = {r["query_id"]: r
            for r in quality_stats(run, qrels, k=5).collect()}
    a = rows["a"]
    # 2 of 5 retrieved are relevant; 3 judged relevant in total
    assert abs(a["p_at_k"] - 2 / 5) < 1e-12
    assert abs(a["recall_at_k"] - 2 / 3) < 1e-12
    # first relevant at rank 2
    assert abs(a["mrr"] - 0.5) < 1e-12
    dcg = (2 ** 1 - 1) / LOG2(3) + (2 ** 2 - 1) / LOG2(5)
    idcg = 3 / LOG2(2) + 1 / LOG2(3) + 1 / LOG2(4)
    assert abs(a["ndcg_at_k"] - dcg / idcg) < 1e-12
    # query b has no judgments at all -> all zeros (QualityStats'
    # maxGoodPoints == 0 convention)
    b = rows["b"]
    assert (b["p_at_k"], b["recall_at_k"], b["mrr"], b["ndcg_at_k"]) \
        == (0.0, 0.0, 0.0, 0.0)


def test_quality_stats_k_caps_the_run(spark):
    run, qrels = _frames(spark)
    rows = {r["query_id"]: r
            for r in quality_stats(run, qrels, k=3).collect()}
    a = rows["a"]
    # only rank<=3 counts: relevant seen = {rank 2}; doc 4 drops out
    assert abs(a["p_at_k"] - 1 / 3) < 1e-12
    assert abs(a["recall_at_k"] - 1 / 3) < 1e-12
    dcg = (2 ** 1 - 1) / LOG2(3)
    idcg = 3 / LOG2(2) + 1 / LOG2(3) + 1 / LOG2(4)  # top-3 ideal grades
    assert abs(a["ndcg_at_k"] - dcg / idcg) < 1e-12


def test_average_precision(spark):
    run, qrels = _frames(spark)
    rows = {r["query_id"]: r["avg_precision"]
            for r in average_precision(run, qrels).collect()}
    # relevant hits at ranks 2 and 4 -> (1/2 + 2/4) / 3
    assert abs(rows["a"] - (0.5 + 0.5) / 3) < 1e-12
    assert "b" not in rows  # no relevant hit -> no AP row


def test_broadcast_and_shuffle_paths_agree(spark):
    run, qrels = _frames(spark)
    fast = quality_stats(run, qrels, k=5).toPandas()
    slow = quality_stats(run, qrels, k=5, broadcast_qrels=False).toPandas()
    f = fast.sort_values("query_id").reset_index(drop=True)
    s = slow.sort_values("query_id").reset_index(drop=True)
    assert (f == s).all().all()
