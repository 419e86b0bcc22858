"""Distributed retrieval-quality evaluation (P@k, recall@k, MRR, nDCG).

Parity target: the reference's search-quality benchmark package —
``lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityStats.java:27`` (getPrecisionAt:108, getRecall:128) (recall / precision-at-k / MRR over
``TrecJudge`` binary judgments, one stats object per query) and
``QualityBenchmark.java:41`` (run the query set, judge the top-k).
Re-expressed Spark-first:

* the *run* (query_id, doc_id, rank) and the *judgments*
  (query_id, doc_id, grade) are DataFrames, not in-memory arrays —
  a run over a 100 TB corpus with millions of queries never touches
  the driver;
* every metric is ONE equi-join (run ⋈ qrels on (query_id, doc_id) —
  broadcast the qrels side when small) followed by ONE map-side
  combined aggregation per query_id;
* the ideal-DCG ranking needs a per-query sort of the judged grades,
  done on collected *per-query grade arrays* (bounded by qrels depth,
  never by corpus size) with ``array_sort`` + a ``zip_with`` fold —
  no window function over the corpus, no Python in the hot path.

nDCG uses the standard exponential gain (2^grade − 1) / log2(rank + 1)
(Järvelin & Kekäläinen 2002) — the reference's QualityStats leaves
graded metrics to downstream trec_eval, so the formula here follows
the published definition rather than any reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quality_stats(run: DataFrame, qrels: DataFrame, k: int = 10,
                  broadcast_qrels: bool = True) -> DataFrame:
    """Per-query quality metrics for a retrieval run.

    ``run``: (query_id, doc_id, rank) with rank 1-based, unique per
    (query_id, doc_id). ``qrels``: (query_id, doc_id, grade) with
    grade > 0 meaning relevant (graded relevance feeds nDCG).

    Returns one row per query_id present in the run:
    (query_id, p_at_k, recall_at_k, mrr, ndcg_at_k). Queries with no
    judged-relevant documents report 0.0 for all four (the reference's
    QualityStats likewise yields zero recall when maxGoodPoints == 0).
    """
    q = qrels.select("query_id", "doc_id",
                     F.col("grade").cast("double").alias("grade"))
    if broadcast_qrels:
        q = F.broadcast(q)

    judged = (run.filter(F.col("rank") <= k)
              .join(q, ["query_id", "doc_id"], "left")
              .withColumn("grade", F.coalesce("grade", F.lit(0.0))))

    rel = F.col("grade") > 0
    per = judged.groupBy("query_id").agg(
        (F.sum(rel.cast("double")) / k).alias("p"),
        F.coalesce(F.max(F.when(rel, F.lit(1.0) / F.col("rank"))),
                   F.lit(0.0)).alias("mrr"),
        F.sum((F.pow(F.lit(2.0), F.col("grade")) - 1.0)
              / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        F.sum(rel.cast("long")).alias("rel_found"))

    # ideal ranking: top-k grades per query, sorted descending — the
    # grade list is bounded by judgment depth, safe to collect per key
    g = F.slice(F.reverse(F.array_sort(F.collect_list("grade"))), 1, k)
    ideal = (q.filter(rel).groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("total_rel"),
                  g.alias("top_grades"))
             .withColumn(
                 "idcg",
                 F.expr("aggregate(zip_with(top_grades,"
                        " sequence(1, size(top_grades)),"
                        " (gr, r) -> (pow(2.0D, gr) - 1.0D)"
                        "            / log2(cast(r as double) + 1.0D)),"
                        " 0.0D, (acc, x) -> acc + x)"))
             .drop("top_grades"))
    if broadcast_qrels:
        ideal = F.broadcast(ideal)

    out = per.join(ideal, "query_id", "left")
    return out.select(
        "query_id",
        F.col("p").alias("p_at_k"),
        F.when(F.col("total_rel") > 0,
               F.col("rel_found") / F.col("total_rel"))
        .otherwise(0.0).alias("recall_at_k"),
        F.col("mrr"),
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(0.0).alias("ndcg_at_k"))


def average_precision(run: DataFrame, qrels: DataFrame,
                      k: int | None = None,
                      broadcast_qrels: bool = True) -> DataFrame:
    """Per-query average precision (→ MAP when averaged), the headline
    number of QualityStats (``getAvp``, QualityStats.java:121).

    AP = (Σ over relevant retrieved hits i of (i / rank_i)) / R where
    i counts relevant hits in rank order and R = total relevant. The
    per-query relevant-rank list is bounded by judgment depth, so a
    sorted-array fold replaces the reference's per-hit running sum.
    """
    q = qrels.select("query_id", "doc_id",
                     F.col("grade").cast("double").alias("grade"))
    if broadcast_qrels:
        q = F.broadcast(q)
    r = run if k is None else run.filter(F.col("rank") <= k)
    hits = (r.join(q, ["query_id", "doc_id"], "inner")
            .filter(F.col("grade") > 0))
    ranks = hits.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.col("rank").cast("double")))
        .alias("rel_ranks"))
    total = q.filter(F.col("grade") > 0).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("total_rel"))
    if broadcast_qrels:
        total = F.broadcast(total)
    return (ranks.join(total, "query_id", "inner")
            .select(
                "query_id",
                (F.expr("aggregate(zip_with(rel_ranks,"
                        " sequence(1, size(rel_ranks)),"
                        " (rk, i) -> cast(i as double) / rk),"
                        " 0.0D, (acc, x) -> acc + x)")
                 / F.col("total_rel")).alias("avg_precision")))
