"""Two-pass rescoring: QueryRescorer analog.

References (semantics only): `search/QueryRescorer.java:33-50` —
`rescore(searcher, firstPassTopDocs, topN)` re-runs a (usually more
expensive) second query over ONLY the top-N first-pass hits and
combines scores via `combine(firstPassScore, secondPassMatched,
secondPassScore)`; the static helper `QueryRescorer.rescore(...,
weight)` uses first + weight × second (second term only where the
second query matches). Ties after combining keep first-pass order
(docID asc via the sort tie-break).

Spark shape: the top-N cut is a tiny frame (N rows); the second-pass
query runs through the normal kernel (block-pruned, distributed) and
is joined to the cut — the expensive query is never evaluated beyond
its own matching docs, and the combine is a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rescore(searcher, second_query, first_pass: DataFrame, top_n: int,
            weight: float = 1.0) -> DataFrame:
    """→ (doc_id, score): the ``top_n`` best first-pass hits (score
    desc, doc_id asc — TopDocs order) rescored as
    first + weight × second where ``second_query`` matches, first
    alone otherwise (QueryRescorer.java combine)."""
    cut = (first_pass.orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(top_n))
    second = (searcher.score_all(second_query, mode="f64")
              .withColumnRenamed("score", "_s2"))
    return (cut.join(second, "doc_id", "left")
            .select("doc_id",
                    (F.col("score")
                     + F.lit(weight) * F.coalesce(F.col("_s2"), F.lit(0.0)))
                    .alias("score")))
