"""Luke-style index introspection: per-field stats and top terms.

Parity target: ``solr/core/src/java/org/apache/solr/handler/admin/
LukeRequestHandler.java:98`` (docs:398, topTerms:693) (the /admin/luke handler: per-field
``docs`` / ``distinct`` term counts and ``topTerms``) plus Lucene's
``Terms.size()/getSumDocFreq()/getSumTotalTermFreq()/getDocCount()``
accessors (``index/Terms.java:82-120``) that the handler reads per
field.

Spark-first restatement: the reference walks the FST term dictionary
segment by segment; here the dictionary IS a distributed sorted table
(field, term, df, ttf), so every Luke number is one map-side-combined
aggregation over it — no terms enumeration loop, no driver-side walk.
``doc_count`` (docs with at least one indexed token in the field)
comes from the norms table, which by construction has exactly one row
per (field, doc) with a surviving post-stop token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def luke_field_stats(index) -> DataFrame:
    """One row per indexed field:
    (field, distinct_terms, doc_count, sum_df, sum_ttf) — the same
    numbers LukeRequestHandler reports from Terms metadata, computed
    by aggregation instead of enumeration."""
    terms = index.terms.groupBy("field").agg(
        F.count(F.lit(1)).alias("distinct_terms"),
        F.sum("df").cast("long").alias("sum_df"),
        F.sum("ttf").cast("long").alias("sum_ttf"))
    docs = index.norms.groupBy("field").agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"))
    return (terms.join(docs, "field", "left")
            .select("field", F.col("distinct_terms").cast("long"),
                    "doc_count", "sum_df", "sum_ttf"))


def luke_top_terms(index, field: str, n: int = 10) -> DataFrame:
    """The handler's ``topTerms`` list for one field: top-``n`` terms
    by document frequency (ties broken term-ascending, as the
    reference's TopTermQueue orders deterministically). A pushed
    filter + TakeOrderedAndProject — never a full dictionary collect."""
    return (index.terms.filter(F.col("field") == field)
            .select("term", F.col("df").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("term")).limit(n))
