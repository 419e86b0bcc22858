"""Result grouping, field collapse, and per-field stats over a match
set.

References (semantics only):
- `lucene/grouping/src/java/org/apache/lucene/search/grouping/
  FirstPassGroupingCollector.java:44` — top N groups ordered by the
  group's best hit; `TopGroups.java` / SecondPassGroupingCollector —
  top docs within each selected group.
- Solr CollapsingQParserPlugin — one surviving doc per collapse key:
  the group's best hit by (score desc, docID asc).
- Solr StatsComponent (org.apache.solr.handler.component.StatsComponent)
  — count / missing / min / max / sum / mean / stddev of a numeric
  docvalue field over the documents matching the query.

Spark shape: both grouping passes are window functions over the scored
hits — partitionBy(group key) with a rank inside, then an optional
second rank across group leaders. The hits frame is already small
relative to the corpus (it is a match set, not the index), and window
ranks stay in the JVM. Stats is a single map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _with_group(hits: DataFrame, docs: DataFrame, field: str) -> DataFrame:
    return hits.join(docs.select("doc_id", field), "doc_id")


def collapse(hits: DataFrame, docs: DataFrame, field: str) -> DataFrame:
    """Field collapse: the single best hit per distinct ``field`` value
    — score desc, doc_id asc within the group (CollapsingQParserPlugin
    default min/max=score behavior). → (doc_id, score, <field>)."""
    w = (Window.partitionBy(field)
         .orderBy(F.desc("score"), F.asc("doc_id")))
    return (_with_group(hits, docs, field)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def top_groups(hits: DataFrame, docs: DataFrame, field: str,
               n_groups: int, group_size: int) -> DataFrame:
    """Two-pass grouping (FirstPassGroupingCollector.java:44 then
    second pass): the ``n_groups`` groups with the best leading hit,
    each with its top ``group_size`` docs. → (<field>, doc_id, score),
    groups ordered by leader score, docs by (score desc, doc_id)."""
    win = (Window.partitionBy(field)
           .orderBy(F.desc("score"), F.asc("doc_id")))
    ranked = (_with_group(hits, docs, field)
              .withColumn("_rn", F.row_number().over(win)))
    # group leaders → select top-n groups by the leader's (score, doc_id)
    gwin = Window.orderBy(F.desc("_ls"), F.asc("_ld"))
    leaders = (ranked.filter(F.col("_rn") == 1)
               .select(F.col(field),
                       F.col("score").alias("_ls"),
                       F.col("doc_id").alias("_ld"))
               .withColumn("_gr", F.row_number().over(gwin))
               .filter(F.col("_gr") <= n_groups))
    return (ranked.filter(F.col("_rn") <= group_size)
            .join(F.broadcast(leaders), field)
            .orderBy(F.asc("_gr"), F.asc("_rn"))
            .select(field, "doc_id", "score"))


def field_stats(docs: DataFrame, matches: DataFrame | None,
                field: str) -> DataFrame:
    """Solr StatsComponent over the match set → one row
    (count, missing, min, max, sum, mean, stddev); stddev is the sample
    standard deviation (StatsValuesFactory uses the n−1 form)."""
    m = docs if matches is None else docs.join(
        matches.select("doc_id").distinct(), "doc_id", "left_semi")
    v = F.col(field)
    return m.agg(
        F.count(v).alias("count"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long")
        .alias("missing"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.sum(v).alias("sum"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("stddev"))
