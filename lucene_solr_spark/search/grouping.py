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


def expand_groups(hits: DataFrame, docs: DataFrame, field: str,
                  expand_rows: int = 5) -> DataFrame:
    """ExpandComponent (solr/handler/component/ExpandComponent.java:94):
    companion to :func:`collapse` — for every group that placed its
    leader in the collapsed result, the next ``expand_rows`` best hits
    of that group (leader excluded), ordered within the group by score
    desc then doc_id. → (<field>, doc_id, score).

    One window pass: rank within group, rows 2..expand_rows+1 survive —
    no driver round-trip, group count never materializes."""
    w = (Window.partitionBy(field)
         .orderBy(F.desc("score"), F.asc("doc_id")))
    return (_with_group(hits, docs, field)
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") > 1) & (F.col("_rn") <= expand_rows + 1))
            .select(field, "doc_id", "score"))


def significant_terms(searcher, matches: DataFrame,
                      field: str = "text", min_doc_freq: float = 5,
                      max_doc_freq: float = 0.3, min_term_length: int = 0,
                      k: int = 10) -> DataFrame:
    """SignificantTermsQParserPlugin
    (solr/search/SignificantTermsQParserPlugin.java:168-221): for every
    term of ``field``, tf = number of RESULT-SET docs containing it;
    score = ln(tf) × (ln((numDocs + 1)/(docFreq + 1)) + 1); terms
    outside the [min, max] doc-freq band are skipped (values < 1.0 are
    ratios of numDocs, ≥ 1 absolute counts, `:171-185`), as are terms
    shorter than ``min_term_length`` and tf == 0 terms (`:207-209`).
    numDocs is the field's doc count (the reference uses the reader's
    global numDocs; identical when every doc populates the field).

    → (term, score, tf, df) top-``k`` by score desc then term asc.
    Plan: raw-postings semi-join against the match set → one map-side-
    combined count per term → broadcast-sized join onto the dictionary
    slice; only k rows reach the driver."""
    raw = searcher.index.raw
    if raw is None:
        raise ValueError("index did not retain raw postings "
                         "(significant terms unavailable)")
    n = searcher.field_stats(field)["doc_count"]
    lo = min_doc_freq * n if min_doc_freq < 1.0 else min_doc_freq
    hi = max_doc_freq * n if max_doc_freq < 1.0 else max_doc_freq
    dic = (searcher.index.terms
           .filter((F.col("field") == field)
                   & (F.col("df") >= float(lo)) & (F.col("df") <= float(hi))
                   & (F.length("term") >= int(min_term_length)))
           .select("term", "df"))
    tf = (raw.filter(F.col("field") == field)
          .join(matches.select("doc_id").distinct(), "doc_id", "left_semi")
          .groupBy("term").agg(F.count(F.lit(1)).alias("tf")))
    scored = (tf.join(dic, "term")
              .withColumn("score",
                          F.log(F.col("tf").cast("double"))
                          * (F.log((F.lit(float(n) + 1.0))
                                   / (F.col("df") + 1.0)) + F.lit(1.0))))
    return (scored.orderBy(F.desc("score"), F.asc("term")).limit(k)
            .select("term", "score", F.col("tf").cast("long"),
                    F.col("df").cast("long")))


def elevate(hits: DataFrame, elevated_ids: list, k: int = 10,
            exclude_ids: list = ()) -> DataFrame:
    """QueryElevationComponent (solr/handler/component/
    QueryElevationComponent.java — editorial ranking): the configured
    doc_ids rank FIRST in their configured order (whether or not they
    matched — Solr forces them into the result), excluded ids are
    removed, everything else follows by (score desc, doc_id).
    → (doc_id, score, elevated)."""
    order = {int(d): i for i, d in enumerate(elevated_ids)}
    spark = hits.sparkSession
    ed = spark.createDataFrame(
        [(d, i) for d, i in order.items()], "doc_id long, _ord int")
    out = (hits.join(ed, "doc_id", "full_outer")
           .withColumn("score", F.coalesce("score", F.lit(0.0)))
           .withColumn("elevated", F.col("_ord").isNotNull()))
    if exclude_ids:
        out = out.filter(~F.col("doc_id").isin([int(d) for d in exclude_ids]))
    return (out.orderBy(F.when(F.col("_ord").isNotNull(), 0).otherwise(1),
                        F.col("_ord").asc_nulls_last(),
                        F.desc("score"), F.asc("doc_id"))
            .limit(k).select("doc_id", "score", "elevated"))


def group_by_queries(searcher, main_query, group_queries: dict,
                     group_size: int = 10, mode: str = "f64") -> DataFrame:
    """Solr ``group.query`` (grouping/ — each named query IS a group):
    for every entry the top ``group_size`` hits of the MAIN result set
    restricted to docs matching that group query. → (group, doc_id,
    score), group asc then score desc/doc_id asc.

    Spark shape: the main query scores once; each group query
    contributes one match-set semi-join + TakeOrderedAndProject —
    mirroring the reference, which runs one collector per group.query."""
    hits = searcher.score_all(main_query, mode=mode)
    if not group_queries:
        return searcher.spark.createDataFrame(
            [], "group string, doc_id long, score double")
    out = None
    for name in sorted(group_queries):
        part = (hits.join(searcher.match_docs(group_queries[name]),
                          "doc_id", "left_semi")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(group_size)
                .select(F.lit(name).alias("group"), "doc_id", "score"))
        out = part if out is None else out.unionByName(part)
    return out


def top_groups_by_func(hits: DataFrame, docs: DataFrame, func_expr: str,
                       n_groups: int, group_size: int) -> DataFrame:
    """Solr ``group.func``: grouping key = a function-query value
    (any SQL expression over the doc columns) instead of a stored
    field; otherwise identical two-pass semantics to ``top_groups``.
    → (group_value, doc_id, score)."""
    keyed = docs.withColumn("_gfunc", F.expr(func_expr))
    res = top_groups(hits, keyed.select("doc_id", "_gfunc"), "_gfunc",
                     n_groups, group_size)
    return res.withColumnRenamed("_gfunc", "group_value")
