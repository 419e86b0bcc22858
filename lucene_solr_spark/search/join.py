"""Query-time joins: JoinUtil and block-join analogs.

References (semantics only):
- `lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:90-130`
  `createJoinQuery(fromField, multipleValues, toField, fromQuery,
  fromSearcher, scoreMode)`: run the from-query, collect the from-field
  values of its hits (with per-value score aggregation), then match every
  to-side document whose to-field holds one of those values, scored by
  the aggregate.
- `join/ScoreMode.java:25`: None / Avg / Max / Total / Min.
- `join/ToParentBlockJoinQuery.java:63`: child-query hits roll up to
  their parent document with a ScoreMode aggregate.
- `join/ToChildBlockJoinQuery.java:45`: parent-query hits propagate down
  to every child.

Spark shape: the reference materializes the joined value→score map on
the heap of one searcher (JoinUtil collects into a `TermsCollector` /
`GenericTermsCollector`) — i.e. the from side is semantically a
broadcast. Here the from-query runs distributed (`Searcher.score_all`),
the per-value aggregate is one map-side-combined groupBy on the join
value, and the (small) aggregate is broadcast to the to side, so the to
scan stays narrow — no wide shuffle of the 100-TB side. When the
distinct-value count is too large to broadcast, pass
``broadcast_values=False`` and AQE picks the join strategy.

Block join needs no index-time block encoding on Spark: parent/child
live in separate relations and the rollup is a map-side-combined
aggregate on the parent key (one shuffle of the matched children only,
because the child predicate is pushed to the scan first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_AGGS = {
    "none": lambda c: F.lit(1.0),
    "total": lambda c: F.sum(c),
    "max": lambda c: F.max(c),
    "min": lambda c: F.min(c),
    "avg": lambda c: F.avg(c),
    "count": lambda c: F.count(F.lit(1)).cast("double"),
}


def _agg_score(score_mode: str) -> "callable":
    if score_mode not in _AGGS:
        raise ValueError(f"score_mode must be one of {sorted(_AGGS)}")
    return _AGGS[score_mode]


def join_query(searcher, from_query, from_docs: DataFrame, from_field: str,
               to_docs: DataFrame, to_field: str,
               score_mode: str = "max",
               broadcast_values: bool = True) -> DataFrame:
    """JoinUtil.createJoinQuery analog → (doc_id, score) over ``to_docs``.

    ``from_query`` is any engine Query (AST); its hits are joined to
    ``from_docs`` on doc_id to read ``from_field``; scores aggregate per
    distinct from-value by ``score_mode`` ('none'|'total'|'max'|'min'|
    'avg'|'count'); every to-doc whose ``to_field`` equals a collected
    value matches with that aggregate as its score (ScoreMode.java:25 —
    'none' scores 1.0 like the reference's constant-score rewrite).
    """
    hits = searcher.score_all(from_query, mode="f64")
    vals = (hits.join(from_docs.select(F.col("doc_id"),
                                       F.col(from_field).alias("_jv")),
                      "doc_id")
            .groupBy("_jv")
            .agg(_agg_score(score_mode)(F.col("score")).alias("_js")))
    if broadcast_values:
        vals = F.broadcast(vals)
    return (to_docs.join(vals, to_docs[to_field] == vals["_jv"])
            .select(F.col("doc_id"), F.col("_js").alias("score")))


def block_join_to_parent(children: DataFrame, parent_key: str,
                         child_filter: Column,
                         score_mode: str = "total",
                         child_score: Column | None = None) -> DataFrame:
    """ToParentBlockJoinQuery analog → (parent_key, score).

    Children matching ``child_filter`` (a Catalyst predicate, pushed to
    the scan) roll up to their parent with the ScoreMode aggregate of
    ``child_score`` (default: constant 1.0 per matching child, the
    constant-score child-query case — so 'total' == matching-child
    count). A parent with no matching child does not match
    (ToParentBlockJoinQuery.java:63).
    """
    sc = child_score if child_score is not None else F.lit(1.0)
    return (children.filter(child_filter)
            .select(F.col(parent_key), sc.alias("_cs"))
            .groupBy(parent_key)
            .agg(_agg_score(score_mode)(F.col("_cs")).alias("score")))


def block_join_to_child(parents: DataFrame, children: DataFrame,
                        parent_key: str, child_key: str,
                        parent_filter: Column,
                        parent_score: Column | None = None) -> DataFrame:
    """ToChildBlockJoinQuery analog → child rows + parent's score.

    Every child of a parent matching ``parent_filter`` matches, carrying
    the parent's score (ToChildBlockJoinQuery.java:45 — the parent score
    is handed down unchanged). Parent side is filtered to (key, score)
    and broadcast; the child scan stays narrow.
    """
    ps = parent_score if parent_score is not None else F.lit(1.0)
    pk = (parents.filter(parent_filter)
          .select(F.col(parent_key).alias("_pk"), ps.alias("score")))
    return (children.join(F.broadcast(pk),
                          children[child_key] == pk["_pk"])
            .drop("_pk"))


def block_join_facet(children: DataFrame, child_filter: Column,
                     parent_key: str, facet_field: str,
                     min_count: int = 1) -> DataFrame:
    """Solr block-join faceting — json.facet ``uniqueBlock(_root_)`` /
    BlockJoinFacetComponent (`solr/core/src/java/org/apache/solr/search/
    join/BlockJoinFacetComponent.java:38`): facet counts over CHILD
    matches where each facet value counts at most once PER PARENT BLOCK
    (two matching children of the same parent contribute 1, not 2 — the
    component's whole point vs a plain child facet).

    Spark shape: filter children, ONE count(DISTINCT parent_key) agg per
    facet value — Spark plans distinct-inside-agg as a two-level
    partial/merge aggregation (value,parent dedup map-side), so nothing
    wider than (value, parent) pairs ever shuffles."""
    m = children.filter(child_filter)
    return (m.filter(F.col(facet_field).isNotNull())
            .groupBy(F.col(facet_field).cast("string").alias("value"))
            .agg(F.countDistinct(parent_key).alias("count"))
            .filter(F.col("count") >= min_count)
            .orderBy(F.desc("count"), F.asc("value")))
