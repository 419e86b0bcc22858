"""Range fields — documents that carry intervals, queried by relation.

Reference: `lucene/core/src/java/org/apache/lucene/document/
RangeFieldQuery.java:40-180` over `LongRange`/`DoubleRange`/`IntRange`/
`FloatRange` (document/LongRange.java:38): each doc stores one or more
[min, max] ranges per dimension; a query range selects docs by
relation —

- INTERSECTS: doc.min ≤ q.max AND doc.max ≥ q.min
- WITHIN:     doc inside the query  (doc.min ≥ q.min AND doc.max ≤ q.max)
- CONTAINS:   doc contains the query (doc.min ≤ q.min AND doc.max ≥ q.max)
- CROSSES:    intersects but neither within nor contains
  (RangeFieldQuery.java:158-180 defines CROSSES exactly as
  intersects ∧ ¬within ∧ ¬contains)

Multi-dimensional ranges apply the relation per dimension and AND the
dimensions (the reference's packed-value comparison walks dims);
CROSSES is evaluated on the whole box: intersects-all-dims ∧
¬within-all ∧ ¬contains-all.

Spark shape: doc ranges are ordinary (min, max) column pairs; every
relation is a pure codegen conjunction the Parquet scan can push
(min/max column statistics prune row groups exactly like the
reference's BKD tree prunes cells). No UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

RELATIONS = ("intersects", "within", "contains", "crosses")


def _dim_preds(dims, query):
    inter, within, contains = F.lit(True), F.lit(True), F.lit(True)
    for (lo_col, hi_col), (qlo, qhi) in zip(dims, query):
        if qlo > qhi:
            raise ValueError(f"query range [{qlo}, {qhi}] is inverted")
        lo, hi = F.col(lo_col), F.col(hi_col)
        inter = inter & (lo <= qhi) & (hi >= qlo)
        within = within & (lo >= qlo) & (hi <= qhi)
        contains = contains & (lo <= qlo) & (hi >= qhi)
    return inter, within, contains


def range_field_predicate(dims, query, relation: str) -> Column:
    """Boolean Column for a range-field relation. ``dims`` = [(min_col,
    max_col), …] one per dimension; ``query`` = [(lo, hi), …] aligned."""
    if relation not in RELATIONS:
        raise ValueError(f"unknown relation {relation!r}")
    if len(dims) != len(query) or not dims:
        raise ValueError("dims and query ranges must align (non-empty)")
    inter, within, contains = _dim_preds(dims, query)
    if relation == "intersects":
        return inter
    if relation == "within":
        return within
    if relation == "contains":
        return contains
    return inter & ~within & ~contains     # crosses


def range_field_query(docs: DataFrame, dims, query,
                      relation: str = "intersects") -> DataFrame:
    """Filter ``docs`` to the rows whose stored range(s) stand in
    ``relation`` to the query range(s) — RangeFieldQuery as one pushed
    codegen predicate. Docs with a NULL bound never match (the
    reference indexes no point for a missing range)."""
    pred = range_field_predicate(dims, query, relation)
    notnull = F.lit(True)
    for lo_col, hi_col in dims:
        notnull = notnull & F.col(lo_col).isNotNull() \
            & F.col(hi_col).isNotNull()
    return docs.filter(notnull & pred)
