"""FunctionScoreQuery / DoubleValuesSource analogs.

References (semantics only):
- `lucene/queries/src/java/org/apache/lucene/queries/function/
  FunctionScoreQuery.java:46` — replaces a query's score with a
  DoubleValuesSource expression; `boostByValue:74` multiplies the
  wrapped query's score by a per-doc value; `boostByQuery:88` scales by
  a constant when a second query also matches.
- `search/DoubleValuesSource.java:60` — per-doc doubles from docvalue
  fields, constants, and arithmetic over them.
- Solr function-query surface (`boost=`, `bf=`): multiplicative /
  additive per-doc boosts over stored numeric fields.

Spark shape: DoubleValuesSource IS a Catalyst expression — any
`F.expr` over the docvalue columns runs in whole-stage codegen. The
match set comes from the kernel (`Searcher.score_all`), the boost is a
narrow broadcast-join + projection; nothing here adds a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def function_score(searcher, query, docs: DataFrame,
                   value: Column | str,
                   combine: str = "multiply") -> DataFrame:
    """FunctionScoreQuery: per-doc re-score of ``query``'s hits →
    (doc_id, score).

    ``value`` is a Catalyst expression over ``docs``'s docvalue columns
    (a DoubleValuesSource); ``combine`` is 'multiply'
    (boostByValue semantics), 'add' (Solr bf), or 'replace'
    (FunctionScoreQuery.java:46 — the expression IS the score; docs
    still must match the wrapped query).
    """
    v = F.expr(value) if isinstance(value, str) else value
    hits = searcher.score_all(query, mode="f64")
    joined = hits.join(docs.select("doc_id", v.cast("double").alias("_fv")),
                       "doc_id")
    if combine == "multiply":
        out = F.col("score") * F.col("_fv")
    elif combine == "add":
        out = F.col("score") + F.col("_fv")
    elif combine == "replace":
        out = F.col("_fv")
    else:
        raise ValueError("combine must be multiply|add|replace")
    return joined.select("doc_id", out.alias("score"))


def scale_expr(docs: DataFrame, source: Column | str,
               target_min: float = 0.0, target_max: float = 1.0) -> Column:
    """Solr ``scale(x, min, max)``
    (`lucene/queries/.../valuesource/ScaleFloatFunction.java:111-123`):
    linearly map the source's OBSERVED corpus [min, max] onto
    [target_min, target_max] — value = (x − minSrc)·scale + min with
    scale = (max−min)/(maxSrc−minSrc), and scale = 0 when the source is
    constant (the reference's explicit guard, so every doc gets
    target_min).

    The reference walks every leaf's values once to find min/max and
    caches the ScaleInfo per reader; here that is ONE map-side-combined
    (min, max) aggregation over the corpus — two doubles to the driver
    regardless of scale — and the returned Column is a pure projection
    usable anywhere a DoubleValuesSource goes (function_score, frange,
    sort)."""
    src = F.col(source) if isinstance(source, str) else source
    mm = docs.agg(F.min(src.cast("double")).alias("mn"),
                  F.max(src.cast("double")).alias("mx")).collect()[0]
    mn, mx = float(mm.mn), float(mm.mx)
    sc = 0.0 if mx == mn else (float(target_max) - float(target_min)) \
        / (mx - mn)
    return (src.cast("double") - F.lit(mn)) * F.lit(sc) \
        + F.lit(float(target_min))


def boost_by_query(searcher, query, boost_query,
                   boost: float) -> DataFrame:
    """FunctionScoreQuery.boostByQuery analog → (doc_id, score): hits of
    ``query``, scores multiplied by ``boost`` where ``boost_query``
    also matches (its score is ignored — QueryBoost semantics,
    FunctionScoreQuery.java:88)."""
    hits = searcher.score_all(query, mode="f64")
    bq = (searcher.score_all(boost_query, mode="f64")
          .select("doc_id", F.lit(True).alias("_bm")))
    return (hits.join(bq, "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("_bm"), F.col("score") * F.lit(boost))
                    .otherwise(F.col("score")).alias("score")))


def feature_score(searcher, query, docs: DataFrame, feature_col: str,
                  function: str = "saturation", weight: float = 1.0,
                  pivot: float = 1.0, a: float = 1.0,
                  scaling: float = 1.0) -> DataFrame:
    """FeatureField static-feature scoring
    (`document/FeatureField.java:220-382`): a per-doc signal like
    pagerank combined ADDITIVELY with the text score (the documented
    pattern: the feature query is a SHOULD clause next to the text
    query). Functions over feature value S:

    - 'log'        → weight * ln(scaling + S)     (LogFunction:252)
    - 'saturation' → weight * S / (S + pivot)     (SaturationFunction:323)
    - 'sigmoid'    → weight * S^a / (S^a + pivot^a) (SigmoidFunction:382)

    The reference encodes S in the term-freq slot of a pseudo-term and
    evaluates the function as a Similarity; here S is a docvalue column
    and the function one codegen expression — same additive combine,
    minus the freq-quantization (decodeFeatureValue) the reference
    only applies because it must squeeze S into a postings freq.
    → (doc_id, score)."""
    s = F.col("_fv").cast("double")
    if function == "log":
        fv = F.lit(weight) * F.log(F.lit(scaling) + s)
    elif function == "saturation":
        fv = F.lit(weight) * (F.lit(1.0) - F.lit(pivot) / (s + F.lit(pivot)))
    elif function == "sigmoid":
        pa = float(pivot) ** float(a)
        fv = F.lit(weight) * (F.lit(1.0)
                              - F.lit(pa) / (F.pow(s, F.lit(a)) + F.lit(pa)))
    else:
        raise ValueError("function must be log|saturation|sigmoid")
    hits = searcher.score_all(query, mode="f64")
    joined = hits.join(
        docs.select("doc_id", F.col(feature_col).alias("_fv")), "doc_id")
    return joined.select(
        "doc_id", (F.col("score") + fv).alias("score"))


def function_range_filter(searcher, query, docs: DataFrame,
                          value: Column | str,
                          lower: float | None = None,
                          upper: float | None = None,
                          include_lower: bool = True,
                          include_upper: bool = True) -> DataFrame:
    """Solr ``{!frange}`` (`solr/core/src/java/org/apache/solr/search/
    function/ValueSourceRangeFilter.java:40` / FunctionRangeQuery):
    keep hits of ``query`` whose function value lies in [l, u], with
    incl (includeLower/includeUpper) flags; a missing bound is open
    (the reference passes null). The hit keeps its own relevance score
    — frange is a FILTER, not a re-scorer (ValueSourceRangeFilter is a
    two-sided SolrConstantScoreQuery used in fq).

    Spark shape: the function is a Catalyst expression over docvalue
    columns, the filter one codegen predicate after a narrow join —
    when the function only references pushable columns the predicate
    folds into the scan. → (doc_id, score)."""
    v = F.expr(value) if isinstance(value, str) else value
    hits = searcher.score_all(query, mode="f64")
    joined = hits.join(docs.select("doc_id", v.cast("double").alias("_fv")),
                       "doc_id")
    pred = F.lit(True)
    if lower is not None:
        pred = pred & (F.col("_fv") >= lower if include_lower
                       else F.col("_fv") > lower)
    if upper is not None:
        pred = pred & (F.col("_fv") <= upper if include_upper
                       else F.col("_fv") < upper)
    return joined.filter(pred).select("doc_id", "score")


def strdist(a: Column | str, b: Column | str,
            measure: str = "edit") -> Column:
    """Solr ``strdist(a, b, measure)`` function query
    (`solr/core/src/java/org/apache/solr/search/ValueSourceParser.java`
    strdist parser over `StrDistanceFunction`): a 0..1 SIMILARITY
    between two strings. ``edit`` is Levenshtein normalized the way
    commons-text's LevenshteinDistance-based similarity is consumed by
    Solr: 1 − distance / max(len(a), len(b)); identical strings → 1,
    one empty → 0 unless both empty (→ 1). ``jw``/``ngram`` measures
    are not implemented (Spark has no built-in; a UDF would put Python
    in a per-row scoring position) — ValueError rather than a silent
    fallback.

    Pure codegen: `levenshtein` is a JVM built-in, the normalization a
    constant-folded projection."""
    if measure != "edit":
        raise ValueError(f"strdist measure {measure!r} not implemented "
                         "(only 'edit'); jw/ngram need per-row Python")
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    mx = F.greatest(F.length(ca), F.length(cb))
    return (F.when(mx == 0, F.lit(1.0))
            .otherwise(1.0 - F.levenshtein(ca, cb) / mx))
