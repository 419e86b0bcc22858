"""Learning-to-rank rescoring — the Solr LTR contrib re-expressed as
one feature-extraction plan + a model expression.

References (semantics only):
- `solr/contrib/ltr/src/java/org/apache/solr/ltr/LTRRescorer.java:40`
  — rerank the top `reRankDocs` hits of the original ranking by the
  model score (ties: score desc, docid asc); hits beyond the window
  keep their original order below the reranked block.
- `ltr/model/LinearModel.java:58` — score = Σ_i weight_i × feature_i.
- `ltr/feature/OriginalScoreFeature.java` (the first-pass score),
  `FieldValueFeature.java` (numeric docvalue, `defaultValue` when
  missing), `SolrFeature.java` (the score of an arbitrary subsidiary
  query, default 0 when the doc doesn't match), `ValueFeature.java`
  (constant).
- `ltr/FeatureLogger.java` / `CSVFeatureLogger.java` — the extracted
  per-doc feature vector, the training-data export surface.

Spark shape: the candidate window is ≤ reRankDocs rows, so every
feature join is a broadcast semi-join against it; SolrFeatures run the
normal kernel once each (term-pruned scan), FieldValueFeatures are
column projections, and the model is a single codegen expression over
the assembled feature frame — no per-row Python anywhere."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Feature:
    """One named feature; ``kind`` ∈ original_score | field_value |
    query | value (the four reference feature classes)."""
    name: str
    kind: str
    payload: object = None
    default: float = 0.0


def original_score_feature(name: str) -> Feature:
    return Feature(name, "original_score")


def field_value_feature(name: str, column: str,
                        default: float = 0.0) -> Feature:
    return Feature(name, "field_value", column, default)


def solr_feature(name: str, query, default: float = 0.0) -> Feature:
    return Feature(name, "query", query, default)


def value_feature(name: str, value: float) -> Feature:
    return Feature(name, "value", float(value))


@dataclass(frozen=True)
class LinearModel:
    """`ltr/model/LinearModel.java:58`: score = Σ w_i × f_i."""
    weights: tuple    # ((feature_name, weight), ...)

    def expr(self):
        col = F.lit(0.0)
        for name, w in self.weights:
            col = col + F.lit(float(w)) * F.col(name)
        return col


def extract_features(searcher, docs: DataFrame, candidates: DataFrame,
                     features: list[Feature]) -> DataFrame:
    """FeatureLogger surface: → (doc_id, score, <feature columns…>) for
    every candidate row. ``candidates`` must have (doc_id, score) —
    typically the first-pass top-N. Each query feature is one kernel
    pass; its scores LEFT-join the (broadcast-sized) candidate set with
    the feature's default filling non-matches
    (Feature.FeatureWeight.getDefaultValue)."""
    out = candidates.select("doc_id", "score")
    for ft in features:
        if ft.kind == "original_score":
            out = out.withColumn(ft.name, F.col("score"))
        elif ft.kind == "value":
            out = out.withColumn(ft.name, F.lit(ft.payload))
        elif ft.kind == "field_value":
            vals = docs.select("doc_id",
                               F.col(ft.payload).cast("double")
                               .alias(ft.name))
            out = (out.join(vals, "doc_id", "left")
                   .fillna({ft.name: ft.default}))
        elif ft.kind == "query":
            sc = (searcher.score_all(ft.payload, mode="f64")
                  .select("doc_id", F.col("score").alias(ft.name)))
            out = (out.join(sc, "doc_id", "left")
                   .fillna({ft.name: ft.default}))
        else:
            raise ValueError(f"unknown feature kind {ft.kind!r}")
    return out


def ltr_rescore(searcher, docs: DataFrame, first_pass: DataFrame,
                features: list[Feature], model: LinearModel,
                rerank_docs: int = 20) -> DataFrame:
    """LTRRescorer.rescore: take the top ``rerank_docs`` of the first
    pass (score desc, doc_id asc — TopDocs order), extract features,
    score with the model → (doc_id, score) ordered by model score desc,
    doc_id asc. One TakeOrderedAndProject bounds the window; everything
    after operates on ≤ rerank_docs rows."""
    cut = (first_pass.orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(rerank_docs))
    feats = extract_features(searcher, docs, cut, features)
    return (feats.select("doc_id", model.expr().alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")))
