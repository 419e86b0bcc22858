"""GPT-3-style document-quality classifier + Pareto-threshold filter.

Published recipe (Brown et al. 2020, "Language Models are Few-Shot
Learners", appendix A — and its restatements in The Pile / Gopher
data-work): train a LOGISTIC REGRESSION over hashed token features —
the GPT-3 authors used "Spark's standard tokenizer and HashingTF"
verbatim — with a curated corpus as positives and raw CommonCrawl as
negatives; score every raw document; keep a document iff

    score > 1 − np.random.pareto(alpha),     alpha = 9

so high-scoring docs are mostly kept but low scorers still get
sampled in (avoids a hard-cliff distribution shift).

This module IS that recipe on the same primitives (pyspark.ml
RegexTokenizer → HashingTF → LogisticRegression), with one
determinism fix: the Pareto draw uses an md5-derived uniform per
document instead of np.random, so the keep decision is reproducible
and reshard-invariant (same posture as `pipeline/sampling.py`). The
inverse-CDF identity: pareto(alpha) = (1−u)^(−1/alpha) − 1 for
u ~ U[0,1).

Scale: training reduces over the (small, curated + sampled-negative)
labeled set; scoring is one model.transform — a codegen-friendly
hashed-features projection + an executor-side blas dot per row batch,
no corpus shuffle. The filter is a pure projection on (score, id).

No reference-engine analog (the reference's concern ends at the
index); cited sources are the published papers and Spark's own public
ML API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import md5h60
from .textstats import TOKEN_RE

_UNIT = float(1 << 60)  # md5h60 < 2^60 -> u in [0, 1)


def train_quality_classifier(positives: DataFrame, negatives: DataFrame,
                             text_col: str = "text",
                             num_features: int = 1 << 18,
                             max_iter: int = 20, reg_param: float = 0.0):
    """Fit the GPT-3 appendix-A pipeline; returns a PipelineModel.

    ``positives`` = curated/high-quality docs, ``negatives`` = raw
    crawl sample. Tokenization uses the engine's TOKEN_RE so the
    features match every other pipeline op's view of a document."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    labeled = (positives.select(F.col(text_col).alias("text"),
                                F.lit(1.0).alias("label"))
               .unionByName(negatives.select(
                   F.col(text_col).alias("text"),
                   F.lit(0.0).alias("label"))))
    pipe = Pipeline(stages=[
        RegexTokenizer(inputCol="text", outputCol="_toks",
                       pattern=TOKEN_RE, gaps=False, toLowercase=True),
        HashingTF(inputCol="_toks", outputCol="_feat",
                  numFeatures=num_features),
        LogisticRegression(featuresCol="_feat", labelCol="label",
                           maxIter=max_iter, regParam=reg_param),
    ])
    return pipe.fit(labeled)


def score_quality(model, docs: DataFrame,
                  text_col: str = "text") -> DataFrame:
    """All input columns + ``quality_score`` = P(label=1 | doc)."""
    from pyspark.ml.functions import vector_to_array
    inp = docs.withColumn("text", F.col(text_col)) \
        if text_col != "text" else docs
    scored = model.transform(inp)
    out = scored.withColumn(
        "quality_score",
        vector_to_array(F.col("probability")).getItem(1))
    return out.drop("_toks", "_feat", "rawPrediction", "probability",
                    "prediction")


def pareto_filter(scored: DataFrame, alpha: float = 9.0,
                  id_col: str = "doc_id",
                  score_col: str = "quality_score") -> DataFrame:
    """GPT-3's keep rule, made deterministic: keep iff
    score > 1 − ((1 − u)^(−1/alpha) − 1) with u = md5h60(id)/2^60.

    score ≥ 1 always keeps; the threshold's Pareto tail re-admits a
    deterministic trickle of low scorers. Pure projection + filter —
    reshard-invariant, no rand(), no shuffle."""
    u = md5h60(F.col(id_col).cast("string")) / F.lit(_UNIT)
    pareto = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return scored.filter(F.col(score_col) > 1.0 - pareto)
