"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The published recipe (arXiv:2302.03169, §3): fit two bag-of-hashed-
n-grams unigram models — one on a small TARGET corpus (the
distribution you want more of), one on the RAW pool — and weight every
raw document by its importance log-ratio
``Σ_tokens [ log p_target(bucket(tok)) − log p_raw(bucket(tok)) ]``;
resampling raw docs by these weights shifts the pool toward the
target. Hashing to a fixed bucket count makes the model size constant
regardless of vocabulary (the paper uses 10k buckets over uni+bigrams;
bucket count and gram order are parameters here).

Spark shape — two tiny aggregations and one broadcast join, nothing
else:

1. tokenize → bucket (md5-derived hash, JVM codegen; identical bits in
   the DuckDB oracle via ``hashing.md5h60_sql``) — a pure projection.
2. per-bucket counts for target and raw: two map-side-combined
   aggregations whose outputs are ≤ ``buckets`` rows each.
3. add-1 smoothed log-ratio table (``buckets`` rows) — broadcast.
4. per-doc weight: explode tokens → broadcast-join the ratio table →
   one map-side-combined sum per doc_id. The corpus shuffles once, on
   doc_id, carrying one double per token — and at 100 TB the explode
   can be replaced by a per-row ``aggregate()`` over the token array
   against a scalar map, removing even that shuffle; the explode form
   is kept because it is the one the SQL oracle can restate exactly.

Determinism: md5 bucketing and integer counts make the weights
bit-stable under any partitioning (no rand(), no accumulation across
partitions except the final per-doc sum of doubles, which the gate
rounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import md5h60
from .textstats import TOKEN_RE

__all__ = ["dsir_logratios", "dsir_select", "dsir_weights"]


def _buckets(docs: DataFrame, text_col: str, buckets: int) -> DataFrame:
    tok = docs.select(
        "*", F.explode(F.regexp_extract_all(F.col(text_col),
                                            F.lit(TOKEN_RE), 0)).alias("_t"))
    return tok.withColumn("_b", md5h60(F.col("_t")) % buckets).drop("_t")


def dsir_logratios(docs: DataFrame, target: Column, buckets: int = 64,
                   text_col: str = "text") -> DataFrame:
    """(bucket, logratio) — add-1 smoothed importance log-ratio table.

    ``target`` is a boolean Column over ``docs`` rows selecting the
    target corpus; the raw model uses every row. Buckets the target
    never hits still get a (negative) ratio from smoothing; buckets no
    corpus token ever hits are irrelevant by construction (no token
    maps there when scoring the same corpus).
    """
    bk = _buckets(docs, text_col, buckets).select("_b", target.alias("_is_t"))
    counts = (bk.groupBy("_b")
              .agg(F.count(F.lit(1)).alias("_cr"),
                   F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_ct")))
    # totals via a window over the ≤`buckets`-row counts table — NOT
    # counts.agg(...) + crossJoin, which would re-derive counts from a
    # SECOND full corpus scan (Catalyst does not dedupe the shared
    # subplan); training is one corpus pass, the window sorts 64 rows
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    return counts.select(
        F.col("_b").alias("bucket"),
        (F.log((F.col("_ct") + 1) / (F.sum("_ct").over(tot) + buckets))
         - F.log((F.col("_cr") + 1) / (F.sum("_cr").over(tot) + buckets))
         ).alias("logratio"))


def dsir_weights(docs: DataFrame, target: Column, buckets: int = 64,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, weight) for every doc — weight = Σ logratio
    over the doc's hashed tokens (0.0 for a token-free doc). Rank or
    Gumbel-top-k sample on ``weight`` to build the selected subset."""
    lr = dsir_logratios(docs, target, buckets, text_col)
    bk = _buckets(docs, text_col, buckets).select(id_col, "_b")
    pd_w = (bk.join(F.broadcast(lr), bk["_b"] == lr["bucket"])
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("logratio").alias("weight")))
    return (docs.select(id_col).join(pd_w, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("weight", F.lit(0.0)).alias("weight")))


_TWO60 = float(1 << 60)


def dsir_select(weights: DataFrame, n: int, temperature: float = 1.0,
                id_col: str = "doc_id",
                weight_col: str = "weight") -> DataFrame:
    """Gumbel-top-k resampling — the paper's step 3 (§3: "sample k
    examples without replacement" ∝ exp(weight); Gumbel-top-k is the
    standard exact construction): key = weight/temperature + G_i, take
    the n largest keys. G_i = −ln(−ln(u_i)) with u_i ∈ (0,1) derived
    DETERMINISTICALLY from md5(id) — no rand(), so the selection is
    reproducible under any partitioning/resharding and restatable by
    the SQL oracle bit-for-bit.

    Returns (id_col, weight, gkey) for the n selected docs. At 100 TB
    this is one TakeOrderedAndProject over the weights table (per-
    partition top-n, then a driver merge of n·P candidates — no global
    sort, no shuffle of the corpus).
    """
    u = (md5h60(F.col(id_col).cast("string")) + F.lit(0.5)) / F.lit(_TWO60)
    key = (F.col(weight_col) / F.lit(float(temperature))
           - F.log(-F.log(u))).alias("gkey")
    return (weights.select(F.col(id_col), F.col(weight_col), key)
            .orderBy(F.desc("gkey"), F.asc(id_col)).limit(int(n)))
