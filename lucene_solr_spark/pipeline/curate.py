"""End-to-end curation manifest — quality ∧ dedup ∧ decontamination.

The composition every web-corpus training pipeline actually runs
(Gopher → dedup → decontaminate is the published order in Rae 2021
§A1/A2/A3, kept by RefinedWeb/Dolma/FineWeb): instead of three
separate jobs re-reading the corpus, :func:`curate_manifest` emits ONE
per-doc keep manifest with the losing stage named, built from the
already-gated component operators so every rule keeps its own oracle.

Plan shape (the 100-TB posture):

* stage inputs — Gopher rule signals, the md5 content fingerprint, and
  the doc's n-gram set — all come out of ONE codegen projection fused
  with the scan (`textstats.gopher_rules` and the fingerprint are
  plain Columns over the same pass);
* exact dedup is one map-side-combined agg on the 16-byte fingerprint
  KEYED AMONG QUALITY SURVIVORS ONLY (losers can't be canonical — the
  published pipelines dedup after filtering for exactly this reason),
  then an equi-join back;
* decontamination is the gram explode ⋈ BROADCAST benchmark set from
  `scrub.decontaminate` — the corpus never shuffles for it;
* final keep = quality ∧ ¬duplicate ∧ ¬contaminated, reason = the
  FIRST failing stage in pipeline order (quality → duplicate →
  contaminated), '' when kept.

So the whole manifest costs one corpus pass + one fingerprint-width
shuffle + one broadcast join — strictly less than running the three
components as separate jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .scrub import benchmark_grams, decontaminate
from .textstats import gopher_rules


def curate_manifest(docs: DataFrame, bench_docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_words: int = 20, gram_n: int = 8,
                    hashed: bool = True) -> DataFrame:
    """→ (doc_id, quality, duplicate, contaminated, keep, reason).

    ``bench_docs`` — the benchmark/eval documents whose ``gram_n``-gram
    set must not leak into training (GPT-3 appendix C).  ``duplicate``
    marks every quality-surviving doc that is NOT the canonical
    (min-id) member of its exact-content class; quality losers carry
    duplicate=0 (they never reach the dedup stage, same as the
    published pipelines).
    """
    quality = (gopher_rules(docs, id_col=id_col, text_col=text_col,
                            min_words=min_words)
               .select(F.col("doc_id"), F.col("keep").alias("quality")))
    fp = docs.select(F.col(id_col).alias("doc_id"),
                     F.md5(F.col(text_col)).alias("_fp"))
    staged = quality.join(fp, "doc_id")
    canon = (staged.filter(F.col("quality"))
             .groupBy("_fp").agg(F.min("doc_id").alias("_canon")))
    dup = (staged.join(canon, "_fp", "left")
           .select("doc_id", "quality",
                   (F.col("quality") & (F.col("doc_id") != F.col("_canon")))
                   .alias("duplicate")))
    bench = benchmark_grams(bench_docs, n=gram_n, hashed=hashed)
    cont = (decontaminate(docs, bench, n=gram_n, hashed=hashed)
            .select(F.col("doc_id"), F.col("contaminated")))
    out = dup.join(cont, "doc_id")
    keep = (F.col("quality") & ~F.col("duplicate") & ~F.col("contaminated"))
    reason = (F.when(~F.col("quality"), F.lit("quality"))
              .when(F.col("duplicate"), F.lit("duplicate"))
              .when(F.col("contaminated"), F.lit("contaminated"))
              .otherwise(F.lit("")))
    return out.select("doc_id",
                      F.col("quality").cast("int").alias("quality"),
                      F.col("duplicate").cast("int").alias("duplicate"),
                      F.col("contaminated").cast("int").alias("contaminated"),
                      keep.cast("int").alias("keep"),
                      reason.alias("reason"))
