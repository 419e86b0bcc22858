"""CheckIndex analog — a distributed integrity audit of a built index.

Reference (semantics only): `lucene/core/src/java/org/apache/lucene/
index/CheckIndex.java:450-900` (`checkIndex()` → per-segment
`testPostings`/`testTerms`/`testNorms`): decode EVERY postings block,
verify the docs are strictly increasing and agree with the block
header, re-derive each term's docFreq / totalTermFreq from the decoded
postings and compare against the term dictionary, and cross-check the
per-document norms against the postings totals. Lucene runs this
single-threaded per segment; here every block is decoded WHERE IT
LIVES (one `mapInPandas` pass over the postings table — the audit
reads every byte, which is the point, but only tiny per-block counter
rows ever move), the per-term roll-up is one map-side-combined
aggregation joined against the dictionary, and the verdict is a
handful of scalars.

The emitted report doubles as an END-TO-END gate: the corpus-level
totals (doc_count / distinct_terms / sum_df / sum_ttf) are recomputed
by the SQL oracle from the RAW documents through the same analysis
chain, so a green row proves index == corpus, while the *_delta /
bad_blocks rows prove the index is internally consistent (they are
identically zero on a healthy index and the oracle pins them to 0).

100-TB posture: postings never leave their partitions; the shuffle
moves one (term, df, ttf) row per distinct term (the dictionary is
already materialized, so this doubles its size transiently) and the
final aggregates are single scalars. Positions/offsets/payload blobs
are length-audited only when the channel exists.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..search.ast import DEFAULT_FIELD
from .builder import InvertedIndex, decode_postings_block

_BLOCK_SCHEMA = ("term string, n_docs long, sum_freq long, sum_norm long, "
                 "bad long")


def _audit_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode every block in place; emit per-block counters.

    ``bad`` counts violated invariants for the block (0 = healthy):
    decoded doc count == header doc_count, decoded last doc == header
    last_doc, doc ids strictly increasing, norm bytes == doc_count.
    """
    for pdf in batches:
        terms, n_docs, sum_f, sum_n, bad = [], [], [], [], []
        for row in pdf.itertuples(index=False):
            r = row._asdict()
            errs = 0
            try:
                docs, freqs, norms = decode_postings_block(r)
            except Exception:
                terms.append(r["term"]); n_docs.append(0)
                sum_f.append(0); sum_n.append(0); bad.append(1)
                continue
            if len(docs) != int(r["doc_count"]):
                errs += 1
            if len(docs) and int(docs[-1]) != int(r["last_doc"]):
                errs += 1
            if len(docs) > 1 and not bool(np.all(np.diff(docs) > 0)):
                errs += 1
            if len(norms) != len(docs):
                errs += 1
            terms.append(r["term"])
            n_docs.append(int(len(docs)))
            sum_f.append(int(freqs.sum()) if len(freqs) else 0)
            sum_n.append(int(norms.sum()) if len(norms) else 0)
            bad.append(errs)
        yield pd.DataFrame({"term": pd.Series(terms, dtype="object"),
                            "n_docs": pd.Series(n_docs, dtype="int64"),
                            "sum_freq": pd.Series(sum_f, dtype="int64"),
                            "sum_norm": pd.Series(sum_n, dtype="int64"),
                            "bad": pd.Series(bad, dtype="int64")})


def check_index(index: InvertedIndex,
                field: str = DEFAULT_FIELD) -> DataFrame:
    """Audit one field of the index → (check_name, value) rows.

    Corpus-comparable totals (gate these against an independent
    recomputation from the raw documents):
      doc_count, distinct_terms, sum_df, sum_ttf
    Internal-consistency counters (identically 0 on a healthy index):
      bad_blocks           — blocks whose decode violates an invariant
      term_df_mismatches   — terms whose decoded df != dictionary df
      term_ttf_mismatches  — terms whose decoded ttf != dictionary ttf
      norms_ttf_delta      — |Σ norms.dl − Σ dictionary ttf|
      stats_delta          — |stats doc_count − norms rows| +
                             |stats sum_ttf − Σ norms.dl|
    """
    spark = index.postings.sparkSession
    blocks = index.postings.filter(F.col("field") == field)
    per_block = blocks.mapInPandas(_audit_blocks, schema=_BLOCK_SCHEMA)
    per_term = (per_block.groupBy("term")
                .agg(F.sum("n_docs").alias("df_dec"),
                     F.sum("sum_freq").alias("ttf_dec"),
                     F.sum("bad").alias("bad")))
    dict_terms = (index.terms.filter(F.col("field") == field)
                  .select("term", "df", "ttf"))
    # full-outer: a postings term missing from the dictionary (or the
    # reverse) must surface as a mismatch, not vanish in an inner join
    joined = (dict_terms.join(per_term, "term", "full_outer")
              .agg(F.sum(F.when(F.col("df").isNotNull(), 1)
                         .otherwise(0)).alias("n_terms"),
                   F.sum("df").alias("sum_df"),
                   F.sum("ttf").alias("sum_ttf"),
                   F.sum("bad").alias("bad_blocks"),
                   F.sum(F.when(F.coalesce(F.col("df"), F.lit(-1))
                                != F.coalesce(F.col("df_dec"), F.lit(-2)),
                                1).otherwise(0)).alias("df_mism"),
                   F.sum(F.when(F.coalesce(F.col("ttf"), F.lit(-1))
                                != F.coalesce(F.col("ttf_dec"), F.lit(-2)),
                                1).otherwise(0)).alias("ttf_mism"))
              .collect()[0])
    nrow = (index.norms.filter(F.col("field") == field)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("dl").alias("sum_dl")).collect()[0])
    fs = index.field_stats(field)
    checks = [
        ("doc_count", int(nrow["n"])),
        ("distinct_terms", int(joined["n_terms"])),
        ("sum_df", int(joined["sum_df"])),
        ("sum_ttf", int(joined["sum_ttf"])),
        ("bad_blocks", int(joined["bad_blocks"])),
        ("term_df_mismatches", int(joined["df_mism"])),
        ("term_ttf_mismatches", int(joined["ttf_mism"])),
        ("norms_ttf_delta",
         abs(int(nrow["sum_dl"]) - int(joined["sum_ttf"]))),
        ("stats_delta",
         abs(int(fs["doc_count"]) - int(nrow["n"]))
         + abs(int(fs["sum_ttf"]) - int(nrow["sum_dl"]))),
    ]
    return spark.createDataFrame(checks, "check_name string, value long")
