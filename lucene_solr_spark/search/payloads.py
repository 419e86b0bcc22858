"""PayloadScoreQuery — per-occurrence payload scoring.

Reference semantics (`lucene/queries/.../payloads/PayloadScoreQuery.
java:46` over `PayloadFunction.java` Min/Max/Sum/Average): a span's
score becomes f(payloads of the matching occurrences), optionally
multiplied by the wrapped query's similarity score (includeSpanScore).
The common production shape — and the one implemented here — is the
single-term span (SpanTermQuery wrapper), e.g. ranking by
model-assigned term-importance payloads.

Spark shape: the payload aggregation runs executor-side in a
mapInPandas over the term's (field, term)-filtered blocks (pushed key
predicate, bucket-major layout — same scan the kernel does), with a
vectorized segmented reduce (np.*.reduceat) per doc; the driver sees
only (doc_id, payload_score) rows. includeSpanScore multiplies by the
BM25 score from the normal kernel via a doc_id join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..index.builder import decode_payloads_flat, decode_postings_block
from .ast import DEFAULT_FIELD, TermQuery
from .executor import _key_filter

FUNCS = ("sum", "max", "min", "avg")


def payload_scores(searcher, term: str, field: str = DEFAULT_FIELD,
                   func: str = "sum") -> DataFrame:
    """(doc_id, payload_score) for every doc containing ``term`` —
    payload_score = func over the term's per-occurrence payloads
    (PayloadFunction.docScore)."""
    if func not in FUNCS:
        raise ValueError(f"unknown payload function {func!r}")
    if not getattr(searcher.index, "with_payloads", False):
        raise ValueError(
            "payload_scores requires IndexBuilder(payload=...)")
    blocks = (searcher.index.postings
              .filter(_key_filter([(field, term)]))
              .select("block_id", "doc_count", "doc_blob", "freq_blob",
                      "norm_blob", "pay_blob"))

    def extract(batches):
        import pandas as pd
        for pdf in batches:
            out_d, out_s = [], []
            for i in range(len(pdf)):
                row = {c: pdf[c].iloc[i] for c in pdf.columns}
                docs, freqs, _ = decode_postings_block(row)
                pays = decode_payloads_flat(row["pay_blob"], freqs).astype(
                    np.float64)
                starts = np.zeros(len(freqs), dtype=np.int64)
                np.cumsum(np.asarray(freqs, dtype=np.int64)[:-1],
                          out=starts[1:])
                if func == "sum":
                    s = np.add.reduceat(pays, starts)
                elif func == "max":
                    s = np.maximum.reduceat(pays, starts)
                elif func == "min":
                    s = np.minimum.reduceat(pays, starts)
                else:   # avg
                    s = (np.add.reduceat(pays, starts)
                         / np.asarray(freqs, dtype=np.float64))
                out_d.append(docs)
                out_s.append(s)
            if out_d:
                yield pd.DataFrame({
                    "doc_id": np.concatenate(out_d),
                    "payload_score": np.concatenate(out_s)})

    return blocks.mapInPandas(extract,
                              "doc_id long, payload_score double")


def payload_score_topk(searcher, term: str, k: int = 10,
                       field: str = DEFAULT_FIELD, func: str = "sum",
                       include_span_score: bool = False) -> DataFrame:
    """Top-k by payload score (PayloadScoreQuery.java:46: final score =
    payload score, × span score when includeSpanScore). Ties: doc_id
    asc. → (doc_id, score) as a DataFrame (TakeOrderedAndProject)."""
    ps = payload_scores(searcher, term, field=field, func=func)
    if include_span_score:
        bm = searcher.score_all(TermQuery(term, field), mode="f64")
        ps = (ps.join(bm, "doc_id")
              .select("doc_id",
                      (F.col("payload_score") * F.col("score"))
                      .alias("payload_score")))
    return (ps.select("doc_id", F.col("payload_score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
