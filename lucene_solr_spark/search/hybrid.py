"""Hybrid retrieval — Reciprocal Rank Fusion of heterogeneous rankings.

RRF (Cormack, Clarke & Büttcher, SIGIR 2009): fuse N ranked lists by
``score(d) = Σ_i w_i / (k + rank_i(d))`` — rank-based, so a BM25 list
and a cosine-ANN list fuse without score calibration. This is the
standard lexical+vector hybrid-search shape (the reference snapshot
predates Lucene's vector search; this is a forward extension in the
same spirit as the SQ8/IVF ANN operators, composing the engine's BM25
`Searcher` with `pipeline.similarity`'s ANN top-k).

Scale posture: the inputs are already-truncated per-query CANDIDATE
LISTS (top-k of each retriever — tens to thousands of rows), not
corpora. The global rank window and the fuse groupBy therefore touch
only candidate rows; the heavy lifting (BM25 kernel, ANN scan) happened
upstream in the retrievers, fully distributed. Fusing B queries in a
batch partitions the window by query id instead — same plan, no global
ordering anywhere.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(rankings: Sequence[DataFrame], k: int = 60,
             weights: Sequence[float] | None = None,
             id_col: str = "doc_id") -> DataFrame:
    """Fuse ranked lists → (id_col, rrf, n_lists), unordered.

    Each input must carry ``id_col`` plus exactly one score column (any
    name); ranks are derived here as ``row_number`` over (score desc,
    id asc) so callers pass raw retriever output. A doc missing from a
    list simply contributes nothing for it (the standard RRF treatment).
    ``k`` damps the head (60 = the paper's constant); ``weights``
    optionally biases lists. Sort by ``rrf`` desc and cut to taste.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError("rrf_fuse: len(weights) != len(rankings)")
    parts = []
    for i, df in enumerate(rankings):
        score = [c for c in df.columns if c != id_col]
        if len(score) != 1:
            raise ValueError(
                f"rrf_fuse: ranking {i} must have exactly ({id_col}, "
                f"<score>) columns, got {df.columns}")
        w = Window.orderBy(F.desc(score[0]), F.asc(id_col))
        wt = float(weights[i]) if weights is not None else 1.0
        parts.append(df.select(
            F.col(id_col),
            (F.lit(wt) / (F.lit(int(k)) + F.row_number().over(w)))
            .alias("_c")))
    both = reduce(lambda a, b: a.unionByName(b), parts)
    return (both.groupBy(id_col)
            .agg(F.sum("_c").alias("rrf"),
                 F.count(F.lit(1)).alias("n_lists")))
