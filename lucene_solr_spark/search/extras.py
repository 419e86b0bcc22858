"""DataFrame-level query operators composed over the index tables:
SynonymQuery, searchAfter paging, boosted disjunction, constant-score,
sort-by-docvalue — the reference operators whose natural Spark shape is
a declarative plan over decoded postings rather than a kernel mode.

References (semantics only): `search/SynonymQuery.java:55` (pseudo-term
stats: docFreq = max over terms, one BM25 invocation on the summed
freq), `search/IndexSearcher.java:471-506` (searchAfter),
`search/BoostQuery.java:34`, `search/ConstantScoreQuery.java:32`,
`search/TopFieldCollector.java:42` (Sort/SortField).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.smallfloat import LENGTH_TABLE
from ..index.builder import decode_postings_block

POSTINGS_ROWS_SCHEMA = "term string, doc_id long, freq long, norm int"


def postings_rows(searcher, terms: list[str]) -> DataFrame:
    """Decoded postings for a term set: (term, doc_id, freq, norm).

    A narrow mapInPandas over the term-filtered block scan — the public
    'postings reader' API (PostingsEnum analog), shuffle-free."""
    blocks = (searcher.index.postings.filter(F.col("term").isin(list(terms)))
              .select("term", "block_id", "doc_count",
                      "doc_blob", "freq_blob", "norm_blob"))

    def dec(batches):
        for pdf in batches:
            ts, ds, fs, ns = [], [], [], []
            for row in pdf.itertuples(index=False):
                r = row._asdict()
                d, f, n = decode_postings_block(r)
                ts.extend([r["term"]] * len(d))
                ds.append(d)
                fs.append(f)
                ns.append(n)
            if not ds:
                continue
            yield pd.DataFrame({
                "term": pd.Series(ts, dtype="object"),
                "doc_id": np.concatenate(ds).astype("int64"),
                "freq": np.concatenate(fs).astype("int64"),
                "norm": np.concatenate(ns).astype("int32"),
            })

    return blocks.mapInPandas(dec, schema=POSTINGS_ROWS_SCHEMA)


def _bm25_f64_col(freq_col, norm_col, df_val: int, searcher):
    """Double-precision BM25 column on decoded (freq, norm byte)."""
    st = searcher.stats
    n_docs, avgdl = st["doc_count"], st["sum_ttf"] / float(st["doc_count"])
    idf = math.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5))
    lt = F.array(*[F.lit(int(v)) for v in LENGTH_TABLE])
    dl = F.element_at(lt, norm_col + 1).cast("double")
    f = freq_col.cast("double")
    k1, b = searcher.k1, searcher.b
    return F.lit(idf) * f / (f + F.lit(k1) *
                             (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl)))


def synonym_score_all(searcher, terms: list[str]) -> DataFrame:
    """SynonymQuery: terms scored as ONE pseudo-term — per-doc freq is the
    SUM over the synonyms, docFreq is the MAX over the synonyms, one BM25
    evaluation (float64). → (doc_id, score)."""
    st = searcher.term_stats(list(terms))
    live = [t for t in terms if t in st]
    if not live:
        return searcher.spark.createDataFrame([], "doc_id long, score double")
    df_syn = max(st[t][0] for t in live)
    rows = postings_rows(searcher, live)
    agg = rows.groupBy("doc_id").agg(F.sum("freq").alias("freq"),
                                     F.max("norm").alias("norm"))
    return agg.select(
        "doc_id",
        _bm25_f64_col(F.col("freq"), F.col("norm"), df_syn, searcher)
        .alias("score"))


def search_after(searcher, query, after_score: float, after_doc: int,
                 k: int = 10, mode: str = "f64") -> DataFrame:
    """Next page: hits strictly after (after_score, after_doc) in
    (score desc, doc_id asc) order — IndexSearcher.searchAfter."""
    scored = searcher.score_all(query, mode=mode)
    nxt = scored.filter(
        (F.col("score") < after_score) |
        ((F.col("score") == after_score) & (F.col("doc_id") > after_doc)))
    return nxt.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def boosted_sum_score_all(searcher, boosts: dict[str, float]) -> DataFrame:
    """OR over BoostQuery-wrapped terms: score = Σ boost_t * bm25_t.
    → (doc_id, score)."""
    from .ast import TermQuery
    parts = []
    for t, b in boosts.items():
        s = searcher.score_all(TermQuery(t), mode="f64")
        parts.append(s.select("doc_id",
                              (F.col("score") * F.lit(float(b)))
                              .alias("score")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("doc_id").agg(F.sum("score").alias("score"))


def constant_score(searcher, query, score: float = 1.0) -> DataFrame:
    """ConstantScoreQuery: matching docs, fixed score."""
    return searcher.match_docs(query).distinct().select(
        "doc_id", F.lit(float(score)).alias("score"))


def sort_by_field(searcher, query, docs: DataFrame, field_col: str,
                  ascending: bool = False, k: int = 10) -> DataFrame:
    """TopFieldCollector: hits ordered by a doc-value column (tie: doc_id
    asc) — the Sort/SortField path, a plain Catalyst TakeOrderedAndProject."""
    hits = searcher.match_docs(query).distinct()
    j = hits.join(docs.select("doc_id", field_col), "doc_id")
    order = [F.asc(field_col) if ascending else F.desc(field_col),
             F.asc("doc_id")]
    return j.orderBy(*order).limit(k)
