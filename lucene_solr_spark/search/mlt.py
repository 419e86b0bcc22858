"""MoreLikeThis — "find documents similar to this one".

Reference semantics (`lucene/queries/src/java/org/apache/lucene/
queries/mlt/MoreLikeThis.java`, surfaced as Solr's MLT handler /
`mlt=true` search component):

- Term selection (`createQueue`, MoreLikeThis.java:651-702): for every
  term of the source document, keep it when ``tf >= minTermFreq`` and
  ``minDocFreq <= df <= maxDocFreq``; rank by ``tf × idf`` where idf is
  ClassicSimilarity's ``ln((docCount + 1) / (df + 1)) + 1``
  (`similarities/ClassicSimilarity.java:61-63`); keep the top
  ``maxQueryTerms`` (defaults: minTermFreq 2, minDocFreq 5,
  maxQueryTerms 25 — MoreLikeThis.java:158,166,228).
- Query construction (`createQuery`, :620-641): OR (SHOULD) of the
  selected terms; with ``boost`` each TermQuery is boosted by
  ``boostFactor × score / bestScore``.
- The query then runs through the NORMAL searcher (whatever similarity
  the index serves — BM25 here, as in stock Solr), excluding the source
  document (Solr's MLT handler drops the seed from the hit list).

Divergence (documented): the reference's queue breaks score ties in
HashMap iteration order — unspecified; we pin ties to term-ascending so
results are deterministic and SQL-restatable.

Spark shape / 100-TB posture: term selection touches ONE document
(pushed ``doc_id =`` filter on the row store — one row to the driver,
same placement as the reference: MLT reads one term vector on one
node) plus one pushed ``(field, term) IN`` dictionary lookup for the
df's (`Searcher.term_stats` — bounded by the doc's distinct terms).
The expensive part — scoring the OR query corpus-wide — is the
existing distributed kernel top-k; nothing else leaves the executors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .ast import (DEFAULT_FIELD, BooleanQuery, BoostQuery, Clause, Occur,
                  TermQuery)

DEFAULT_MIN_TERM_FREQ = 2   # MoreLikeThis.java:158
DEFAULT_MIN_DOC_FREQ = 5    # MoreLikeThis.java:166
DEFAULT_MAX_QUERY_TERMS = 25  # MoreLikeThis.java:228


def interesting_terms(searcher, text: str, field: str = DEFAULT_FIELD,
                      min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
                      min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
                      max_doc_freq: int | None = None,
                      max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
                      min_word_len: int = 0, max_word_len: int = 0,
                      stop_words=None) -> list[tuple[str, float]]:
    """`MoreLikeThis.retrieveInterestingTerms` — [(term, tf·idf score)]
    sorted by score desc, term asc, filtered and capped per the
    reference's createQueue (MoreLikeThis.java:651-702). Word filters
    per `isNoiseWord` (:742-759): drop terms shorter than
    ``min_word_len`` / longer than ``max_word_len`` (0 = off, the
    reference defaults :180,196) or in the caller's ``stop_words`` set
    (setStopWords — DISTINCT from the analyzer's own stop set)."""
    tf = searcher.index.analyzer.term_freqs(text or "")
    stop = stop_words or ()
    cand = {t: f for t, f in tf.items()
            if (min_term_freq <= 0 or f >= min_term_freq)
            and (min_word_len <= 0 or len(t) >= min_word_len)
            and (max_word_len <= 0 or len(t) <= max_word_len)
            and t not in stop}
    st = searcher.term_stats([(field, t) for t in cand])
    n = searcher.field_stats(field)["doc_count"]
    scored = []
    for t, f in cand.items():
        df = st.get((field, t), (0, 0))[0]
        if df == 0 or (min_doc_freq > 0 and df < min_doc_freq):
            continue
        if max_doc_freq is not None and df > max_doc_freq:
            continue
        idf = math.log((n + 1) / (df + 1)) + 1.0
        scored.append((t, f * idf))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:max_query_terms]


def mlt_query(searcher, text: str, field: str = DEFAULT_FIELD,
              boost: bool = False, boost_factor: float = 1.0, **sel):
    """`MoreLikeThis.like(Reader)` → the boolean query (createQuery,
    MoreLikeThis.java:620-641), or None when no term survives."""
    sel_terms = interesting_terms(searcher, text, field, **sel)
    if not sel_terms:
        return None
    best = sel_terms[0][1]
    clauses = []
    for t, s in sel_terms:
        q = TermQuery(t, field)
        if boost:
            q = BoostQuery(q, boost_factor * s / best)
        clauses.append(Clause(Occur.SHOULD, q))
    return BooleanQuery(tuple(clauses))


def more_like_this(searcher, docs: DataFrame, doc_id: int,
                   field: str = DEFAULT_FIELD, k: int = 10, *,
                   boost: bool = False, boost_factor: float = 1.0,
                   id_col: str = "doc_id", text_col: str = "text",
                   mode: str = "f32", **sel) -> DataFrame:
    """Solr MLT handler shape: seed = an indexed document; → top-k
    (doc_id, score) of similar documents, seed excluded.

    ``docs`` is the row store (the source Parquet table); the seed
    fetch is a pushed ``doc_id =`` point filter — one row crosses to
    the driver, everything else stays distributed."""
    row = (docs.filter(F.col(id_col) == doc_id)
           .select(text_col).limit(1).collect())
    if not row:
        raise ValueError(f"doc_id {doc_id} not in the document store")
    q = mlt_query(searcher, row[0][0], field, boost, boost_factor, **sel)
    if q is None:
        return (searcher.spark.range(0)
                .select(F.col("id").alias("doc_id"),
                        F.lit(0.0).alias("score")))
    raw = searcher.score_all(q, mode=mode)
    return (raw.filter(F.col("doc_id") != doc_id)
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .select("doc_id", "score"))
