"""Index-backed text classification — the `lucene/classification`
module re-expressed as DataFrame aggregates.

References (semantics only):
- `lucene/classification/src/java/org/apache/lucene/classification/
  SimpleNaiveBayesClassifier.java:48` — multinomial Naive Bayes whose
  training statistics are INDEX statistics: per class c,
  ``score(d, c) = log(df(c)) − log(docsWithClass)
                + Σ_{w ∈ tokens(d)} log((hits(w,c) + 1) / den(c))``
  where ``hits(w,c)`` is the number of class-c docs containing w
  (`getWordFreqForClass`), and the add-1-smoothing denominator is
  ``den(c) = avgUniqueTermsPerDoc × df(c) + docsWithClass``
  (`getTextTermFreqForClass`: sumDocFreq/docCount of the text field,
  scaled by the class df). Scores are normalized to probabilities with
  the log-sum-exp softmax (`normClassificationResults`).
- `classification/KNearestNeighborClassifier.java:60` — MoreLikeThis
  top-k over the input text, then per class among the k hits:
  ``score(c) = Σ_{hits of class c} (score_i / maxScore) / k``
  (count × normBoost / k with normBoost = totalBoost/count collapses to
  totalBoost/k; the ``sumdoc < k`` correction divides by sumdoc
  instead — `buildListFromTopDocs`).

Spark shape (the 100-TB posture):
- NB training is TWO map-side-combined aggregates over the corpus: the
  (term, class → distinct-doc hits) table — the only large artifact,
  kept distributed and served by pushed ``term IN (…)`` predicates —
  and the tiny per-class priors (collected; #classes is small by
  definition of classification).
- Batch classification (`classify_df`) is one explode + one join on
  term + one (input, class) aggregate — no per-row Python anywhere;
  unmatched tokens contribute −log(den) via the input's token COUNT, so
  the join only carries matched (term, class) rows.
- KNN rides the existing kernel top-k (bounded rows to the driver) and
  a broadcast hit-set join for the class labels.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .textstats import TOKEN_RE


def _tokens(text_col):
    return F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)


class NaiveBayesClassifier:
    """SimpleNaiveBayesClassifier over a corpus DataFrame.

    ``docs`` needs an id column, a text column, and a class column
    (rows with NULL class are ignored, matching the reference's
    docsWithClass = docs having a value for the class field).
    Tokenization is the pipeline token regex (the reference tokenizes
    with the index analyzer; stop filtering is the caller's choice via
    ``stopwords``)."""

    def __init__(self, docs: DataFrame, class_col: str = "lang",
                 text_col: str = "text", id_col: str = "doc_id",
                 stopwords=None):
        self.class_col, self.text_col, self.id_col = (class_col, text_col,
                                                      id_col)
        base = docs.filter(F.col(class_col).isNotNull())
        toks = _tokens(F.col(text_col))
        if stopwords:
            sw = sorted(set(stopwords))
            toks = F.filter(toks, lambda t: ~t.isin(sw))
        # per-doc distinct terms once; feeds both avg-unique and hits
        dterm = (base.select(F.col(id_col).alias("_doc"),
                             F.col(class_col).alias("cls"),
                             F.explode(F.array_distinct(toks))
                             .alias("term")))
        # (term, class) → number of class-c docs containing the term
        # (getWordFreqForClass) — the one large training table; stays
        # distributed, probed with pushed term IN (…) predicates
        self.term_class = (dterm.groupBy("term", "cls")
                           .agg(F.count("*").alias("hits")).cache())
        # tiny stats: class priors + the smoothing denominator inputs
        pri = (base.groupBy(F.col(class_col).alias("cls"))
               .agg(F.count("*").alias("df_c")).collect())
        self._df_c = {r["cls"]: int(r["df_c"]) for r in pri}
        self.docs_with_class = sum(self._df_c.values())
        # sumDocFreq / docCount of the text field = Σ per-doc distinct
        # terms / docsWithClass (getTextTermFreqForClass)
        sum_doc_freq = dterm.count()
        self.avg_unique = sum_doc_freq / max(self.docs_with_class, 1)
        self._stop = set(stopwords or ())

    # -- shared math ---------------------------------------------------
    def _den(self, cls: str) -> float:
        return self.avg_unique * self._df_c[cls] + self.docs_with_class

    def _prior(self, cls: str) -> float:
        return (math.log(self._df_c[cls])
                - math.log(self.docs_with_class))

    @staticmethod
    def _softmax(scored: list) -> list:
        """normClassificationResults: exp(x − logΣexp(x)), computed
        against the max for stability — exactly the reference's
        a + log Σ exp(x_n − a) with a = max."""
        smax = max(s for _, s in scored)
        loga = smax + math.log(sum(math.exp(s - smax) for _, s in scored))
        out = [(c, math.exp(s - loga)) for c, s in scored]
        out.sort(key=lambda x: (-x[1], x[0]))
        return out

    # -- single text (driver-side orchestration, pushed-filter probe) --
    def class_scores(self, text: str) -> list:
        """→ [(class, probability)] sorted by probability desc, class
        asc — `getClasses(String)`. One pushed-predicate probe of the
        hits table; everything else is collected tiny stats."""
        import re
        toks = [t for t in re.findall(TOKEN_RE, text or "")
                if t not in self._stop]
        if not toks or not self._df_c:
            return []
        rows = (self.term_class
                .filter(F.col("term").isin(sorted(set(toks))))
                .collect())
        hits = {(r["term"], r["cls"]): int(r["hits"]) for r in rows}
        scored = []
        for cls in self._df_c:
            den = self._den(cls)
            s = self._prior(cls)
            for w in toks:                      # multiplicity counts
                s += math.log((hits.get((w, cls), 0) + 1) / den)
            scored.append((cls, s))
        return self._softmax(scored)

    def assign_class(self, text: str):
        """argmax — `assignClass`."""
        r = self.class_scores(text)
        return r[0] if r else None

    # -- batch (the distributed surface) --------------------------------
    def classify_df(self, inputs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
        """Classify a whole DataFrame of texts in one plan →
        (id, cls, score, is_best). score is the softmax probability.

        Shape: tokens explode → join the hits table on term (matched
        rows only) → (input, class) agg; the unmatched-token mass is
        recovered from the input's total token count, since every token
        contributes −log(den(c)) regardless of hits."""
        spark = inputs.sparkSession
        toks = _tokens(F.col(text_col))
        if self._stop:
            sw = sorted(self._stop)
            toks = F.filter(toks, lambda t: ~t.isin(sw))
        tok = (inputs.select(F.col(id_col).alias("_in"),
                             F.explode(toks).alias("term"))
               .groupBy("_in", "term").agg(F.count("*").alias("cnt")))
        ntok = tok.groupBy("_in").agg(F.sum("cnt").alias("n_tok"))
        matched = (tok.join(self.term_class, "term")
                   .groupBy("_in", "cls")
                   .agg(F.sum(F.col("cnt")
                              * F.log(F.col("hits") + F.lit(1.0)))
                        .alias("m")))
        cls_rows = [(c, self._prior(c), math.log(self._den(c)))
                    for c in sorted(self._df_c)]
        cls_df = spark.createDataFrame(cls_rows,
                                       "cls string, prior double, "
                                       "log_den double")
        raw = (ntok.crossJoin(F.broadcast(cls_df))
               .join(matched, ["_in", "cls"], "left")
               .select("_in", "cls",
                       (F.col("prior")
                        - F.col("n_tok") * F.col("log_den")
                        + F.coalesce(F.col("m"), F.lit(0.0)))
                       .alias("logp")))
        # log-sum-exp softmax per input, all in codegen
        from pyspark.sql import Window
        w = Window.partitionBy("_in")
        smax = F.max("logp").over(w)
        loga = smax + F.log(F.sum(F.exp(F.col("logp") - smax)).over(w))
        out = raw.select(F.col("_in").alias(id_col), "cls",
                         F.exp(F.col("logp") - loga).alias("score"))
        best = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                                  F.asc("cls"))
        return out.withColumn("is_best",
                              F.row_number().over(best) == F.lit(1))


class KNNClassifier:
    """KNearestNeighborClassifier: MLT term selection over the input
    text → kernel BM25 top-k → rank-normalized class votes."""

    def __init__(self, searcher, docs: DataFrame, class_col: str = "lang",
                 k: int = 10, max_terms: int = 5,
                 field: str | None = None):
        from ..search.ast import DEFAULT_FIELD
        self.searcher, self.docs = searcher, docs
        self.class_col, self.k, self.max_terms = class_col, k, max_terms
        self.field = field or DEFAULT_FIELD

    def _mlt_query(self, text: str):
        """MoreLikeThis.like(Reader) over the input text: rank tokens by
        tf × ln(N/df), ties by term asc, keep max_terms, OR them."""
        from ..search.ast import BooleanQuery, Clause, Occur, TermQuery
        tf = self.searcher.index.analyzer.term_freqs(text or "")
        st = self.searcher.term_stats([(self.field, t) for t in tf])
        n = self.searcher.field_stats(self.field)["doc_count"]
        scored = [(t, tf[t] * math.log(n / st[(self.field, t)][0]))
                  for t in tf if (self.field, t) in st]
        scored.sort(key=lambda x: (-x[1], x[0]))
        terms = [t for t, _ in scored[:self.max_terms]]
        if not terms:
            return None
        return BooleanQuery(tuple(Clause(Occur.SHOULD, TermQuery(
            t, self.field)) for t in terms))

    def class_scores(self, text: str, mode: str = "f32") -> list:
        """→ [(class, score, votes)] sorted by score desc, class asc.
        score = Σ_{class hits} (s_i/maxScore) / k (reference
        buildListFromTopDocs; / sumdoc when fewer than k hits)."""
        q = self._mlt_query(text)
        if q is None:
            return []
        top = (self.searcher.score_all(q, mode=mode)
               .orderBy(F.desc("score"), F.asc("doc_id")).limit(self.k)
               .select("doc_id", "score").collect())
        if not top:
            return []
        # maxScore is the best hit's score regardless of label
        # (buildListFromTopDocs reads scoreDocs[0] before the class
        # lookup); only labeled hits vote
        maxs = max(r["score"] for r in top)
        ids = [int(r["doc_id"]) for r in top]
        lbl = {int(r["doc_id"]): r["cls"] for r in
               self.docs.filter(F.col("doc_id").isin(ids))
               .select("doc_id", F.col(self.class_col).alias("cls"))
               .filter(F.col("cls").isNotNull()).collect()}
        hits = [(lbl[int(r["doc_id"])], r["score"]) for r in top
                if int(r["doc_id"]) in lbl]
        if not hits:
            return []
        sumdoc = len(hits)
        denom = self.k if sumdoc >= self.k else sumdoc
        agg: dict = {}
        for c, s in hits:
            cnt, boost = agg.get(c, (0, 0.0))
            agg[c] = (cnt + 1, boost + s / maxs)
        out = [(c, boost / denom, cnt) for c, (cnt, boost) in agg.items()]
        out.sort(key=lambda x: (-x[1], x[0]))
        return out

    def assign_class(self, text: str, mode: str = "f32"):
        r = self.class_scores(text, mode=mode)
        return r[0] if r else None
