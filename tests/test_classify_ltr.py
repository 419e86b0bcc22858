"""lucene/classification (SimpleNaiveBayes, KNN), Solr LTR rescoring,
DrillSideways, and facet.interval — engine vs in-test brute-force
restatements on deterministic corpora."""

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.pipeline.classify import (KNNClassifier,
                                                 NaiveBayesClassifier)
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import PhraseQuery, TermQuery

ANN = StandardAnalyzer(stop_words=frozenset())

ROWS = [
    (0, "spark table merge fast", "en", "src1", 40),
    (1, "spark spark row scan", "en", "src2", 35),
    (2, "tabla rapida fila", "es", "src1", 30),
    (3, "tabla tabla merge", "es", "src2", 28),
    (4, "schnell zeile tisch", "de", "src1", 33),
    (5, "spark merge zeile", "de", "src3", 31),
    (6, "table scan fast fast", "en", "src3", 44),
]


def _docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def _brute_nb(text, stop=()):
    """Independent restatement of SimpleNaiveBayesClassifier math."""
    toks = [t for t in re.findall("[a-z0-9]+", text) if t not in stop]
    corpus = [(r[2], [t for t in re.findall("[a-z0-9]+", r[1])
                      if t not in stop]) for r in ROWS]
    nwc = len(corpus)
    classes = sorted({c for c, _ in corpus})
    dfc = {c: sum(1 for cc, _ in corpus if cc == c) for c in classes}
    avg_unique = sum(len(set(ts)) for _, ts in corpus) / nwc
    scored = []
    for c in classes:
        den = avg_unique * dfc[c] + nwc
        s = math.log(dfc[c]) - math.log(nwc)
        for w in toks:
            hits = sum(1 for cc, ts in corpus if cc == c and w in set(ts))
            s += math.log((hits + 1) / den)
        scored.append((c, s))
    smax = max(s for _, s in scored)
    loga = smax + math.log(sum(math.exp(s - smax) for _, s in scored))
    out = [(c, math.exp(s - loga)) for c, s in scored]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_nb_single_matches_brute(spark):
    nb = NaiveBayesClassifier(_docs(spark), class_col="lang")
    for text in ["spark table fast", "tabla merge", "zeile tisch",
                 "unknownword spark", "spark spark spark"]:
        got = nb.class_scores(text)
        exp = _brute_nb(text)
        assert [c for c, _ in got] == [c for c, _ in exp], text
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in exp], rtol=1e-12)
    # probabilities sum to 1
    assert abs(sum(s for _, s in nb.class_scores("spark")) - 1) < 1e-9


def test_nb_batch_matches_single(spark):
    nb = NaiveBayesClassifier(_docs(spark), class_col="lang")
    inputs = spark.createDataFrame(
        [(100, "spark table fast"), (101, "tabla merge"),
         (102, "zeile zeile tisch")], "doc_id long, text string")
    got = nb.classify_df(inputs).toPandas()
    for _, grp in got.groupby("doc_id"):
        text = {100: "spark table fast", 101: "tabla merge",
                102: "zeile zeile tisch"}[grp["doc_id"].iloc[0]]
        exp = dict(_brute_nb(text))
        for _, r in grp.iterrows():
            assert abs(r["score"] - exp[r["cls"]]) < 1e-9, text
        best = grp.sort_values(["score", "cls"],
                               ascending=[False, True]).iloc[0]
        assert bool(best["is_best"])


def test_nb_stopwords_param(spark):
    nb = NaiveBayesClassifier(_docs(spark), class_col="lang",
                              stopwords={"spark"})
    got = nb.class_scores("spark tabla")
    exp = _brute_nb("spark tabla", stop={"spark"})
    assert [c for c, _ in got] == [c for c, _ in exp]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in exp],
                               rtol=1e-12)


def _index(spark):
    docs = _docs(spark)
    idx = IndexBuilder(ANN, grid=4, with_positions=True).build(spark, docs)
    idx.postings = idx.postings.cache()
    return docs, Searcher(spark, idx)


def test_knn_classifier(spark):
    docs, s = _index(spark)
    knn = KNNClassifier(s, docs, class_col="lang", k=3, max_terms=3)
    got = knn.class_scores("spark merge table", mode="f64")
    # brute: same MLT query through the searcher's own top-k
    q = knn._mlt_query("spark merge table")
    top = (s.score_all(q, mode="f64")
           .orderBy(F.desc("score"), F.asc("doc_id")).limit(3).collect())
    maxs = max(r["score"] for r in top)
    lang = {r[0]: r[2] for r in ROWS}
    agg = {}
    for r in top:
        c = lang[int(r["doc_id"])]
        agg[c] = agg.get(c, 0.0) + r["score"] / maxs
    exp = sorted(((c, b / 3) for c, b in agg.items()),
                 key=lambda x: (-x[1], x[0]))
    assert [(c, round(v, 10)) for c, v, _ in got] == \
        [(c, round(v, 10)) for c, v in exp]
    assert sum(v for _, _, v in got) == 3  # all k hits voted


def test_ltr_rescore_linear(spark):
    from lucene_solr_spark.search.ltr import (LinearModel,
                                              extract_features,
                                              field_value_feature,
                                              ltr_rescore,
                                              original_score_feature,
                                              solr_feature, value_feature)
    docs, s = _index(spark)
    first = s.score_all(TermQuery("spark"), mode="f64")
    feats = [original_score_feature("orig"),
             field_value_feature("nlen", "n_chars"),
             solr_feature("ph", PhraseQuery(("spark", "merge"))),
             value_feature("bias", 1.0)]
    model = LinearModel((("orig", 2.0), ("nlen", 0.01), ("ph", 3.0),
                         ("bias", 0.5)))
    got = ltr_rescore(s, docs, first, feats, model, rerank_docs=5)
    gp = got.toPandas()
    # brute: recompute per candidate
    fm = extract_features(s, docs, first.orderBy(
        F.desc("score"), F.asc("doc_id")).limit(5), feats).toPandas()
    exp = (2.0 * fm["orig"] + 0.01 * fm["nlen"] + 3.0 * fm["ph"] + 0.5)
    fm["exp"] = exp
    fm = fm.sort_values(["exp", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    assert gp["doc_id"].tolist() == fm["doc_id"].tolist()
    np.testing.assert_allclose(gp["score"], fm["exp"], rtol=1e-12)
    # phrase feature defaulted to 0 where the phrase doesn't match
    no_ph = fm[fm["ph"] == 0.0]
    assert len(no_ph) >= 1


def test_drill_sideways_counts(spark):
    from lucene_solr_spark.search.facets import drill_sideways
    docs = _docs(spark)
    hits, sideways = drill_sideways(
        docs, None, {"lang": ["en"], "source": ["src1", "src2"]})
    assert sorted(r["doc_id"] for r in hits.select("doc_id").collect()) \
        == [0, 1]
    lang = {(r["value"]): r["count"]
            for r in sideways["lang"].collect()}
    # lang counts under source∈{src1,src2} only: en:2 es:2 de:1
    assert lang == {"en": 2, "es": 2, "de": 1}
    src = {(r["value"]): r["count"] for r in sideways["source"].collect()}
    # source counts under lang=en only: src1:1 src2:1 src3:1
    assert src == {"src1": 1, "src2": 1, "src3": 1}


def test_interval_facets_overlap_inclusivity(spark):
    from lucene_solr_spark.search.facets import interval_facets
    docs = _docs(spark)
    res = interval_facets(
        docs, None, "n_chars",
        [("a", 28, 33, True, False),    # [28,33): 28,30,31 → 3
         ("b", 30, 35, True, True),     # [30,35]: 30,31,33,35 → 4
         ("c", 40, 44, False, False),   # (40,44): none → 0
         ("d", 40, 44, True, True)])    # [40,44]: 40,44 → 2
    got = {r["key"]: r["count"] for r in res.collect()}
    assert got == {"a": 3, "b": 4, "c": 0, "d": 2}
    # requested order preserved
    assert [r["key"] for r in res.collect()] == ["a", "b", "c", "d"]


def test_feature_score_functions(spark):
    """FeatureField log/saturation/sigmoid formulas vs hand computation
    (FeatureField.java:252,323,382), additive combine."""
    import math

    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
    from lucene_solr_spark.index.builder import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.ast import TermQuery
    from lucene_solr_spark.search.function import feature_score
    ann = StandardAnalyzer(stop_words=frozenset())
    docs = spark.createDataFrame(
        [(0, "aa bb", 4.0), (1, "aa cc", 16.0), (2, "dd", 100.0)],
        "doc_id long, text string, pagerank double")
    idx = IndexBuilder(ann, grid=4).build(spark, docs)
    idx.postings = idx.postings.cache()
    s = Searcher(spark, idx)
    base = {r["doc_id"]: r["score"] for r in
            s.score_all(TermQuery("aa"), mode="f64").collect()}
    got = {r["doc_id"]: r["score"] for r in feature_score(
        s, TermQuery("aa"), docs, "pagerank",
        function="saturation", weight=2.0, pivot=4.0).collect()}
    assert got[0] == pytest.approx(base[0] + 2.0 * (1 - 4.0 / 8.0))
    assert got[1] == pytest.approx(base[1] + 2.0 * (1 - 4.0 / 20.0))
    assert 2 not in got                       # must match the query
    got = {r["doc_id"]: r["score"] for r in feature_score(
        s, TermQuery("aa"), docs, "pagerank",
        function="log", weight=0.5, scaling=1.0).collect()}
    assert got[1] == pytest.approx(base[1] + 0.5 * math.log(17.0))
    got = {r["doc_id"]: r["score"] for r in feature_score(
        s, TermQuery("aa"), docs, "pagerank",
        function="sigmoid", weight=1.0, pivot=4.0, a=2.0).collect()}
    assert got[1] == pytest.approx(
        base[1] + (1 - 16.0 / (16.0 ** 2 + 16.0)))
    with pytest.raises(ValueError, match="log|saturation|sigmoid"):
        feature_score(s, TermQuery("aa"), docs, "pagerank",
                      function="nope")
