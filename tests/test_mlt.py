"""MoreLikeThis (queries/mlt/MoreLikeThis.java) — term selection
differential vs a pure-python recompute, seed exclusion, boost path."""

from __future__ import annotations

import math
import re

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import BooleanQuery, BoostQuery
from lucene_solr_spark.search.mlt import (interesting_terms, mlt_query,
                                          more_like_this)
from tests.conftest import SF_DIR

STOP = ENGLISH_ANALYZER.stop_words


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").cache())


@pytest.fixture(scope="module")
def searcher(spark, docs):
    idx = IndexBuilder(ENGLISH_ANALYZER, grid=128).build(spark, docs).cache()
    yield Searcher(spark, idx)
    idx.release()


def _py_interesting(rows, seed_text, min_tf, min_df, max_qt):
    """Reference createQueue (MoreLikeThis.java:651-702) restated:
    tf over the seed's analyzed tokens, df over the corpus, ClassicSim
    idf, ties term-asc."""
    def toks(t):
        return [w for w in re.findall("[a-z0-9]+", (t or "").lower())
                if w not in STOP]
    tf = {}
    for w in toks(seed_text):
        tf[w] = tf.get(w, 0) + 1
    n = sum(1 for _, t in rows if toks(t))
    df = {}
    for _, t in rows:
        for w in set(toks(t)):
            df[w] = df.get(w, 0) + 1
    scored = [(w, f * (math.log((n + 1) / (df[w] + 1)) + 1.0))
              for w, f in tf.items()
              if f >= min_tf and df.get(w, 0) >= min_df]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:max_qt]


def test_interesting_terms_vs_python_oracle(docs, searcher):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    seed = dict(rows)[3]
    got = interesting_terms(searcher, seed, min_term_freq=1,
                            min_doc_freq=2, max_query_terms=10)
    exp = _py_interesting(rows, seed, 1, 2, 10)
    assert [t for t, _ in got] == [t for t, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert a == pytest.approx(b)
    assert got  # non-degenerate


def test_mlt_filters_and_cap(docs, searcher):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    seed = dict(rows)[3]
    loose = interesting_terms(searcher, seed, min_term_freq=1,
                              min_doc_freq=1, max_query_terms=1000)
    dfs = {t: searcher.term_stats([("text", t)])[("text", t)][0]
           for t, _ in loose}
    # min_doc_freq above the smallest df drops exactly the sub-cut terms
    cut = min(dfs.values()) + 1
    tight = interesting_terms(searcher, seed, min_term_freq=1,
                              min_doc_freq=cut, max_query_terms=1000)
    assert {t for t, _ in tight} == {t for t in dfs if dfs[t] >= cut}
    assert len(tight) < len(loose)
    capped = interesting_terms(searcher, seed, min_term_freq=1,
                               min_doc_freq=1, max_query_terms=3)
    assert capped == loose[:3]
    # max_doc_freq drops the head terms the min_df path keeps
    head_cut = max(dfs.values()) - 1
    nohead = interesting_terms(searcher, seed, min_term_freq=1,
                               min_doc_freq=1, max_doc_freq=head_cut,
                               max_query_terms=1000)
    assert {t for t, _ in nohead} == {t for t in dfs if dfs[t] <= head_cut}
    assert len(nohead) < len(loose)


def test_more_like_this_excludes_seed_and_scores(docs, searcher):
    got = more_like_this(searcher, docs, 3, k=10, mode="f64",
                         min_term_freq=1, min_doc_freq=2,
                         max_query_terms=10).collect()
    assert got and all(r["doc_id"] != 3 for r in got)
    # equals scoring the selected terms through the normal kernel
    seed = docs.filter("doc_id = 3").collect()[0]["text"]
    q = mlt_query(searcher, seed, min_term_freq=1, min_doc_freq=2,
                  max_query_terms=10)
    assert isinstance(q, BooleanQuery) and not any(
        isinstance(c.query, BoostQuery) for c in q.clauses)
    exp = (searcher.score_all(q, mode="f64")
           .filter("doc_id != 3")
           .orderBy("score", ascending=False).limit(10).collect())
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in
                                          sorted(exp, key=lambda r:
                                                 (-r["score"], r["doc_id"]))]


def test_mlt_boost_path(docs, searcher):
    seed = docs.filter("doc_id = 3").collect()[0]["text"]
    q = mlt_query(searcher, seed, boost=True, boost_factor=2.0,
                  min_term_freq=1, min_doc_freq=2, max_query_terms=5)
    boosts = [c.query.boost for c in q.clauses]
    sel = interesting_terms(searcher, seed, min_term_freq=1,
                            min_doc_freq=2, max_query_terms=5)
    best = sel[0][1]
    assert boosts == pytest.approx([2.0 * s / best for _, s in sel])
    assert boosts[0] == pytest.approx(2.0)
    # boosted query still executes end-to-end
    got = more_like_this(searcher, docs, 3, k=5, boost=True,
                         min_term_freq=1, min_doc_freq=2,
                         max_query_terms=5).collect()
    assert got and all(r["doc_id"] != 3 for r in got)


def test_mlt_noise_word_filters(docs, searcher):
    """isNoiseWord (MoreLikeThis.java:742-759): min/max word length and
    the caller's stop set prune candidates before scoring."""
    seed = {r["doc_id"]: r["text"] for r in docs.collect()}[3]
    base = interesting_terms(searcher, seed, min_term_freq=1,
                             min_doc_freq=1, max_query_terms=1000)
    lens = {len(t) for t, _ in base}
    cut = sorted(lens)[0]
    longer = interesting_terms(searcher, seed, min_term_freq=1,
                               min_doc_freq=1, max_query_terms=1000,
                               min_word_len=cut + 1)
    assert {t for t, _ in longer} == {t for t, _ in base
                                      if len(t) > cut}
    assert len(longer) < len(base)
    shorter = interesting_terms(searcher, seed, min_term_freq=1,
                                min_doc_freq=1, max_query_terms=1000,
                                max_word_len=cut)
    assert {t for t, _ in shorter} == {t for t, _ in base
                                       if len(t) <= cut}
    top = base[0][0]
    nostop = interesting_terms(searcher, seed, min_term_freq=1,
                               min_doc_freq=1, max_query_terms=1000,
                               stop_words={top})
    assert top not in {t for t, _ in nostop}
    assert {t for t, _ in nostop} == {t for t, _ in base} - {top}
