"""UnifiedHighlighter passage ranking (PassageScorer formulas) against
hand-computed expectations on a crafted corpus."""

from __future__ import annotations

import math
import re

import pytest

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.passages import (_break_passages,
                                               passage_highlight)

K1, B, PIVOT = 1.2, 0.75, 87.0


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 0: three sentences; 'spark' in #1 and #3, 'merge' in #3
        (0, "spark engines process data quickly. nothing relevant here "
            "at all today. spark and merge operate together nicely."),
        # doc 1: no query terms at all
        (1, "completely unrelated content with zero matches inside."),
        # doc 2: unpunctuated long text (length-goal breaking)
        (2, ("spark " + "filler " * 60 + "merge " + "filler " * 60
             + "spark merge").strip()),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = (IndexBuilder(ENGLISH_ANALYZER, grid=64, with_offsets=True)
           .build(spark, docs).cache())
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    return Searcher(spark, idx), texts


def _score(text, passage, spans_in_passage, ttf_doc):
    plen = passage[1] - passage[0]
    freq = {}
    for t in spans_in_passage:
        freq[t] = freq.get(t, 0) + 1
    s = 0.0
    for t, f in freq.items():
        num_docs = 1.0 + len(text) / PIVOT
        w = (K1 + 1.0) * math.log(1.0 + (num_docs + 0.5)
                                  / (ttf_doc[t] + 0.5))
        s += w * (f / (f + K1 * ((1 - B) + B * plen / PIVOT)))
    return s * (1.0 + 1.0 / math.log(PIVOT + passage[0]))


def test_passage_scores_and_order(corpus):
    searcher, texts = corpus
    out = passage_highlight(searcher, ["spark", "merge"],
                            {0: texts[0]}, max_passages=2)
    res = out[0]
    assert len(res) == 2
    # passages return in OFFSET order; the two matching sentences are
    # #1 (spark) and #3 (spark+merge)
    sents = _break_passages(texts[0], 200)
    s1, s3 = sents[0], sents[2]
    ttf = {"spark": 2, "merge": 1}
    exp1 = _score(texts[0], s1, ["spark"], ttf)
    exp3 = _score(texts[0], s3, ["spark", "merge"], ttf)
    assert res[0][1] == s1[0] and res[1][1] == s3[0]
    assert res[0][0] == pytest.approx(exp1, rel=1e-9)
    assert res[1][0] == pytest.approx(exp3, rel=1e-9)
    # two-distinct-term sentence must outscore the single-term one
    # despite appearing later (norm favors early passages)
    assert exp3 > exp1


def test_passage_top1_picks_best_not_first(corpus):
    searcher, texts = corpus
    out = passage_highlight(searcher, ["spark", "merge"],
                            {0: texts[0]}, max_passages=1)
    res = out[0]
    assert len(res) == 1
    sents = _break_passages(texts[0], 200)
    assert res[0][1] == sents[2][0]      # the spark+merge sentence wins
    assert "<b>spark</b>" in res[0][3] and "<b>merge</b>" in res[0][3]


def test_passage_tags_exact_occurrences(corpus):
    searcher, texts = corpus
    out = passage_highlight(searcher, ["spark"], {0: texts[0]},
                            max_passages=3)
    for _, ps, pe, snip in out[0]:
        # strip tags -> must reproduce the raw passage text
        raw = snip.replace("<b>", "").replace("</b>", "")
        assert raw == texts[0][ps:pe]
        assert all(m == "spark"
                   for m in re.findall(r"<b>(.*?)</b>", snip))


def test_passage_no_match_and_length_goal(corpus):
    searcher, texts = corpus
    out = passage_highlight(searcher, ["spark", "merge"],
                            {1: texts[1], 2: texts[2]},
                            max_passages=2, max_passage_chars=120)
    assert out[1] == []
    res2 = out[2]
    assert 1 <= len(res2) <= 2
    for _, ps, pe, snip in res2:
        assert pe - ps <= 120
        raw = snip.replace("<b>", "").replace("</b>", "")
        assert raw == texts[2][ps:pe]
        assert "<b>" in snip


def test_break_passages_cover_and_align():
    text = "alpha beta. gamma delta epsilon? zeta " + "x" * 300
    ps = _break_passages(text, 100)
    assert ps[0] == (0, text.index("gamma"))
    # windows never exceed the goal and never split the text mid-token
    # when a space is available
    for s, e in ps:
        assert e - s <= 100 or " " not in text[s:e]
