"""NGramPhraseQuery rewrite (`search/NGramPhraseQuery.java:48`) +
explicit phrase positions (PhraseQuery.Builder.add(term, position)):
the pruned gapped phrase must match EXACTLY the docs of the dense
bigram phrase while scanning ~len/n + 1 postings streams."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.cjk import cjk_bigram_tokenizer
from lucene_solr_spark.analysis.custom import CustomAnalyzer, lowercase_filter
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import PhraseQuery
from lucene_solr_spark.search.extras import ngram_phrase_rewrite


def _bigrams(s: str) -> tuple[str, ...]:
    return tuple(s[i:i + 2] for i in range(len(s) - 1))


def test_rewrite_shape():
    q = PhraseQuery(_bigrams("ABCDEF"))          # AB BC CD DE EF
    r = ngram_phrase_rewrite(q, 2)
    assert r.terms == ("AB", "CD", "EF")
    assert r.positions == (0, 2, 4)
    q7 = PhraseQuery(_bigrams("ABCDEFG"))        # 6 grams, last idx 5
    r7 = ngram_phrase_rewrite(q7, 2)
    assert r7.terms == ("AB", "CD", "EF", "FG")
    assert r7.positions == (0, 2, 4, 5)


def test_rewrite_not_optimizable_passthrough():
    sloppy = PhraseQuery(_bigrams("ABCDE"), slop=1)
    assert ngram_phrase_rewrite(sloppy, 2) is sloppy
    short = PhraseQuery(_bigrams("ABC"))         # 2 terms < 3
    assert ngram_phrase_rewrite(short, 2) is short
    uni = PhraseQuery(_bigrams("ABCDE"))
    assert ngram_phrase_rewrite(uni, 1) is uni   # n < 2


def test_positions_validation():
    with pytest.raises(ValueError):
        PhraseQuery(("a", "b"), positions=(0,))
    with pytest.raises(ValueError):
        PhraseQuery(("a", "b"), positions=(2, 1))
    with pytest.raises(ValueError):
        PhraseQuery(("a", "b"), positions=(0, 2), slop=1)
    with pytest.raises(ValueError):
        PhraseQuery(("a", "b"), positions=(0, 2), matcher="lucene")


@pytest.fixture(scope="module")
def bsearcher(spark):
    an = CustomAnalyzer(tokenizer=cjk_bigram_tokenizer(),
                        token_filters=(lowercase_filter(),))
    texts = ["多くの学生が試験に落ちた", "学生が試験を受けた", "試験に合格した",
             "多くの学生が試験に合格", "学生 TOKYO 試験", "多くの学生",
             "無関係な文章です", "試験試験試験"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    idx = IndexBuilder(an, grid=8, with_positions=True) \
        .build(spark, docs).cache()
    yield Searcher(spark, idx)
    idx.release()


@pytest.mark.parametrize("needle", ["学生が試験", "試験に", "多くの学生",
                                    "試験に合格した"])
def test_pruned_matches_dense(bsearcher, needle):
    dense = PhraseQuery(_bigrams(needle))
    pruned = ngram_phrase_rewrite(dense, 2)
    a = sorted(r["doc_id"] for r in bsearcher.match_docs(dense).collect())
    b = sorted(r["doc_id"] for r in bsearcher.match_docs(pruned).collect())
    assert a == b and (len(dense.terms) < 3 or
                       len(pruned.terms) < len(dense.terms))
    # scores equal a manually-built gapped phrase (same pruned terms)
    if pruned.positions is not None:
        manual = PhraseQuery(pruned.terms, positions=pruned.positions)
        sa = bsearcher.score_all(pruned, mode="f64").orderBy("doc_id")
        sb = bsearcher.score_all(manual, mode="f64").orderBy("doc_id")
        assert [(r["doc_id"], round(r["score"], 9)) for r in sa.collect()] \
            == [(r["doc_id"], round(r["score"], 9)) for r in sb.collect()]


def test_gapped_positions_semantics(spark):
    # positions (0, 2): first and third token, anything between
    rows = [(0, "alpha beta gamma"), (1, "alpha gamma beta"),
            (2, "alpha beta"), (3, "alpha x gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer
    an = StandardAnalyzer(stop_words=frozenset())
    idx = IndexBuilder(an, grid=8, with_positions=True) \
        .build(spark, df).cache()
    s = Searcher(spark, idx)
    q = PhraseQuery(("alpha", "gamma"), positions=(0, 2))
    assert sorted(r["doc_id"] for r in s.match_docs(q).collect()) == [0, 3]
    idx.release()
