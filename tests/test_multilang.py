"""Script-routing multilingual analysis: one index over a mixed-script
corpus, every document analyzed by its script's chain."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.multilang import (ScriptRoutingAnalyzer,
                                                  analyzer_for, detect_route)


def test_registry_covers_languages():
    for lang in ("en", "fr", "de", "es", "it", "pt", "ru", "el", "ar",
                 "fa", "hi", "id", "tr", "no", "sv", "fi", "cs", "bg", "lv", "ckb", "cjk"):
        an = analyzer_for(lang)
        assert hasattr(an, "term_positions"), lang
    with pytest.raises(ValueError):
        analyzer_for("xx")


def test_detect_route():
    assert detect_route("hello world") == "en"
    assert detect_route("привет мир") == "ru"
    assert detect_route("مرحبا بالعالم") == "ar"
    assert detect_route("नमस्ते") == "hi"
    assert detect_route("你好世界") == "cjk"
    assert detect_route("こんにちは") == "cjk"
    assert detect_route("안녕하세요") == "cjk"
    assert detect_route("γεια σου") == "el"
    assert detect_route("12 34 !!") == "en"          # no letters → default
    assert detect_route("hello мир world wide") == "en"   # majority latin


def test_routing_analyzer_delegates():
    an = ScriptRoutingAnalyzer()
    # Russian doc takes the Russian light stemmer
    assert "книг" in an.term_positions("Книга и книги")
    # Arabic doc takes the Arabic chain (prefix strip)
    assert "كتاب" in an.term_positions("الكتاب")
    # English doc takes the English chain (Porter)
    assert "tabl" in an.term_positions("tables")
    # CJK doc takes the bigram chain
    assert "学生" in an.term_positions("学生です")


def test_mixed_corpus_index_end_to_end(spark):
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.ast import TermQuery
    rows = [(0, "the quick tables"), (1, "Книга и книги"),
            (2, "الكتاب الجديد"), (3, "多くの学生が試験に合格"),
            (4, "more tables and chairs")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = IndexBuilder(ScriptRoutingAnalyzer(), grid=16,
                       with_positions=True).build(spark, docs).cache()
    s = Searcher(spark, idx)
    assert sorted(r["doc_id"] for r in
                  s.match_docs(TermQuery("tabl")).collect()) == [0, 4]
    assert [r["doc_id"] for r in
            s.match_docs(TermQuery("книг")).collect()] == [1]
    assert [r["doc_id"] for r in
            s.match_docs(TermQuery("كتاب")).collect()] == [2]
    assert [r["doc_id"] for r in
            s.match_docs(TermQuery("学生")).collect()] == [3]
    idx.release()
