"""DictionaryCompoundWordTokenFilter — decompose() loop pins +
CustomAnalyzer chain end-to-end (part query hits the compound doc).
Reference: compound/DictionaryCompoundWordTokenFilter.java:30,
CompoundWordTokenFilterBase.java:90-121."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.compound import (decompose,
                                                 dictionary_compound_filter)
from lucene_solr_spark.analysis.custom import CustomAnalyzer, lowercase_filter
from lucene_solr_spark.index.builder import IndexBuilder
from lucene_solr_spark.search import Searcher
from lucene_solr_spark.search.ast import TermQuery

LEX = frozenset({"donau", "dampf", "schiff", "fahrt", "dampfschiff"})


def test_decompose_scan_order_and_matches():
    # start offsets ascending, lengths ascending — the reference loop
    assert decompose("donaudampfschiff", LEX, 2, 15, False) == \
        ["donau", "dampf", "dampfschiff", "schiff"]


def test_only_longest_match_per_start():
    # at offset 5 both 'dampf' and 'dampfschiff' match → keep longest
    assert decompose("donaudampfschiff", LEX, 2, 15, True) == \
        ["donau", "dampfschiff", "schiff"]


def test_subword_size_bounds():
    assert decompose("donaudampfschiff", LEX, 2, 5, False) == \
        ["donau", "dampf"]               # schiff (6) and dampfschiff > max 5
    assert decompose("donaudampfschiff", LEX, 6, 15, False) == \
        ["dampfschiff", "schiff"]        # 5-char parts < min 6


def test_min_word_size_gate_and_position_stacking():
    an = CustomAnalyzer(token_filters=(
        lowercase_filter(),
        dictionary_compound_filter(LEX, min_word_size=10)))
    toks, pos = an.tokens_positions("Dampfschiff macht Dampffahrt")
    # 'dampfschiff' (11) decomposes: dampf/dampfschiff/schiff stack on
    # position 0; 'macht' (5) < min_word 10 passes untouched;
    # 'dampffahrt' (10) → dampf + fahrt on position 2
    assert toks == ["dampfschiff", "dampf", "dampfschiff", "schiff",
                    "macht", "dampffahrt", "dampf", "fahrt"]
    assert pos == [0, 0, 0, 0, 1, 2, 2, 2]


def test_validation():
    with pytest.raises(ValueError):
        dictionary_compound_filter([])
    with pytest.raises(ValueError):
        dictionary_compound_filter(LEX, min_subword_size=0)
    with pytest.raises(ValueError):
        dictionary_compound_filter(LEX, min_subword_size=9,
                                   max_subword_size=3)


def test_end_to_end_part_query_hits_compound_doc(spark):
    rows = [(0, "die Donaudampfschifffahrtsgesellschaft"),
            (1, "ein kleines Schiff"),
            (2, "nichts relevantes")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    an = CustomAnalyzer(token_filters=(
        lowercase_filter(), dictionary_compound_filter(LEX)))
    idx = IndexBuilder(an, grid=16, with_positions=True) \
        .build(spark, df).cache()
    s = Searcher(spark, idx)
    hits = sorted(r["doc_id"] for r in
                  s.match_docs(TermQuery("schiff")).collect())
    assert hits == [0, 1]           # part query reaches the compound
    assert sorted(r["doc_id"] for r in
                  s.match_docs(TermQuery("dampf")).collect()) == [0]
    # the original compound surface stays searchable too
    assert [r["doc_id"] for r in s.match_docs(
        TermQuery("donaudampfschifffahrtsgesellschaft")).collect()] == [0]
    idx.release()
