"""StemmerOverrideFilter + SetKeywordMarkerFilter
(miscellaneous/StemmerOverrideFilter.java:37,
SetKeywordMarkerFilter.java:31) on the analysis chain — pure-Python
pins plus the scalar≡vocab-map differential the batch invert relies on.
"""

from dataclasses import replace

import numpy as np

from lucene_solr_spark.analysis.analyzer import ENGLISH_ANALYZER
from lucene_solr_spark.index.builder import _vocab_map

ANA = replace(ENGLISH_ANALYZER, stemmer="porter",
              stem_overrides=(("merging", "mrg"), ("running", "sprint")),
              keyword_terms=frozenset({"tables", "quickly"}))


def test_override_beats_stemmer():
    assert ANA.tokens("merging running") == ["mrg", "sprint"]


def test_keyword_protected_from_stemmer():
    # porter would give 'tabl' / 'quickli'
    assert ANA.tokens("tables quickly") == ["tables", "quickly"]


def test_unlisted_terms_still_stem():
    assert ANA.tokens("merges tables merged") == ["merg", "tables", "merg"]


def test_override_wins_over_keyword():
    # StemmerOverrideFilter runs first and sets the keyword attribute;
    # a term in BOTH dictionaries takes the override
    a = replace(ENGLISH_ANALYZER, stemmer="porter",
                stem_overrides=(("tables", "tbl"),),
                keyword_terms=frozenset({"tables"}))
    assert a.tokens("tables") == ["tbl"]


def test_stopwords_filtered_before_override():
    a = replace(ENGLISH_ANALYZER, stemmer="porter",
                stem_overrides=(("the", "zzz"),))
    assert a.tokens("the merging") == ["merg"]


def test_vocab_map_matches_scalar_chain():
    uniq = np.array(["merging", "tables", "merges", "quickly", "the",
                     "running", "spark"], dtype=object)
    keep, mapped = _vocab_map(uniq, ANA)
    for i, t in enumerate(uniq):
        scalar = ANA._finish(t)
        if scalar is None:
            assert not keep[i], t
        else:
            assert keep[i] and mapped[i] == scalar, t


def test_no_overrides_unchanged():
    base = replace(ENGLISH_ANALYZER, stemmer="porter")
    assert base.tokens("merging tables") == ["merg", "tabl"]
