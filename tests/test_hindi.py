"""Hindi normalization + light stemming (`hi/HindiNormalizer.java:41`,
`hi/HindiStemmer.java:30` — Ramanathan & Rao 2003)."""

from __future__ import annotations

from lucene_solr_spark.analysis.hi import (hindi_analyzer, hindi_normalize,
                                           hindi_stem)


def test_normalize_pins():
    assert hindi_normalize("क़िताब") == "किताब"      # nukta consonant
    assert hindi_normalize("लड़का") == "लडका"        # decomposed nukta
    assert hindi_normalize("माँ") == "मां"           # candrabindu → bindu
    assert hindi_normalize("ईई") == "इइ"             # long → short vowel
    assert hindi_normalize("की") == "कि"             # long → short matra
    # dead n → bindu (न + virama collapses)
    assert hindi_normalize("अन्दर") == "अंदर"


def test_stem_tiers_longest_first():
    assert hindi_stem("लड़कियाँ") == "लड़क"          # 4-char tier
    assert hindi_stem("खाना") == "खा"                # -ना
    assert hindi_stem("लड़के") == "लड़क"             # -े
    assert hindi_stem("लड़का") == "लड़क"             # -ा
    assert hindi_stem("कर") == "कर"                  # guard: too short


def test_chain_meets_at_stem():
    an = hindi_analyzer(stop_words=["और"])
    tp = an.term_positions("लड़का और लड़के")
    # nukta normalizes first, then both forms strip to the same stem
    assert len(tp) == 1 and list(tp.values())[0] == [0, 2]
