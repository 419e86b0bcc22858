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


def test_script_profile_multiscript(spark):
    from lucene_solr_spark.pipeline.textstats import script_profile
    rows = [(0, "hello world"),                  # latin
            (1, "привет мир"),                   # cyrillic
            (2, "مرحبا بالعالم"),                # arabic
            (3, "नमस्ते दुनिया"),                 # devanagari
            (4, "你好世界"),                      # han
            (5, "안녕하세요"),                     # hangul
            (6, "γεια σου"),                     # greek
            (7, "abc мир"),                      # 3-3 tie → und
            (8, "1234 !!"),                      # no letters → und
            (9, "hello мир friend")]             # latin dominant
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert got[0]["dominant"] == "latin" and got[0]["latin"] == 10
    assert got[1]["dominant"] == "cyrillic"
    assert got[2]["dominant"] == "arabic"
    assert got[3]["dominant"] == "devanagari"
    assert got[4]["dominant"] == "han" and got[4]["han"] == 4
    assert got[5]["dominant"] == "hangul"
    assert got[6]["dominant"] == "greek"
    assert got[7]["dominant"] == "und"           # 2-way tie
    assert got[8]["dominant"] == "und" and got[8]["letters"] == 0
    assert got[9]["dominant"] == "latin"
    assert all(got[i]["letters"] >= got[i]["latin"] for i in got)
