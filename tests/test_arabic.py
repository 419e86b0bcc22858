"""Arabic normalization + light stemming
(`ar/ArabicNormalizer.java:43`, `ar/ArabicStemmer.java:55` — Larkey
2002). Pins mirror the reference's TestArabicNormalizationFilter /
TestArabicStemFilter behaviors."""

from __future__ import annotations

from lucene_solr_spark.analysis.ar import (arabic_light_analyzer,
                                           arabic_normalize, arabic_stem)


def test_normalize_alef_variants():
    assert arabic_normalize("أحمد") == "احمد"
    assert arabic_normalize("إسلام") == "اسلام"
    assert arabic_normalize("آخر") == "اخر"


def test_normalize_yeh_marbuta_tatweel_harakat():
    assert arabic_normalize("مصطفى") == "مصطفي"    # dotless yeh
    assert arabic_normalize("مدرسة") == "مدرسه"    # teh marbuta
    assert arabic_normalize("كتـــاب") == "كتاب"   # tatweel deleted
    assert arabic_normalize("كَتَبَ") == "كتب"     # harakat deleted


def test_stem_prefixes():
    assert arabic_stem("الكتاب") == "كتاب"         # al-
    assert arabic_stem("والكتاب") == "كتاب"        # wal-
    assert arabic_stem("بالكتاب") == "كتاب"        # bal-
    assert arabic_stem("وكتاب") == "كتاب"          # wa- (len ≥ 4)
    assert arabic_stem("وهب") == "وهب"              # wa- blocked < 4
    # first match only: after ال strips, وال cannot also strip
    assert arabic_stem("ال") == "ال"                # too short for any


def test_stem_suffixes_scan_order():
    assert arabic_stem("كتابها") == "كتاب"          # -ha
    assert arabic_stem("معلمون") == "معلم"          # -un
    assert arabic_stem("معلمات") == "معلم"          # -at
    assert arabic_stem("مدرسة") == "مدرس"           # -a (teh marbuta)
    # suffixes strip iteratively in list order on the shrinking word
    assert arabic_stem("معلماتها") == "معلم"        # -ha then -at
    # ≥2 chars must remain
    assert arabic_stem("به") == "به"


def test_full_chain_meets_at_stem():
    an = arabic_light_analyzer()
    # prefixed+suffixed surface forms meet the bare stem
    tp1 = an.term_positions("الكتاب كتاب وكتابها")
    assert set(tp1.keys()) == {"كتاب"}
    assert tp1["كتاب"] == [0, 1, 2]


def test_chain_normalizes_before_stemming():
    an = arabic_light_analyzer()
    # alef-hamza surface: normalizer folds hamza, then stemmer strips ال
    got = an.tokens("الأحمد")
    assert got == ["احمد"]


def test_persian_normalize_pins():
    from lucene_solr_spark.analysis.ar import (persian_char_normalize,
                                               persian_normalize)
    assert persian_normalize("می") == "مي"          # farsi yeh
    assert persian_normalize("کتاب") == "كتاب"      # keheh → kaf
    assert persian_char_normalize("می‌خواهم") == "می خواهم"


def test_persian_analyzer_chain():
    from lucene_solr_spark.analysis.ar import persian_analyzer
    an = persian_analyzer(stop_words=["از"])
    # ZWNJ splits the affixed form into two tokens; keheh folds to kaf
    toks = an.tokens("کتاب می‌خواهم از")
    assert toks[0] == "كتاب" and len(toks) == 3


def test_sorani_normalize_pins():
    from lucene_solr_spark.analysis.ar import sorani_normalize as n
    # TestSoraniNormalizationFilter behaviors
    assert n("يی") == "یی" and n("ى") == "ی"     # yeh variants
    assert n("ك") == "ک"                          # kaf → keheh
    assert n("ه‌") == "ە"                     # heh+ZWNJ → ae
    assert n("ره") == "ڕە"                        # initial reh + final heh
    assert n("ماله") == "مالە"                    # final heh → ae
    assert n("ماليك") == "مالیک"                  # mid-word unchanged rules
    assert n("کـتاب") == "کتاب"                   # tatweel deleted
    assert n("ڒوو") == "ڕوو"                      # reh-above → rreh


def test_sorani_stem_pins():
    from lucene_solr_spark.analysis.ar import sorani_stem as s
    assert s("پیاوەکان") == "پیاو"                # definite plural
    assert s("پیاوان") == "پیاو"                  # indefinite plural
    assert s("پیاوەکە") == "پیاو"                 # definite singular
    assert s("کتاویەکی") == "کتاو"                # indef + izafe
    assert s("پیاوێک") == "پیاو"                  # indefinite singular
    assert s("مالەکەدا") == "مالە"               # دا then کە (ەکە needs >6)
    assert s("مالمان") == "مالم"                 # مان needs >6; ان fires
    assert s("کتابمان") == "کتاب"                # possessive at length >6
    assert s("مال") == "مال"                      # short: untouched


def test_sorani_chain():
    from lucene_solr_spark.analysis.ar import sorani_analyzer
    an = sorani_analyzer()
    tp = an.term_positions("پیاوەکان پیاوێک")
    assert set(tp.keys()) == {"پیاو"} and tp["پیاو"] == [0, 1]
