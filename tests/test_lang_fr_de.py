"""Elision + French minimal / German light stemmers
(`util/ElisionFilter.java:38`, `fr/FrenchMinimalStemmer.java:24`,
`de/GermanLightStemmer.java:35` — Savoy's published algorithms)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.lang import (FRENCH_ELISION_ARTICLES, elide,
                                             elision_expr,
                                             french_light_analyzer,
                                             french_minimal_stem,
                                             german_light_analyzer,
                                             german_light_stem)

ELISION_PINS = [
    ("l'avion", "avion"),
    ("d'accord", "accord"),
    ("jusqu'ici", "ici"),
    ("qu'il", "il"),
    ("L'avion", "avion"),          # article matched ignore-case
    ("l’avion", "avion"),     # U+2019 right single quote
    ("aujourd'hui", "aujourd'hui"),  # 'aujourd' is not an article
    ("avion", "avion"),            # no apostrophe
    ("rock'n'roll", "rock'n'roll"),  # 'rock' not an article; first ' only
]


def test_elision_pins():
    for raw, want in ELISION_PINS:
        assert elide(raw) == want, raw


FR_STEM_PINS = [
    ("chevaux", "cheval"),
    ("hiboux", "hibou"),
    ("chantés", "chant"),
    ("chanter", "chant"),
    ("chante", "chant"),
    ("baronnes", "baron"),
    ("barons", "baron"),
    ("baron", "baron"),
    ("chat", "chat"),              # < 6 chars untouched
    ("peaux", "peaux"),            # 5 chars — under the ≥6 gate
    ("travaux", "traval"),         # aux → al substitution path
]


def test_french_minimal_stem_pins():
    for raw, want in FR_STEM_PINS:
        assert french_minimal_stem(raw) == want, raw


DE_STEM_PINS = [
    ("häuser", "haus"),
    ("hunde", "hund"),
    ("hunden", "hund"),
    ("kälber", "kalb"),
    ("bücher", "buch"),
    ("aufeinander", "aufeinand"),
    ("abhängen", "abhang"),
    ("tisch", "tisch"),
]


def test_german_light_stem_pins():
    for raw, want in DE_STEM_PINS:
        assert german_light_stem(raw) == want, raw


def test_elision_expr_matches_python(spark):
    toks = [r for r, _ in ELISION_PINS] + ["m'a", "s'est", "n'y",
                                           "c'était", "t'aime", "o'brien"]
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(elision_expr("toks").alias("o")).collect()[0]["o"]
    assert got == [elide(t) for t in toks]


def test_french_analyzer_chain(spark):
    an = french_light_analyzer(stop_words=["et", "le", "la"])
    tp = an.term_positions("L'avion et les chevaux")
    # avion(0) [et dropped with gap] les→le? 'les' not in stops; stems
    assert "avion" in tp and tp["avion"] == [0]
    assert "cheval" in tp and tp["cheval"] == [3]
    assert "et" not in tp


def test_german_analyzer_end_to_end(spark):
    from lucene_solr_spark.index.builder import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.ast import TermQuery
    rows = [(0, "die Häuser der Stadt"), (1, "ein Haus am See"),
            (2, "Hunde und Katzen")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    an = german_light_analyzer(stop_words=["die", "der", "ein", "am",
                                           "und"])
    idx = IndexBuilder(an, grid=16).build(spark, df).cache()
    s = Searcher(spark, idx)
    # 'Häuser' and 'Haus' meet at stem 'haus'
    hits = sorted(r["doc_id"] for r in
                  s.match_docs(TermQuery("haus")).collect())
    assert hits == [0, 1]
    assert [r["doc_id"] for r in
            s.match_docs(TermQuery("hund")).collect()] == [2]
    idx.release()


def test_stem_exclusions_respected():
    an = german_light_analyzer(stem_exclusions=["hunde"])
    tp = an.term_positions("Hunde Katzen")
    assert "hunde" in tp and "katz" in tp


ES_PINS = [("casas", "cas"), ("veces", "vez"), ("sociedades", "sociedad"),
           ("hombre", "hombr"), ("chicas", "chic"), ("luz", "luz"),
           ("ingleses", "ingles"), ("canción", "cancion")]


def test_spanish_light_stem_pins():
    from lucene_solr_spark.analysis.lang import spanish_light_stem
    for raw, want in ES_PINS:
        assert spanish_light_stem(raw) == want, raw


IT_PINS = [("ragazzo", "ragazz"), ("ragazzi", "ragazz"),
           ("figlio", "figl"), ("figlie", "figl"),
           ("amici", "amici"), ("notte", "notte"),
           ("perché", "perc")]


def test_italian_light_stem_pins():
    from lucene_solr_spark.analysis.lang import italian_light_stem
    for raw, want in IT_PINS:
        assert italian_light_stem(raw) == want, raw


PT_PINS = [("meninas", "menin"), ("menina", "menin"), ("menino", "menin"),
           ("botões", "bota"), ("barris", "barril"),
           ("capitais", "capital"), ("corações", "coraca"),
           ("rapidamente", "rapid"), ("homens", "homem"),
           ("papéis", "papel"), ("bons", "bom")]


def test_portuguese_light_stem_pins():
    from lucene_solr_spark.analysis.lang import portuguese_light_stem
    for raw, want in PT_PINS:
        assert portuguese_light_stem(raw) == want, raw


def test_light_analyzer_chains_meet_at_stem():
    from lucene_solr_spark.analysis.lang import (italian_light_analyzer,
                                                 portuguese_light_analyzer,
                                                 spanish_light_analyzer)
    an = spanish_light_analyzer(stop_words=["las", "y"])
    tp = an.term_positions("Las casas y chicas")
    assert tp == {"cas": [1], "chic": [3]}
    an = portuguese_light_analyzer()
    assert set(an.term_positions("meninas menino").keys()) == {"menin"}
    an = italian_light_analyzer(stem_exclusions=["ragazzi"])
    tp = an.term_positions("ragazzo ragazzi")
    assert set(tp.keys()) == {"ragazz", "ragazzi"}


RU_PINS = [("книгами", "книг"), ("книги", "книг"), ("книга", "книг"),
           ("красного", "красн"), ("большая", "больш"),
           ("странный", "стран"), ("дом", "дом"), ("историями", "истор")]


def test_russian_light_stem_pins():
    from lucene_solr_spark.analysis.lang import russian_light_stem
    for raw, want in RU_PINS:
        assert russian_light_stem(raw) == want, raw


def test_russian_chain():
    from lucene_solr_spark.analysis.lang import russian_light_analyzer
    an = russian_light_analyzer(stop_words=["и"])
    tp = an.term_positions("Книга и книги")
    assert set(tp.keys()) == {"книг"} and tp["книг"] == [0, 2]


def test_greek_lowercase_pins():
    from lucene_solr_spark.analysis.lang import greek_lowercase
    assert greek_lowercase("ΚΑΛΌΣ") == greek_lowercase("καλός") \
        == greek_lowercase("καλοσ") == "καλοσ"
    assert greek_lowercase("ΐ") == "ι" and greek_lowercase("ΰ") == "υ"
    assert greek_lowercase("Ωμέγα") == "ωμεγα"


def test_greek_chain():
    from lucene_solr_spark.analysis.lang import greek_analyzer
    an = greek_analyzer(stop_words=["ΚΑΙ"])
    tp = an.term_positions("καλός και ΚΑΛΟΣ")
    assert set(tp.keys()) == {"καλοσ"} and tp["καλοσ"] == [0, 2]


def test_turkish_lowercase_pins():
    from lucene_solr_spark.analysis.lang import turkish_lowercase
    assert turkish_lowercase("İSTANBUL") == "istanbul"
    assert turkish_lowercase("ISPARTA") == "ısparta"
    assert turkish_lowercase("DİYARBAKIR") == "diyarbakır"
    # I + combining-dot-above == İ decomposition → i
    assert turkish_lowercase("İstanbul") == "istanbul"
    # plain lower() would produce i+U+0307 — ours must not
    assert "̇" not in turkish_lowercase("İİİ")


def test_turkish_chain():
    from lucene_solr_spark.analysis.lang import turkish_analyzer
    an = turkish_analyzer(stop_words=["VE"])
    tp = an.term_positions("İstanbul VE ISPARTA")
    assert set(tp.keys()) == {"istanbul", "ısparta"}


NO_PINS = [("hemmeligheter", "hemmelig"), ("hemmeligheten", "hemmelig"),
           ("kristendom", "kristen"), ("følelser", "føl"),
           ("sovende", "sov"), ("fineste", "fin"), ("husene", "hus"),
           ("huset", "hus"), ("kaker", "kak"), ("kake", "kak"),
           ("billigst", "billig")]

NN_PINS = [("hemmelegheita", "hemmeleg"), ("tryggleiken", "trygg"),
           ("sovande", "sov"), ("gutane", "gut")]


def test_norwegian_light_stem_pins():
    from lucene_solr_spark.analysis.lang import norwegian_light_stem
    for raw, want in NO_PINS:
        assert norwegian_light_stem(raw) == want, raw
    for raw, want in NN_PINS:
        assert norwegian_light_stem(raw, bokmaal=False,
                                    nynorsk=True) == want, raw
    import pytest as _pt
    with _pt.raises(ValueError):
        norwegian_light_stem("x", bokmaal=False, nynorsk=False)


SV_PINS = [("känslor", "känsl"), ("flickorna", "flick"),
           ("utbildningarne", "utbildning"), ("roligaste", "rolig"),
           ("starkare", "stark"), ("starkast", "stark"),
           ("huset", "hus"), ("flickor", "flick"), ("flickan", "flicka")]


def test_swedish_light_stem_pins():
    from lucene_solr_spark.analysis.lang import swedish_light_stem
    for raw, want in SV_PINS:
        assert swedish_light_stem(raw) == want, raw


def test_nordic_chains():
    from lucene_solr_spark.analysis.lang import (norwegian_light_analyzer,
                                                 swedish_light_analyzer)
    an = norwegian_light_analyzer()
    assert set(an.term_positions("huset husene").keys()) == {"hus"}
    an = swedish_light_analyzer()
    assert set(an.term_positions("flickor flickorna").keys()) == {"flick"}


CZ_PINS = [("kostech", "kost"), ("matkami", "matk"), ("matkám", "matk"),
           ("matko", "matk"), ("matka", "matk"),
           ("karel", "karl"), ("karlův", "karl"),
           ("vztek", "vztk"), ("vzteku", "vztk"),
           ("hezcí", "hezk"), ("hezkého", "hezk"),
           ("hradů", "hrad"), ("hradem", "hrad")]


def test_czech_stem_pins():
    from lucene_solr_spark.analysis.lang import czech_stem
    for raw, want in CZ_PINS:
        assert czech_stem(raw) == want, raw


def test_czech_chain():
    from lucene_solr_spark.analysis.lang import czech_analyzer
    an = czech_analyzer()
    assert set(an.term_positions("matka matkami").keys()) == {"matk"}


BG_PINS = [("градът", "град"), ("градовете", "град"), ("град", "град"),
           ("краищата", "кра"), ("дни", "дни"),
           ("страните", "стран"), ("фирмата", "фирм"), ("фирми", "фирм"),
           ("краеве", "краев"),   # len 6: under the >6 еве guard
           ("крайове", "край")]


def test_bulgarian_stem_pins():
    from lucene_solr_spark.analysis.lang import bulgarian_stem
    for raw, want in BG_PINS:
        assert bulgarian_stem(raw) == want, raw


def test_bulgarian_chain():
    from lucene_solr_spark.analysis.lang import bulgarian_analyzer
    an = bulgarian_analyzer()
    assert set(an.term_positions("градът градовете").keys()) == {"град"}


LV_PINS = [("tirgiem", "tirg"), ("tirgus", "tirg"), ("tirgu", "tirg"),
           ("tirgi", "tirg"), ("blāķis", "blāķ"), ("blāķi", "blāķ"),
           ("čūskas", "čūsk"), ("čūsku", "čūsk"),
           ("zvaigznes", "zvaigzn"), ("zvaigzne", "zvaigzn"),
           ("zvaigžņu", "zvaigzn"),     # žņ un-palatalizes to zn
           ("kauliem", "kaul"), ("kauli", "kaul"), ("kaulu", "kaul"),
           ("les", "les")]              # stem-length guard


def test_latvian_stem_pins():
    from lucene_solr_spark.analysis.lang import latvian_stem
    for raw, want in LV_PINS:
        assert latvian_stem(raw) == want, raw


def test_latvian_chain():
    from lucene_solr_spark.analysis.lang import latvian_analyzer
    an = latvian_analyzer()
    assert set(an.term_positions("zvaigznes zvaigžņu").keys()) == \
        {"zvaigzn"}


FI_PINS = [("autoja", "auto"), ("autot", "auto"), ("autoon", "auto"),
           ("auto", "auto"), ("auton", "aut"),
           ("talossa", "talo"), ("talolla", "talo"), ("talot", "talo"),
           ("kirjassa", "kirj"), ("kirjakin", "kirjak"),
           ("kahde", "kahd"),            # hde needs len > 5
           ("olutta", "olu"), ("kukka", "kukk"),   # dedouble gated at >4
           ("kirkkoja", "kirko")]               # k de-doubling fires


def test_finnish_light_stem_pins():
    from lucene_solr_spark.analysis.lang import finnish_light_stem
    for raw, want in FI_PINS:
        assert finnish_light_stem(raw) == want, raw


def test_finnish_chain():
    from lucene_solr_spark.analysis.lang import finnish_light_analyzer
    an = finnish_light_analyzer()
    assert set(an.term_positions("autot autoja").keys()) == {"auto"}
