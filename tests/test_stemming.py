"""English stemming chain: possessive strip, minimal stem, Porter.

References: `en/EnglishPossessiveFilter.java:47-55`,
`en/EnglishMinimalStemmer.java:29-48`, `en/PorterStemmer.java` (Porter
1980 release 3 + Lucene's bug-fix guards), chain order
`en/EnglishAnalyzer.java:107-113`.

The vectorized batch inverter runs the chain once per distinct term
(builder._vocab_map); the per-doc reference path runs it per token
(StandardAnalyzer._finish). Differential tests here pin both paths to
the same pure-Python oracle on an inflection-rich corpus that the
synthetic parquet tables lack.
"""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.analysis.analyzer import (ENGLISH_MINIMAL_ANALYZER,
                                                 ENGLISH_STEM_ANALYZER,
                                                 ENGLISH_STOP_WORDS,
                                                 StandardAnalyzer)
from lucene_solr_spark.analysis.en import (get_stemmer, minimal_stem,
                                           porter_stem, possessive_strip)
from lucene_solr_spark.index import IndexBuilder
from lucene_solr_spark.oracle.pyoracle import OracleIndex
from lucene_solr_spark.search import Searcher, parse_query

# Porter's published example set (the step-by-step vocabulary from the
# 1980 paper §"the algorithm" — hand-checkable against the rules).
PORTER_GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "disabled": "disabl",
    "matting": "mat", "mating": "mate", "meeting": "meet",
    "milling": "mill", "messing": "mess", "meetings": "meet",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short-word guard (PorterStemmer.java:479: len <= 2 unchanged)
    "is": "is", "be": "be", "a": "a", "s": "s", "io": "io",
    # bug-fix guards: bare 'ion' (Bug 2), 'eed'-shaped shorts (Bug 1)
    "ion": "ion", "eed": "eed",
    # corpus words the gated query relies on
    "merge": "merg", "merges": "merg", "merging": "merg",
    "table": "tabl", "tables": "tabl", "query": "queri",
    "value": "valu", "customer": "custom",
}

MINIMAL_GOLDEN = {
    # EnglishMinimalStemmer.java branch-for-branch
    "dogs": "dog", "cats": "cat", "tables": "table",
    "bus": "bus", "miss": "miss", "class": "class",
    "goes": "goes", "dies": "dy", "ties": "ty", "babies": "baby",
    "ponies": "pony", "aes": "aes", "ees": "ees",
    "classes": "classe",
    "is": "is", "as": "as", "ss": "ss", "s": "s",
    "merge": "merge", "merging": "merging",
}


def test_porter_golden():
    bad = {w: (porter_stem(w), e) for w, e in PORTER_GOLDEN.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_minimal_golden():
    bad = {w: (minimal_stem(w), e) for w, e in MINIMAL_GOLDEN.items()
           if minimal_stem(w) != e}
    assert not bad, bad


def test_possessive():
    assert possessive_strip("spark's") == "spark"
    assert possessive_strip("spark’s") == "spark"   # U+2019
    assert possessive_strip("spark＇s") == "spark"  # U+FF07
    assert possessive_strip("its'") == "its'"       # trailing bare quote kept
    assert possessive_strip("s") == "s"
    assert possessive_strip("'s") == ""


def test_analyzer_chain_order():
    """possessive → stop → porter, as EnglishAnalyzer.java:107-113
    (our possessive runs post-lowercase — equivalent, see analyzer)."""
    ana = ENGLISH_STEM_ANALYZER
    # possessive strip happens before the stop check: "that's" → "that"
    # → stop-filtered (position consumed)
    toks, pos = ana.tokens_positions("that's merging Tables the cat's")
    assert toks == ["merg", "tabl", "cat"]
    assert pos == [1, 2, 4]
    # stop check precedes stemming: "this" is stopped, but a term that
    # STEMS to a stopword is kept ("willing" → porter "will")
    assert ana.tokens("willing") == ["will"]
    assert get_stemmer(None) is None
    with pytest.raises(ValueError):
        get_stemmer("snowball")


INFLECTED_DOCS = [
    (0, "the merger's tables were merging quickly into merged queries"),
    (1, "caresses and ponies tied relational conditional operators"),
    (2, "hopefulness hopeful hoping hoped hopes hope hopping hopped"),
    (3, "spark's adjustable replacement was effective and dependable"),
    (4, "formalize formaliti formative electrical electriciti values"),
    (5, "merge merges merging merged merger mergers"),
    (6, "the a an of to was will with such that this"),  # stop-only
    (7, "activated activation activations activating activates"),
]


@pytest.fixture(scope="module", params=["porter", "minimal"])
def stem_env(request, spark):
    ana = (ENGLISH_STEM_ANALYZER if request.param == "porter"
           else ENGLISH_MINIMAL_ANALYZER)
    docs = spark.createDataFrame(INFLECTED_DOCS, "doc_id long, text string")
    idx = (IndexBuilder(ana, grid=64, with_positions=True)
           .build(spark, docs).cache())
    ora = OracleIndex(ana)
    for did, text in INFLECTED_DOCS:
        ora.add(did, text)
    return Searcher(spark, idx), ora, ana


def _cmp(searcher, oracle, q, k=10):
    pdf = searcher.top_k(q, k=k)
    eng = [(int(d), float(s)) for d, s in zip(pdf["doc_id"], pdf["score"])]
    orc = [(int(d), float(s)) for d, s in oracle.search_ast(q, k=k)]
    assert len(eng) == len(orc)
    for a, b in zip(eng, orc):
        assert a[0] == b[0]
        assert math.isclose(a[1], b[1], rel_tol=1e-6)
    return eng


def test_vectorized_build_matches_per_doc_oracle(stem_env):
    """The factorize-first batch chain (builder._vocab_map) must agree
    with the per-token reference path the OracleIndex uses."""
    searcher, ora, ana = stem_env
    hits = _cmp(searcher, ora, parse_query("merging", ana))
    assert hits, "stemmed query must match inflected docs"
    _cmp(searcher, ora, parse_query("hopes AND hoping", ana))
    _cmp(searcher, ora, parse_query('"merging queries"', ana))
    _cmp(searcher, ora, parse_query("activation OR tables", ana))


def test_stem_classes_share_postings(stem_env):
    """Every inflected form of one class hits the same docs with the
    same scores — the defining property of a stemmed index."""
    searcher, ora, ana = stem_env
    forms = (("merge", "merges", "merging") if ana.stemmer == "porter"
             else ("table", "tables"))
    frames = [searcher.top_k(parse_query(w, ana), k=10) for w in forms]
    assert len(frames[0]) > 0
    for fr in frames[1:]:
        assert frames[0].equals(fr)


def test_stop_only_doc_has_no_terms(stem_env):
    searcher, ora, ana = stem_env
    assert all(int(d) != 6
               for d in searcher.top_k(parse_query("merging OR tables OR "
                                                   "hoped", ana),
                                       k=20)["doc_id"])


def test_params_round_trip(tmp_path, spark):
    """Generation params record possessive/stemmer only when set, so
    plain analyzers keep their round-2 generation keys."""
    from lucene_solr_spark.index.catalog import _params
    plain = IndexBuilder(StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    stem = IndexBuilder(ENGLISH_STEM_ANALYZER)
    p1, p2 = _params(plain), _params(stem)
    assert "stemmer" not in p1 and "possessive" not in p1
    assert p2["stemmer"] == "porter" and p2["possessive"] is True
