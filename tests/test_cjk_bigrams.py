"""CJKBigramFilter (`analysis/common/.../cjk/CJKBigramFilter.java:56`)
— behavior pins from the reference's documented semantics (CJKAnalyzer
bigram output, unigram fallback, mixed-ALPHANUM pass-through, per-
script flags, combined unigram+bigram mode) plus a seeded differential
between the codegen expr and the Python token-chain form."""

from __future__ import annotations

import random

import pytest

from lucene_solr_spark.analysis.cjk import (ALL_SCRIPTS, HAN, HANGUL,
                                            HIRAGANA, KATAKANA,
                                            _char_class, cjk_bigram_expr,
                                            cjk_bigrams)
from lucene_solr_spark.analysis.tokenizer import (tokenize_raw,
                                                  tokenize_raw_spans)


def _chain(text, **kw):
    spans = tokenize_raw_spans(text)
    return cjk_bigrams([t for t, _, _ in spans],
                       offsets=[(s, e) for _, s, e in spans], **kw)


def test_japanese_sentence_bigrams():
    """The canonical CJKAnalyzer example: every adjacent CJK pair."""
    toks = tokenize_raw("多くの学生が試験に落ちた")
    got = cjk_bigrams(toks)
    assert got == ["多く", "くの", "の学", "学生", "生が", "が試",
                   "試験", "験に", "に落", "落ち", "ちた"]


def test_lone_char_unigram_and_passthrough():
    toks = tokenize_raw("一 english 二")
    assert cjk_bigrams(toks) == ["一", "english", "二"]


def test_output_unigrams_interleaved():
    toks = tokenize_raw("多くの")
    assert cjk_bigrams(toks, output_unigrams=True) == \
        ["多", "多く", "く", "くの", "の"]


def test_hangul_bigrams_and_mixed_alphanum():
    toks = tokenize_raw("위키백과 great")
    assert cjk_bigrams(toks) == ["위키", "키백", "백과", "great"]
    # mixed-script token is ALPHANUM → passes through unmodified
    toks2 = tokenize_raw("한국abc 漢字")
    assert cjk_bigrams(toks2) == ["한국abc", "漢字"]


def test_script_flags_selective():
    # katakana-only: hiragana passes through, katakana bigrams
    toks = tokenize_raw("くの アイウ")
    got = cjk_bigrams(toks, flags=KATAKANA)
    assert got == ["くの", "アイ", "イウ"]
    # disabled-script token flushes the buffer (no bigram across it)
    toks2 = tokenize_raw("漢く字")
    assert cjk_bigrams(toks2, flags=HAN) == ["漢", "く", "字"]


_ALPHABET = list("ab 1") + list("多学生漢字") + list("くのち") + \
    list("アイウ") + list("위키가")


def _rand_strings(n=60, seed=7):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        L = rng.randint(0, 14)
        out.append("".join(rng.choice(_ALPHABET) for _ in range(L)))
    return out


@pytest.mark.parametrize("output_unigrams", [False, True])
def test_expr_matches_python_chain(spark, output_unigrams):
    """Codegen expr ≡ Python chain (CJK-emitted part) on seeded mixed
    strings, every script enabled."""
    texts = _rand_strings()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: r["grams"] for r in df.select(
        "i", cjk_bigram_expr("text",
                             output_unigrams=output_unigrams)
        .alias("grams")).collect()}
    cls = _char_class(ALL_SCRIPTS)
    lo_hi = [(cls[i], cls[i + 2]) for i in range(0, len(cls), 3)]

    def is_cjk(tok):
        return all(any(lo <= ch <= hi for lo, hi in lo_hi) for ch in tok)

    for i, t in enumerate(texts):
        py = [tok for tok in _chain(t, output_unigrams=output_unigrams)
              if is_cjk(tok)]
        assert got[i] == py, f"text {t!r}: {got[i]} != {py}"


def test_custom_analyzer_cjk_index_search(spark):
    """CJKAnalyzer chain end-to-end: index Japanese text through a
    CustomAnalyzer with the bigram tokenizer, search a bigram term."""
    from lucene_solr_spark.analysis.cjk import cjk_bigram_tokenizer
    from lucene_solr_spark.analysis.custom import (CustomAnalyzer,
                                                   lowercase_filter)
    from lucene_solr_spark.index import IndexBuilder
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.search.ast import TermQuery
    an = CustomAnalyzer(tokenizer=cjk_bigram_tokenizer(),
                        token_filters=(lowercase_filter(),))
    docs = spark.createDataFrame(
        [(0, "多くの学生が試験に落ちた"), (1, "学生 TOKYO"), (2, "no cjk here")],
        "doc_id long, text string")
    idx = IndexBuilder(an, grid=8, with_positions=True).build(spark, docs)
    s = Searcher(spark, idx)
    got = s.top_k(TermQuery("学生"), k=10)
    assert sorted(got["doc_id"].astype(int)) == [0, 1]
    assert s.top_k(TermQuery("tokyo"), k=10)["doc_id"].tolist() == [1]
    assert len(s.top_k(TermQuery("験に"), k=10)) == 1


def test_expr_hangul_mixed_edge(spark):
    """'한국abc' must produce NO grams; '漢가b漢' strips the latin-
    touching hangul without stitching the two han chars together."""
    df = spark.createDataFrame(
        [(0, "한국abc"), (1, "漢가b漢"), (2, "a가漢")],
        "i long, text string")
    got = {r["i"]: r["grams"] for r in df.select(
        "i", cjk_bigram_expr("text").alias("grams")).collect()}
    assert got[0] == []
    assert got[1] == ["漢", "漢"]
    assert got[2] == ["漢"]
