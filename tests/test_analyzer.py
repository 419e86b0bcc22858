"""Golden analyzer fixtures (FIXTURES.md §2) pinning StandardAnalyzer
semantics: UAX#29-style segmentation, Java simple lowercase, 33-word stop
set with position gaps, maxTokenLength-255 skip."""

import pandas as pd

from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_ANALYZER, ENGLISH_STOP_WORDS, StandardAnalyzer, analyze_series,
)
from lucene_solr_spark.analysis.lowercase import simple_lowercase

NOSTOP = StandardAnalyzer()


def test_stop_set_is_33_words():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS


def test_basic_tokens():
    assert NOSTOP.tokens("Hello World") == ["hello", "world"]
    assert NOSTOP.tokens("") == []
    assert NOSTOP.tokens("   ") == []


def test_alphanumeric_and_medial():
    assert NOSTOP.tokens("o'neill can't B2B 3.14 wi.fi") == \
        ["o'neill", "can't", "b2b", "3.14", "wi.fi"]


def test_punct_boundaries():
    assert NOSTOP.tokens("foo,bar;baz! (qux)") == ["foo", "bar", "baz", "qux"]
    # trailing dot is not medial
    assert NOSTOP.tokens("end. Start") == ["end", "start"]


def test_stopword_gap_positions():
    toks, pos = ENGLISH_ANALYZER.tokens_positions("the quick brown fox and a dog")
    assert toks == ["quick", "brown", "fox", "dog"]
    assert pos == [1, 2, 3, 6]


def test_long_token_skipped_but_advances_position():
    long = "x" * 256
    ok255 = "y" * 255
    toks, pos = NOSTOP.tokens_positions(f"aa {long} bb {ok255}")
    assert toks == ["aa", "bb", ok255.lower()]
    assert pos == [0, 2, 3]


def test_unicode():
    assert NOSTOP.tokens("café naïve") == ["café", "naïve"]
    # CJK: one token per ideograph
    assert NOSTOP.tokens("日本語 test") == ["日", "本", "語", "test"]
    # emoji are dropped (not \w) — acceptable envelope deviation, pinned here
    assert NOSTOP.tokens("hi 👍 there") == ["hi", "there"]


def test_simple_lowercase_vs_full():
    # U+0130 full-lowers to 'i' + combining dot; Java simple mapping is 'i'
    assert "İstanbul".lower() != "istanbul"
    assert simple_lowercase("İstanbul") == "istanbul"
    # ASCII fast path
    assert simple_lowercase("ABC") == "abc"
    # ß unchanged under simple mapping
    assert simple_lowercase("STRASSE ß") == "strasse ß"


def test_term_freqs_and_norm_length():
    a = ENGLISH_ANALYZER
    tf = a.term_freqs("the cat and the cat sat")
    assert tf == {"cat": 2, "sat": 1}
    # norm length = post-stop token count
    assert sum(tf.values()) == 3


def test_analyze_series_vectorized():
    s = pd.Series(["Hello World", None, "the and a"])
    out = analyze_series(s, ENGLISH_ANALYZER)
    assert out.tolist() == [["hello", "world"], [], []]


def test_sigma_context_insensitive():
    """U+03A3 GREEK CAPITAL SIGMA: Java's Character.toLowerCase is
    context-free (always σ); Python full str.lower() yields final
    sigma ς word-finally. The exception table must force σ so the
    batch and per-doc paths agree (ADVICE r2)."""
    from lucene_solr_spark.analysis.lowercase import (simple_lowercase,
                                                      _multi_char_exceptions)
    assert simple_lowercase("ΑΣ") == "ασ"
    assert simple_lowercase("ΣΟΦΙΑΣ") == "σοφιασ"
    assert "Σ" in _multi_char_exceptions()
