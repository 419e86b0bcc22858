"""NGram / EdgeNGram / CommonGrams / Fingerprint filters.

Pinned against the reference's own test vectors
(TestNGramTokenFilter, TestEdgeNGramTokenFilter, CommonGramsFilterTest,
TestFingerprintFilter), then each Catalyst expression is
differential-tested per-row against its Python twin.
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.analysis.grams import (common_grams_expr,
                                              common_grams_query_expr,
                                              common_grams_query_tokens,
                                              common_grams_tokens,
                                              edge_ngram_expr,
                                              edge_ngram_tokens,
                                              fingerprint_expr,
                                              fingerprint_token,
                                              ngram_expr, ngram_tokens)

COMMON = {"s", "a", "b", "c", "d", "the", "of"}  # the reference test set


def test_ngram_reference_order():
    # NGramTokenFilter javadoc: "abc" 1..2 → a, ab, b, bc, c
    assert ngram_tokens("abc", 1, 2) == ["a", "ab", "b", "bc", "c"]
    assert ngram_tokens("abcde", 2, 3) == \
        ["ab", "abc", "bc", "bcd", "cd", "cde", "de"]


def test_ngram_preserve_original():
    assert ngram_tokens("ab", 3, 4) == []
    assert ngram_tokens("ab", 3, 4, preserve_original=True) == ["ab"]
    # longer than maxGram: original appended AFTER the grams
    assert ngram_tokens("abcd", 2, 2, preserve_original=True) == \
        ["ab", "bc", "cd", "abcd"]
    # within [min, max]: no duplicate original
    assert ngram_tokens("abc", 2, 3, preserve_original=True) == \
        ["ab", "abc", "bc"]


def test_edge_ngram_reference():
    assert edge_ngram_tokens("abcde", 1, 3) == ["a", "ab", "abc"]
    assert edge_ngram_tokens("ab", 3, 5) == []
    assert edge_ngram_tokens("ab", 3, 5, preserve_original=True) == ["ab"]
    assert edge_ngram_tokens("abcde", 2, 10) == \
        ["ab", "abc", "abcd", "abcde"]
    assert edge_ngram_tokens("abcde", 2, 3, preserve_original=True) == \
        ["ab", "abc", "abcde"]


def test_common_grams_reference_vectors():
    # CommonGramsFilterTest.testCommonGramsFilter
    assert common_grams_tokens(["brown", "fox"], COMMON) == ["brown", "fox"]
    assert common_grams_tokens(["the", "fox"], COMMON) == \
        ["the", "the_fox", "fox"]
    assert common_grams_tokens(["How", "the", "s"], COMMON) == \
        ["How", "How_the", "the", "the_s", "s"]
    assert common_grams_tokens(["the"], COMMON) == ["the"]
    assert common_grams_tokens([], COMMON) == []


QUERY_VECTORS = [
    (["brown", "fox"], ["brown", "fox"]),
    (["the", "fox"], ["the_fox"]),
    (["fox", "of"], ["fox_of"]),
    (["of", "the"], ["of_the"]),
    (["the"], ["the"]),
    (["foo"], ["foo"]),
    (["n", "n", "n"], ["n", "n", "n"]),
    (["quick", "brown", "fox"], ["quick", "brown", "fox"]),
    (["quick", "brown", "the"], ["quick", "brown_the"]),
    (["quick", "the", "brown"], ["quick_the", "the_brown"]),
    (["fox", "of", "the"], ["fox_of", "of_the"]),
    (["the", "quick", "brown"], ["the_quick", "quick", "brown"]),
    (["the", "fox", "of"], ["the_fox", "fox_of"]),
    (["of", "the", "fox"], ["of_the", "the_fox"]),
    (["of", "the", "of"], ["of_the", "the_of"]),
]


def test_common_grams_query_reference_vectors():
    # CommonGramsFilterTest.testCommonGramsQueryFilter, common = {of,the}
    # plus single letters; "n" stands for any non-common word
    for toks, want in QUERY_VECTORS:
        assert common_grams_query_tokens(toks, COMMON) == want, toks


def test_fingerprint():
    assert fingerprint_token(["b", "a", "b", "c"]) == "a b c"
    assert fingerprint_token([]) is None
    assert fingerprint_token(["x" * 600, "y" * 600]) is None  # > 1024
    assert fingerprint_token(["b", "a"], separator="|") == "a|b"


def test_gram_exprs_differential(spark):
    words = ["abc", "abcde", "ab", "a", "", "abcdefgh", "xyzzy"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    for mn, mx, po in [(1, 2, False), (2, 3, False), (3, 4, True),
                       (2, 2, True)]:
        rows = df.select(
            "w",
            ngram_expr("w", mn, mx, po).alias("ng"),
            edge_ngram_expr("w", mn, mx, po).alias("eg")).collect()
        for r in rows:
            assert list(r["ng"]) == ngram_tokens(r["w"], mn, mx, po), \
                (r["w"], mn, mx, po)
            assert list(r["eg"]) == edge_ngram_tokens(r["w"], mn, mx, po), \
                (r["w"], mn, mx, po)


def test_common_grams_exprs_differential(spark):
    streams = [t for t, _ in QUERY_VECTORS] + \
        [["How", "the", "s", "a", "brown", "s", "cow"], [], ["of"]]
    df = spark.createDataFrame([(t,) for t in streams],
                               "toks array<string>")
    rows = df.select(
        "toks",
        common_grams_expr("toks", COMMON).alias("ix"),
        common_grams_query_expr("toks", COMMON).alias("q")).collect()
    for r in rows:
        toks = list(r["toks"])
        assert list(r["ix"]) == common_grams_tokens(toks, COMMON), toks
        assert list(r["q"]) == common_grams_query_tokens(toks, COMMON), toks


def test_fingerprint_expr_differential(spark):
    streams = [["b", "a", "b", "c"], [], ["one"], ["z", "y"],
               ["x" * 600, "y" * 600]]
    df = spark.createDataFrame([(t,) for t in streams],
                               "toks array<string>")
    rows = df.select("toks", fingerprint_expr("toks").alias("fp")).collect()
    for r in rows:
        assert r["fp"] == fingerprint_token(list(r["toks"])), r["toks"]
