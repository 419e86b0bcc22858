"""Capitalization / TypeToken / DecimalDigit / PatternCaptureGroup
filters (`miscellaneous/CapitalizationFilter.java:38`,
`core/.../TypeTokenFilter.java:28`, `core/.../DecimalDigitFilter.java:31`,
`pattern/PatternCaptureGroupTokenFilter.java:66`)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.misc_filters import (capitalize_token,
                                                     decimal_digit_expr,
                                                     fold_decimal_digits,
                                                     pattern_capture_tokens,
                                                     type_token_filter,
                                                     typed_positions)

KEEP = frozenset({"and", "the", "it", "big"})


def test_capitalization_basic_pins():
    # TestCapitalizationFilter behaviors
    assert capitalize_token("kiTTEN") == "Kitten"
    assert capitalize_token("and", keep=KEEP, keep_ignore_case=True) == "And"
    assert capitalize_token("AnD", keep=KEEP, keep_ignore_case=True) == "AnD"
    assert capitalize_token("big", keep=KEEP, keep_ignore_case=True) == "Big"
    assert capitalize_token(
        "hello thEre my Name is Ryan") == "Hello there my name is ryan"


def test_capitalization_only_first_word_false():
    assert capitalize_token("hello thEre my Name is Ryan",
                            only_first_word=False) == \
        "Hello There My Name Is Ryan"


def test_capitalization_ok_prefix_and_limits():
    assert capitalize_token("McKinley", ok_prefix=("McK",)) == "McKinley"
    assert capitalize_token("mcKinley", ok_prefix=("McK",)) == "Mckinley"
    # more words than max_word_count → token reverts untouched
    assert capitalize_token("one two three", only_first_word=False,
                            max_word_count=2) == "one two three"
    assert capitalize_token("looong", max_token_length=4) == "looong"
    # short words pass under min_word_length
    assert capitalize_token("the", min_word_length=5) == "the"


def test_capitalization_dot_separator_double_step():
    # '.' separates words; the reference skips the char after a
    # separator — "a.b.c" still capitalizes every segment it visits
    assert capitalize_token("john.doe", only_first_word=False) == "John.Doe"


def test_type_token_filter_urlemail():
    from lucene_solr_spark.analysis.urlemail import (EMAIL_TYPE, URL_TYPE,
                                                     tokenize_url_email)
    typed = tokenize_url_email(
        "see https://spark.apache.org docs or mail dev@spark.apache.org now")
    # blacklist: drop URLs
    kept = type_token_filter(typed, {URL_TYPE})
    assert all(ty != URL_TYPE for _, ty in kept)
    assert len(kept) == len(typed) - 1
    # whitelist: only emails
    only = type_token_filter(typed, {EMAIL_TYPE}, use_white_list=True)
    assert [ty for _, ty in only] == [EMAIL_TYPE]
    # gap discipline: positions index the pre-filter stream
    pos = typed_positions(typed, {URL_TYPE})
    idx_of_url = [i for i, (_, ty) in enumerate(typed)
                  if ty == URL_TYPE][0]
    assert idx_of_url not in [p for _, p in pos]
    assert [p for _, p in pos] == sorted(p for _, p in pos)


def test_decimal_digit_fold():
    assert fold_decimal_digits("٤٢") == "42"          # Arabic-Indic
    assert fold_decimal_digits("१२३") == "123"        # Devanagari
    assert fold_decimal_digits("４２") == "42"        # fullwidth
    assert fold_decimal_digits("abc42") == "abc42"    # ASCII untouched
    assert fold_decimal_digits("Ⅻ") == "Ⅻ"          # Roman numeral: not Nd


def test_decimal_digit_expr_differential(spark):
    toks = ["٤٢", "१२३", "４２", "abc42", "mix٧x८", ""]
    import pyspark.sql.functions as F
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = [r["o"] for r in
           df.select(decimal_digit_expr("t").alias("o")).collect()]
    assert got == [fold_decimal_digits(t) for t in toks]


def test_pattern_capture_replace_and_preserve():
    assert pattern_capture_tokens("foobarbaz", [r"(ba)"]) == ["ba", "ba"]
    assert pattern_capture_tokens("foobarbaz", [r"(ba)"],
                                  preserve_original=True) == \
        ["foobarbaz", "ba", "ba"]
    # no match → original passes
    assert pattern_capture_tokens("qux", [r"(ba)"]) == ["qux"]
    # whole-token capture skipped under preserve_original
    assert pattern_capture_tokens("abc", [r"(abc)"],
                                  preserve_original=True) == ["abc"]
    # without preserve_original the whole-token capture simply
    # replaces the original — one token out
    assert pattern_capture_tokens("abc", [r"(abc)"]) == ["abc"]


def test_pattern_capture_multi_pattern_offset_merge():
    # captures from both patterns interleaved by start offset
    got = pattern_capture_tokens("axbycz", [r"([abc])"], )
    assert got == ["a", "b", "c"]
    got = pattern_capture_tokens("a1b2", [r"([ab])", r"([0-9])"])
    assert got == ["a", "1", "b", "2"]


def test_pattern_capture_group_order_within_match():
    # groups advance in NUMBER order within one match even when group 2
    # starts before group 1 ends — mirrors the matcher loop
    got = pattern_capture_tokens("camelCase", [r"([a-z]+)([A-Z][a-z]+)"])
    assert got == ["camel", "Case"]


def test_pattern_capture_in_custom_analyzer(spark):
    from lucene_solr_spark.analysis.custom import CustomAnalyzer
    from lucene_solr_spark.analysis.misc_filters import (
        pattern_capture_group_filter)
    an = CustomAnalyzer(tokenizer=str.split, token_filters=(
        pattern_capture_group_filter([r"([a-z]+)@([a-z.]+)"],
                                     preserve_original=True),))
    toks, pos = an.tokens_positions("contact devteam@apache.org today")
    assert toks == ["contact", "devteam@apache.org", "devteam",
                    "apache.org", "today"]
    assert pos == [0, 1, 1, 1, 2]


def test_nfkc_casefold_pins():
    from lucene_solr_spark.analysis.misc_filters import nfkc_casefold
    assert nfkc_casefold("ＡＢＣ") == "abc"          # fullwidth + fold
    assert nfkc_casefold("ﬁle") == "file"           # ﬁ ligature
    assert nfkc_casefold("Ⅻ") == "xii"             # Roman numeral compat
    assert nfkc_casefold("STRASSE") == "strasse"    # casefold, not lower
    assert nfkc_casefold("ß") == "ss"
    assert nfkc_casefold("²") == "2"
    # idempotent on its own output over a web-text sample
    s = "Ｈello ﬁle Ⅻ ß ΣΊΣΥΦΟΣ ½"
    once = nfkc_casefold(s)
    assert nfkc_casefold(once) == once


def test_icu_normalizer_in_chain():
    from lucene_solr_spark.analysis.custom import CustomAnalyzer
    from lucene_solr_spark.analysis.misc_filters import icu_normalizer_filter
    an = CustomAnalyzer(token_filters=(icu_normalizer_filter(),))
    assert an.tokens("Ｓｐａｒｋ ﬁle") == ["spark", "file"]
