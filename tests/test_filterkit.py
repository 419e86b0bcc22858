"""Keep/Length/Trim/Truncate/LimitTokenCount filter kit."""

import pyspark.sql.functions as F

from lucene_solr_spark.analysis.filterkit import (keep_word_expr,
                                                  length_filter_expr,
                                                  limit_token_count_expr,
                                                  trim_expr, truncate_expr)


def _one(spark, expr, toks):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return list(df.select(expr.alias("o")).collect()[0]["o"])


def test_keep_word(spark):
    assert _one(spark, keep_word_expr("toks", ["fox", "dog"]),
                ["the", "fox", "ran", "dog", "fox"]) == \
        ["fox", "dog", "fox"]
    assert _one(spark, keep_word_expr("toks", ["x"]), []) == []


def test_length_filter(spark):
    assert _one(spark, length_filter_expr("toks", 2, 4),
                ["a", "ab", "abcd", "abcde", ""]) == ["ab", "abcd"]


def test_trim(spark):
    assert _one(spark, trim_expr("toks"),
                ["  a", "b  ", " c ", "d"]) == ["a", "b", "c", "d"]


def test_truncate(spark):
    assert _one(spark, truncate_expr("toks", 3),
                ["abcdef", "ab", "abc"]) == ["abc", "ab", "abc"]


def test_limit_token_count(spark):
    assert _one(spark, limit_token_count_expr("toks", 2),
                ["a", "b", "c", "d"]) == ["a", "b"]
    assert _one(spark, limit_token_count_expr("toks", 9),
                ["a", "b"]) == ["a", "b"]


def test_composition_single_projection(spark):
    # the whole kit composes into ONE Project over the token array
    df = spark.createDataFrame([(["  the", "fox  ", "a", "elephants"],)],
                               "toks array<string>")
    out = df.select(
        limit_token_count_expr(
            length_filter_expr(trim_expr("toks"), 2, 6), 2).alias("o"))
    assert list(out.collect()[0]["o"]) == ["the", "fox"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
